package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift audit between two periods of a binned metric — the
  * "did this batch shift the data?" check a continuously-ingesting
  * pipeline runs next to its quality gates (the dbt-elementary
  * distribution-monitor analog, and the feature-drift report a training
  * pipeline wants per source).
  *
  * Input: one row per (key, period, bin) with a count, period ∈ {A, B}
  * (baseline, current). Output: one row per key with a chi-square-style
  * drift statistic and the largest single-bin rate shift.
  *
  * Determinism across engines: every per-bin term is a short chain of
  * IEEE-exact ops (single divisions, subtraction, multiplication), then
  * fixed-pointed (floor ×1e7 → BIGINT) BEFORE the cross-bin sum, so the
  * aggregate is integer addition — order-independent, bit-identical in
  * DuckDB. (No ln/pow: log is not correctly-rounded in every engine,
  * which would break hash equality; chi-square needs only ×/÷.)
  *
  * Scale shape: two hash aggregates over bin-level rows (keys × bins,
  * mart-sized, never raw rows) — compose with [[SketchMart.buildValueHist]]
  * to diff 100 TB periods from their daily histogram marts.
  */
object Drift {

  private val Fix = 1.0e7

  def histDrift(binned: DataFrame, keyCol: String): DataFrame = {
    val byBin = binned.groupBy(col(keyCol), col("bin"))
      .agg(
        sum(when(col("period") === "A", col("cnt")).otherwise(0L)).as("ca"),
        sum(when(col("period") === "B", col("cnt")).otherwise(0L)).as("cb"))
    val tot = byBin.groupBy(col(keyCol))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    byBin.join(tot, keyCol)
      .withColumn("pa", col("ca").cast("double") / col("na"))
      .withColumn("pb", col("cb").cast("double") / col("nb"))
      .withColumn("d", col("pb") - col("pa"))
      .withColumn("chi_fx",
        floor(col("d") * col("d") / greatest(col("pa"), lit(1.0e-6)) * Fix)
          .cast("long"))
      .withColumn("ad_fx", floor(abs(col("d")) * Fix).cast("long"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_bins"),
        (sum(col("chi_fx")).cast("double") / Fix).as("drift_stat"),
        (max(col("ad_fx")).cast("double") / Fix).as("max_delta"))
  }
}
