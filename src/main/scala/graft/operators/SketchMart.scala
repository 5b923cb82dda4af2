package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pre-aggregated distinct-count sketches as a MART: one KMV sketch row
  * per day, merged at query time to answer distinct counts over arbitrary
  * day ranges without rescanning the raw log.
  *
  * Soundness: the k smallest distinct hashes of a union are each among the
  * k smallest of their own partition, so re-sketching the union of per-day
  * retained sets to k yields EXACTLY the sketch a direct pass over the
  * range's raw rows would build — merged estimates equal direct estimates,
  * which is what the oracle checks.
  *
  * Scale shape: the build is one map-side-combinable aggregate over the
  * log (each partition reduces to ≤k short strings before the shuffle);
  * the mart has one row per day; a range query reads days×k strings. At
  * 100 TB the raw log is scanned exactly once per day's load — every
  * subsequent "distinct users this week/month/quarter" is a mart-only
  * query, the same reason the reference pre-aggregates its stats marts.
  */
object SketchMart {

  /** Build (overwrite) the daily sketch mart: (day, mins array). */
  def buildDaily(events: DataFrame, dir: String, k: Int,
                 hash: Column, day: Column): Unit =
    events.groupBy(day.as("day"))
      .agg(call_function("graft_kmv_mins", hash, lit(k)).as("mins"))
      .write.mode("overwrite").parquet(dir)

  /** Merge daily sketches into per-`period` sketches and estimate. The
    * merged union is re-sketched with the same bounded rule (sort, slice
    * to k); below k retained values the size IS the exact distinct count,
    * at k the classic (k-1)/U(k) estimator applies — identical to the
    * single-shot [[graft.plans.KmvKthMin]] estimate rule.
    */
  def mergedDistinct(spark: SparkSession, dir: String, k: Int,
                     period: Column, periodName: String): DataFrame = {
    spark.read.parquet(dir)
      .groupBy(period.as(periodName))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("mins"))))),
        1, k).as("u"))
      .select(
        col(periodName),
        size(col("u")).cast("long").as("nd_capped"),
        when(size(col("u")) < k, size(col("u")).cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble * graft.plans.KmvKthMin.TwoPow52) /
              conv(substring(element_at(col("u"), k), 1, 13), 16, 10)
                .cast("long").cast("double"),
            3)).as("est_distinct"))
  }
}
