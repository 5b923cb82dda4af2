package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping on plain parquet: a per-file min/max MANIFEST
  * (the zone-map / Delta-stats analog, maintained as a table) plus
  * Z-ORDER clustering so multi-column range boxes prune well.
  *
  * Parquet row-group stats already skip WITHIN a file; what a 100 TB lake
  * needs on top is skipping whole FILES without opening them — the
  * manifest is built once per load (one pass), and a range query consults
  * manifest rows (files × columns, driver-small by the same argument as
  * IVF centroids) to enumerate the files that can possibly match, then
  * reads only those. Pruning is sound by the min/max proof: a skipped
  * file's [min,max] is disjoint from the predicate range, so results are
  * IDENTICAL to the full scan — which is exactly what the oracle checks.
  *
  * Linear sort clusters one column tightly but leaves the second
  * column's per-file ranges wide; Z-order interleaves the bits of both
  * ranks so every file covers a small square in (a,b) space and BOTH
  * predicates prune (spec-measured).
  */
object DataSkipping {

  /** Morton/Z-value of two non-negative ints confined to `bits` bits
    * each: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Pure shifts/masks — codegen'd, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1)).cast("long")
    }.reduce(_ + _)
  }

  /** Write `df` clustered by `key` into `nFiles` range-contiguous files.
    * Range partitioning makes per-file key ranges disjoint, which is what
    * gives the manifest tight [min,max] envelopes to prune against.
    */
  def writeClustered(df: DataFrame, dir: String, key: Column, nFiles: Int): Unit =
    df.withColumn("__ck", key)
      .repartitionByRange(nFiles, col("__ck"))
      .sortWithinPartitions(col("__ck"))
      .drop("__ck")
      .write.mode("overwrite").parquet(dir)

  /** One manifest row per file: row count + [min,max] per tracked column.
    * One aggregation pass; rebuild after each load (or union per-batch
    * manifests — min/max merge associatively).
    */
  def manifest(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)

  /** Files whose envelopes intersect EVERY [lo,hi] box — the candidate
    * set for a conjunctive range predicate. The manifest reduces to a
    * driver-side file list BY DESIGN: datasource path filters need
    * literals, and the manifest scales with file count, not data.
    */
  def pruneFiles(manifest: DataFrame, boxes: Seq[(String, Any, Any)]): Seq[String] = {
    val hit = boxes.foldLeft(manifest) { case (m, (c, lo, hi)) =>
      m.filter(col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi))
    }
    hit.select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** Read only the files that can match, then apply the EXACT predicate
    * (pruning is a superset guarantee, never the final filter).
    */
  def prunedRead(spark: SparkSession, manifest: DataFrame,
                 boxes: Seq[(String, Any, Any)]): DataFrame = {
    val files = pruneFiles(manifest, boxes)
    val df =
      if (files.isEmpty) {
        // no candidate files: an empty frame with the right schema
        val probe = manifest.sparkSession.read.parquet(
          manifest.select(col("file")).head.getString(0))
        probe.filter(lit(false))
      } else spark.read.parquet(files: _*)
    boxes.foldLeft(df) { case (d, (c, lo, hi)) =>
      d.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    }
  }
}
