package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution over dirty dimension data: the
  * classic BLOCKING + verify shape. A quadratic all-pairs edit-distance
  * pass is impossible at warehouse scale; instead candidate pairs are
  * confined to rows sharing a cheap blocking key (brand+size here; any
  * conjunction of stable attributes), which turns the self join into an
  * ordinary equi join — same bucket-confinement argument as the MinHash
  * band join in [[Dedup]] — and the expensive comparator (Levenshtein,
  * codegen'd builtin, no UDF) runs only inside blocks.
  *
  * Scale shape: one shuffle of (block key, id, name) — names, not rows —
  * and per-block quadratic work bounded by the largest block, the knob
  * the caller controls by widening the blocking conjunction.
  */
object Linkage {

  def blockedEditDistancePairs(df: DataFrame, idCol: String, nameCol: String,
                               blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "blocking needs at least one key column")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val a = df.select(blockCols.map(col) :+ col(idCol).as("id_a") :+
      col(nameCol).as("name_a"): _*)
    val b = df.select(blockCols.map(col) :+ col(idCol).as("id_b") :+
      col(nameCol).as("name_b"): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
