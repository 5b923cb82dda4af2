package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  import spark.implicits._

  private val budget = 100L

  private def pack(df: org.apache.spark.sql.DataFrame) =
    Packing.packSequences(df, "id", "nt", budget, shards = 4)

  test("every doc packed exactly once; sequences respect the budget") {
    val docs = (1L to 1000L).map(i => (i, (i * 37) % 150)).toDF("id", "nt")
    val out = pack(docs).cache()
    assert(out.count() == 1000)
    assert(out.select(countDistinct("doc_id")).head.getLong(0) == 1000)
    // non-truncated sequences fit the budget
    val overfull = out.filter(!col("truncated"))
      .groupBy("shard", "seq_idx").agg(sum("n_tokens").as("tot"))
      .filter(col("tot") > budget)
    assert(overfull.isEmpty)
    // truncated docs sit alone in their sequence
    val truncSeqs = out.filter(col("truncated")).select("shard", "seq_idx")
    assert(out.join(truncSeqs, Seq("shard", "seq_idx")).count() == truncSeqs.count())
    // offsets are the running sum within the sequence
    val badOffset = out.withColumn("expected",
      sum("n_tokens").over(org.apache.spark.sql.expressions.Window
        .partitionBy("shard", "seq_idx").orderBy("doc_id")
        .rowsBetween(Long.MinValue, -1)))
      .filter(col("tok_offset") =!= coalesce(col("expected"), lit(0L)))
    assert(badOffset.isEmpty)
    out.unpersist()
  }

  test("assignment is independent of input partitioning and order") {
    val docs = (1L to 800L).map(i => (i, (i * 13) % 120)).toDF("id", "nt")
    val a = pack(docs)
    val b = pack(docs.repartition(17).orderBy(desc("nt")))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("greedy density: a new sequence only starts when the previous can't fit") {
    val docs = (1L to 500L).map(i => (i, (i * 7) % 90)).toDF("id", "nt")
    val out = pack(docs)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("doc_id")
    // for each non-truncated doc that OPENS a later sequence, the previous
    // sequence's fill plus this doc must exceed the budget
    val prevFill = out
      .withColumn("prev_seq", lag("seq_idx", 1).over(w))
      .withColumn("prev_fill", lag(col("tok_offset") + col("n_tokens"), 1).over(w))
      .withColumn("prev_trunc", lag("truncated", 1).over(w))
      .filter(col("prev_seq").isNotNull && col("seq_idx") === col("prev_seq") + 1 &&
        !col("truncated") && col("prev_trunc") === false)
    assert(prevFill.filter(col("prev_fill") + col("n_tokens") <= budget).isEmpty)
  }
}
