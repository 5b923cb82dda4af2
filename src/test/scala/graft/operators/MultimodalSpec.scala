package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal plumbing (frame sampling, stub resize) and the sort-free
  * oldest-per-key aggregate.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("sampleFrames: strided frames, empty payload keeps one empty frame") {
    val docs = Seq(
      (1L, "a" * 600), // frames at 0, 256, 512
      (2L, ""),        // one empty frame
      (3L, "xyz")      // one short frame
    ).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(docs, "doc_id", "text", stride = 256, frameLen = 64)
      .orderBy("doc_id", "frame_idx").collect()
    assert(frames.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq ==
      Seq((1L, 0L, 64L), (1L, 1L, 64L), (1L, 2L, 64L), (2L, 0L, 0L), (3L, 0L, 3L)))
    // empty frame hashes like md5("")
    assert(frames(3).getString(2) == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("resizeStub: fixed byte budget, deterministic cycle-pad, empty stays zeroed") {
    val media = Multimodal.asMediaTable(
      Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.resizeStub(media, targetBytes = 8)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Array[Byte]]("payload").length == 8))
    assert(new String(out(0).getAs[Array[Byte]]("payload")) == "abcabcab")
    assert(out(0).getLong(out(0).fieldIndex("orig_bytes")) == 3L)
    assert(out(1).getAs[Array[Byte]]("payload").forall(_ == 0))
  }

  test("frameDupPairs: identical payloads share every frame (containment " +
      "1.0); a shifted copy misses all strided frames; threshold filters") {
    val base = (1 to 600).map(i => s"w$i").mkString(" ") // > 2 frames
    val d = Seq(
      (1L, base), (2L, base),          // exact duplicate pair
      (3L, "zz " + base),              // shifted: strided slices all differ
      (4L, (1 to 600).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Multimodal.frameDupPairs(d, "doc_id", "text", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.sharedState.cacheManager.clearCache()
    assert(out.length == 1, s"only the exact pair qualifies: ${out.toSeq}")
    val (a, b, shared, cont) = out.head
    assert((a, b) == (1L, 2L) && cont == 1.0 && shared >= 2L)
  }

  test("firstByKeyAgg == firstByKey window on a unique order tuple") {
    val ev = Tables.load(spark, sfDir, "events")
    val byWindow = CurrentState.firstByKey(ev, Seq("user_id"), Seq("ts", "event_id"))
    val byAgg = CurrentState.firstByKeyAgg(ev, Seq("user_id"), Seq("ts", "event_id"))
    assert(byAgg.columns.toSeq == byWindow.columns.toSeq)
    assert(byAgg.except(byWindow).isEmpty && byWindow.except(byAgg).isEmpty)
  }

  test("firstByKeyAgg aggregates partially before the shuffle") {
    // min_by(struct) runs as SortAggregate (struct buffers aren't
    // hash-aggregable), but the scale property is the partial aggregate
    // below the exchange: each map partition reduces to ONE candidate row
    // per key before any data moves — the window form ships every row.
    val ev = Tables.load(spark, sfDir, "events")
    val plan = CurrentState.firstByKeyAgg(ev, Seq("user_id"), Seq("ts", "event_id"))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val partialIdx = plan.indexOf("partial_min_by")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(partialIdx > 0 && exchangeIdx > 0 && partialIdx > exchangeIdx,
      s"expected partial_min_by below the Exchange in:\n$plan")
  }
}
