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

  test("phash: identical payloads at Hamming 0; the shifted copy exact " +
      "hashing is blind to pairs via phashDupPairs; different content does not") {
    val base = (1 to 600).map(i => s"w$i").mkString(" ")
    // "different content" for a distribution-based perceptual hash means a
    // different intensity distribution — uppercase + punctuation vs the
    // base's lowercase + digits. (A q-for-w swap alone keeps ~the same
    // histogram and SHOULD pair perceptually, like two photos of the same
    // scene: that near-miss is frameDupPairs' exact-md5 job to separate.)
    val other = (1 to 600).map(i =>
      s"Q${('A' + i % 26).toChar}${('A' + (i / 26) % 26).toChar}!").mkString("; ")
    val d = Seq(
      (1L, base),
      (3L, "zz " + base),   // shifted copy
      (4L, other))          // different content
      .toDF("doc_id", "text")
    // the exact-md5 path misses the shifted copy entirely (the r4 spec's
    // documented blind spot)
    assert(Multimodal.frameDupPairs(d, "doc_id", "text", minShared = 2)
      .collect().isEmpty)
    // identical payloads: every frame pair at Hamming 0
    val same = Multimodal.phashDupPairs(
        Seq((1L, base), (2L, base)).toDF("doc_id", "text"),
        "doc_id", "text", maxHamming = 0, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    spark.sharedState.cacheManager.clearCache()
    assert(same.toSeq == Seq((1L, 2L, 0L)), s"identical: ${same.toSeq}")
    // the shifted copy lands within the Hamming budget with MANY
    // corroborating frames; unrelated content can produce the odd
    // accidental frame collision (the LSH-family tail), which the
    // minShared corroboration threshold screens out at the doc level
    val pairs = Multimodal.phashDupPairs(d, "doc_id", "text",
        maxHamming = 8, minShared = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    spark.sharedState.cacheManager.clearCache()
    assert(pairs.contains((1L, 3L)),
      s"shifted copy must pair perceptually: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated content must not pair: $pairs")
  }

  test("frameDupPairs degenerate-bucket guards: empty payloads never pair " +
      "via the shared md5('') frame; hot buckets over maxBucket are skipped") {
    val base = (1 to 600).map(i => s"w$i").mkString(" ")
    // two empty docs + an exact-dup pair: without the zero-length guard
    // the empties would share one frame hash (md5 of the empty slice)
    val withEmpties = Seq((1L, ""), (2L, ""), (3L, base), (4L, base))
      .toDF("doc_id", "text")
    val out = Multimodal.frameDupPairs(withEmpties, "doc_id", "text",
        minShared = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    spark.sharedState.cacheManager.clearCache()
    assert(out == Set((3L, 4L)), s"empty docs must never pair: $out")
    // hot-bucket skip: many docs sharing one boilerplate prefix frame —
    // with maxBucket below the group size the shared frame contributes
    // no pairs, and the genuinely-duplicated pair still surfaces via its
    // OTHER frames
    val boiler = (1 to 300).map(i => s"b$i").mkString(" ") // shared frame 0
    val hot = ((1L to 20L).map(id => (id, boiler + " " + s"x$id-" * 150)) :+
      (98L, boiler + " " + base) :+ (99L, boiler + " " + base))
      .toDF("doc_id", "text")
    val hotOut = Multimodal.frameDupPairs(hot, "doc_id", "text",
        minShared = 1, maxBucket = 10L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    spark.sharedState.cacheManager.clearCache()
    assert(hotOut.contains((98L, 99L)),
      s"the real duplicate must survive the hot-bucket skip: $hotOut")
    assert(hotOut.forall { case (a, b) => a == 98L && b == 99L },
      s"boilerplate-only pairs must be suppressed: $hotOut")
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
