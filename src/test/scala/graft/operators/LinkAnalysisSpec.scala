package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("src", "dst")

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one round on a hand-computable triangle matches the fixed-point formula") {
    // 1->2, 2->3, 3->1: symmetric cycle, every node keeps rank scale/3.
    // rank0 = 10^9 div 3 = 333333333; contrib = 333333333 (deg 1)
    // rank1 = (150000000 div 3) + (333333333 * 85 div 100)
    //       = 50000000 + 283333333 = 333333333  (fixed point of the cycle)
    val r = ranks(LinkAnalysis.pageRank(
      edges(1L -> 2L, 2L -> 3L, 3L -> 1L), "src", "dst", iters = 1))
    assert(r == Map(1L -> 333333333L, 2L -> 333333333L, 3L -> 333333333L))
  }

  test("dangling mass is redistributed uniformly") {
    // 1->3, 2->3: node 3 has no out-edges. n=3, rank0 = 333333333.
    // round 1: contrib(3) = 333333333 + 333333333 = 666666666
    //   dangling dm = 333333333 (node 3), dm div n = 111111111
    //   base = 150000000 div 3 = 50000000
    //   rank(3) = 50000000 + (666666666 + 111111111) * 85 div 100
    //           = 50000000 + 661111110 = 711111110
    //   rank(1) = rank(2) = 50000000 + (0 + 111111111) * 85 div 100
    //           = 50000000 + 94444444 = 144444444
    val r = ranks(LinkAnalysis.pageRank(
      edges(1L -> 3L, 2L -> 3L), "src", "dst", iters = 1))
    assert(r == Map(1L -> 144444444L, 2L -> 144444444L, 3L -> 711111110L))
  }

  test("duplicate edges collapse to one; hub outranks spokes") {
    // star: spokes 2..5 all point at 1 (one duplicated edge); 1 is dangling
    val e = edges(2L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L)
    val r = ranks(LinkAnalysis.pageRank(e, "src", "dst", iters = 3))
    assert(r(1L) > r(2L))
    assert(Set(2L, 3L, 4L, 5L).map(r).size == 1) // spokes identical
  }

  test("total mass is conserved up to integer-division truncation") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L, 1L -> 4L, 5L -> 2L)
    val total = LinkAnalysis.pageRank(e, "src", "dst", iters = 4)
      .agg(sum("rank_scaled")).head.getLong(0)
    // each of the 4 rounds can truncate at most ~1 unit per node per div;
    // mass stays within a few dozen units of the scale
    assert(math.abs(total - 1000000000L) < 200L)
  }

  test("topK orders by rank then node id, deterministically") {
    val e = edges(2L -> 1L, 3L -> 1L, 1L -> 9L, 9L -> 1L, 5L -> 9L)
    val full = LinkAnalysis.pageRank(e, "src", "dst", iters = 2)
    val top = LinkAnalysis.topK(full, 3).collect().map(_.getLong(0)).toSeq
    val expect = full.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (n, rk) => (-rk, n) }.take(3).map(_._1).toSeq
    assert(top == expect)
  }

  test("pageRankTopK equals pageRank + topK and leaves no cached state") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L, 5L -> 2L)
    val viaCompose = LinkAnalysis.topK(
      LinkAnalysis.pageRank(e, "src", "dst", iters = 2), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // pageRank documents that the backing rank state stays pinned
    spark.sharedState.cacheManager.clearCache()
    val viaOp = LinkAnalysis.pageRankTopK(spark, e, "src", "dst", iters = 2, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaOp == viaCompose)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("personalized: seed-only teleport on a chain, hand-computed rounds") {
    // 1->2->3, seeds={1}: denom=1, r0 = (1e9, 0, 0); node 3 dangling.
    // round 1: rank = (150000000, 850000000, 0)
    // round 2: contrib(2)=150000000, contrib(3)=850000000, dm=0
    //   rank(1)=150000000, rank(2)=127500000, rank(3)=722500000
    val r = LinkAnalysis.personalizedPageRankTopK(spark,
        edges(1L -> 2L, 2L -> 3L), "src", "dst",
        Seq(1L).toDF("node"), iters = 2, k = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 150000000L, 2L -> 127500000L, 3L -> 722500000L))
  }

  test("personalized: dangling mass teleports back to the seed set only") {
    // 1->2, seeds={1}: round 2's dangling mass (node 2's 850000000)
    // lands entirely on seed 1, not split across nodes.
    //   rank(1) = 150000000 + (0 + 850000000) * 85 div 100 = 872500000
    //   rank(2) = 0 + 150000000 * 85 div 100 = 127500000
    val r = LinkAnalysis.personalizedPageRankTopK(spark,
        edges(1L -> 2L), "src", "dst",
        Seq(1L).toDF("node"), iters = 2, k = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 872500000L, 2L -> 127500000L))
  }

  test("personalized with ALL nodes as seeds equals classic pageRank; " +
      "off-graph seed ids are ignored; disjoint seeds yield empty") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L, 5L -> 2L)
    val classic = LinkAnalysis.pageRankTopK(spark, e, "src", "dst",
        iters = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val allSeeds = LinkAnalysis.personalizedPageRankTopK(spark, e, "src", "dst",
        Seq(1L, 2L, 3L, 4L, 5L, 99L).toDF("node"), iters = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(allSeeds == classic)
    assert(LinkAnalysis.personalizedPageRankTopK(spark, e, "src", "dst",
      Seq(77L).toDF("node"), iters = 2, k = 5).count() == 0L)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("personalized: unreachable nodes converge to exactly zero rank") {
    // two components; seeds in the first only
    val e = edges(1L -> 2L, 2L -> 1L, 10L -> 11L, 11L -> 10L)
    val r = LinkAnalysis.personalizedPageRankTopK(spark, e, "src", "dst",
        Seq(1L).toDF("node"), iters = 3, k = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(10L) == 0L && r(11L) == 0L)
    assert(r(1L) > 0L && r(2L) > 0L)
  }

  test("triangleCounts: hand-computed graphs — K4, triangle+pendant, " +
      "star and path are triangle-free; duplicates/reversals collapse; " +
      "driver and distributed regimes agree on every case") {
    def counts(rows: (Long, Long)*): Map[Long, Long] = {
      val viaDriver = LinkAnalysis.triangleCounts(rows.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // maxDriverEdges = 0 forces the distributed wedge join — the two
      // regimes must be indistinguishable
      val viaPlan = LinkAnalysis.triangleCounts(rows.toDF("a", "b"), "a", "b",
          maxDriverEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the operator's edge pin is released by the session's per-query
      // cache clear (Verify/Bench do this); mirror it here
      spark.sharedState.cacheManager.clearCache()
      assert(viaDriver == viaPlan,
        s"triangle regimes disagree: $viaDriver vs $viaPlan")
      viaDriver
    }
    // K4: 4 triangles, every node in exactly 3
    val k4 = counts(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(k4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // triangle with a pendant: pendant node absent from the result
    val tp = counts(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 9L)
    assert(tp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // star and path: no triangles at all
    assert(counts(1L -> 2L, 1L -> 3L, 1L -> 4L).isEmpty)
    assert(counts(1L -> 2L, 2L -> 3L, 3L -> 4L).isEmpty)
    // duplicate edges, reversed orientation, self-loops: one triangle
    val dup = counts(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 1L -> 1L)
    assert(dup == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCornersOriented over orientedEdges == both triangleCorners " +
      "regimes, corner-for-corner; the mart carries the same tie rule") {
    def cornerBags(rows: (Long, Long)*): Seq[Seq[Long]] = {
      val in = rows.toDF("a", "b")
      val viaDriver = LinkAnalysis.triangleCorners(in, "a", "b")
        .collect().map(_.getLong(0)).sorted.toSeq
      val viaPlan = LinkAnalysis.triangleCorners(in, "a", "b",
          maxDriverEdges = 0L)
        .collect().map(_.getLong(0)).sorted.toSeq
      val viaMart = LinkAnalysis.triangleCornersOriented(
          LinkAnalysis.orientedEdges(in, "a", "b"))
        .collect().map(_.getLong(0)).sorted.toSeq
      spark.sharedState.cacheManager.clearCache()
      assert(viaDriver == viaPlan, s"regimes: $viaDriver vs $viaPlan")
      assert(viaDriver == viaMart, s"mart form: $viaDriver vs $viaMart")
      Seq(viaDriver, viaPlan, viaMart)
    }
    // K4 (every corner 3x), triangle+pendant, star (none),
    // duplicates/reversals/self-loops collapse — the triangleCounts
    // battery replayed corner-for-corner across all three forms
    cornerBags(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    cornerBags(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 9L)
    cornerBags(1L -> 2L, 1L -> 3L, 1L -> 4L)
    cornerBags(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 1L -> 1L)
    // degree-tie orientation: the 4-cycle is all ties (every degree 2) —
    // orientation must fall back to id order in the mart exactly as in
    // both regimes (no triangles, but the wedge sets must agree; a wrong
    // tie rule here would produce phantom or missing wedges on larger
    // graphs)
    cornerBags(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
  }

  test("staged oriented co-engagement mart == freshly rebuilt orientation " +
      "(row set), and the staged scan round-trips") {
    import graft.queries.TrainingQueries
    val staged = TrainingQueries.orientedTop500(spark, sfDir)
    val rebuilt = LinkAnalysis.orientedEdges(
      TrainingQueries.coEngagementTop500(spark, sfDir), "ua", "ub")
    assert(staged.except(rebuilt).isEmpty && rebuilt.except(staged).isEmpty,
      "staged orientation must equal the inline rebuild")
    spark.sharedState.cacheManager.clearCache()
    val again = TrainingQueries.orientedTop500(spark, sfDir)
    assert(again.count() == staged.count())
  }

  test("kCore: cascading peel (tail falls in two rounds, triangle " +
      "survives), K4 is its own 3-core, over-k empties, self-loops drop") {
    def core(k: Int, rows: (Long, Long)*): Map[Long, Long] = {
      val m = LinkAnalysis.kCore(rows.toDF("a", "b"), "a", "b", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.sharedState.cacheManager.clearCache()
      m
    }
    // triangle with a 2-hop tail: k=2 peels node 5 (deg 1), which DROPS
    // node 4 to deg 1 in the next round — a single-pass degree filter
    // would keep 4; the fixpoint must not
    val tail = core(2, 1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L)
    assert(tail == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // K4 is its own 3-core; a pendant is peeled without disturbing it
    val k4 = core(3, 1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L, 4L -> 9L)
    assert(k4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the densest core: everything peels
    assert(core(4, 1L -> 2L, 2L -> 3L, 3L -> 1L).isEmpty)
    // duplicates/reversals collapse; self-loops are not degree
    assert(core(2, 1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 1L -> 1L) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // regime equivalence: the driver cascade (default on small graphs)
    // and the distributed peel loop (forced via maxDriverEdges = 0)
    // compute the same unique k-core
    val rows = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L,
      1L -> 4L, 2L -> 4L)
    val viaDriver = LinkAnalysis.kCore(rows.toDF("a", "b"), "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = LinkAnalysis.kCore(rows.toDF("a", "b"), "a", "b", 3,
        maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sharedState.cacheManager.clearCache()
    assert(viaDriver == viaLoop, s"regimes disagree: $viaDriver vs $viaLoop")
    assert(viaDriver == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("hitsTopK: the consensus authority and the broad hub rank first, " +
      "exact fixed-point values, no cached state left") {
    // hubs 1,2,3 all endorse authority 10; only 1 endorses 11.
    // Round 1: a(10) = 3*scale -> normalized a(10) = scale, a(11) = scale/3
    //   (aDiv = 3e9 div 1e9 = 3). Hub 1 points at both -> top hub.
    val e = edges(1L -> 10L, 2L -> 10L, 3L -> 10L, 1L -> 11L)
    val out = LinkAnalysis.hitsTopK(spark, e, "src", "dst", iters = 1, k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(10L)._1 == 1000000000L, s"consensus authority: ${out(10L)}")
    assert(out(11L)._1 == 333333333L, s"single-endorsement authority: ${out(11L)}")
    // hub scores: h(1) = a(10)+a(11) = 1333333333 -> max-normalized to
    // scale; h(2) = h(3) = a(10) div 1 = 1e9 div 1 -> 1000000000
    assert(out(1L)._2 > out(2L)._2 && out(2L)._2 == out(3L)._2)
    assert(out(1L)._1 == 0L, "pure hubs have zero authority")
    assert(spark.sharedState.cacheManager.isEmpty,
      "hitsTopK must release every pin")
    // determinism: bit-identical on a second run
    val again = LinkAnalysis.hitsTopK(spark, e, "src", "dst", iters = 1, k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == out)
  }

  test("nulls and self-loops flow through the documented semantics") {
    // null src/dst rows are dropped; the self-loop keeps node 1 fed
    val e = Seq((Some(1L), Some(1L)), (Some(1L), Some(2L)), (Some(3L), Some(1L)),
        (None, Some(9L)), (Some(9L), None))
      .toDF("src", "dst")
    val r = ranks(LinkAnalysis.pageRank(e, "src", "dst", iters = 1))
    // node 9 appears only on null-partnered rows -> not in the graph;
    // 1 self-feeds + takes 3's mass, 2 is dangling, 3 gets only base+share
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r(1L) > r(2L) && r(2L) > r(3L))
  }

  // ---- coEngagementEdges: regime equivalence + automatic selection ----

  private def pairsDF(rows: (Long, Long)*) = rows.toDF("u", "tp")

  private def sortedSup(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("ua", "ub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("coEngagement: dense and sparse regimes produce the identical " +
      "support table, including duplicates / nulls / out-of-domain topics") {
    val raw = Seq(
      (Some(1L), Some(0L)), (Some(1L), Some(0L)), // duplicate engagement
      (Some(1L), Some(63L)), (Some(1L), Some(64L)), // both bitset halves
      (Some(2L), Some(0L)), (Some(2L), Some(64L)), (Some(2L), Some(127L)),
      (Some(3L), Some(63L)), (Some(3L), Some(127L)),
      (Some(4L), Some(5L)),               // shares nothing -> no edges
      (Some(5L), Some(200L)),             // out of domain -> dropped
      (None, Some(1L)), (Some(6L), None)) // nulls dropped
      .toDF("u", "tp")
    val e = raw.select(col("u").cast("long").as("u"), col("tp").cast("long").as("tp"))
      .filter(col("u").isNotNull && col("tp").between(0, 127)).distinct()
    val dense = sortedSup(LinkAnalysis.coEngagementSupport(e, dense = true, domain = 128))
    val sparse = sortedSup(LinkAnalysis.coEngagementSupport(e, dense = false, domain = 128))
    assert(dense == sparse, s"regimes disagree: $dense vs $sparse")
    // hand check: 1∩2 = {0,64} -> 2; 1∩3 = {63} -> 1; 2∩3 = {127} -> 1
    assert(dense == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("coEngagement: the selector picks dense for few-users/many-topics, " +
      "sparse for many-users/few-topics, and respects the hard bounds") {
    // few users, each engaging most of the domain: |U|^2/2 tiny,
    // sum m_t^2 large -> dense
    assert(LinkAnalysis.chooseDense(nUsers = 30, sumMSq = 100 * 30 * 30,
      topicDomain = Some(100), maxDenseUsers = 1L << 21))
    // many users each with ~1 topic: |U|^2 dominates -> sparse
    assert(!LinkAnalysis.chooseDense(nUsers = 2000, sumMSq = 100 * 20 * 20,
      topicDomain = Some(100), maxDenseUsers = 1L << 21))
    // domain too wide for the 128-bit bitset -> sparse regardless
    assert(!LinkAnalysis.chooseDense(nUsers = 30, sumMSq = Long.MaxValue,
      topicDomain = Some(129), maxDenseUsers = 1L << 21))
    // unbounded vocabulary -> sparse regardless
    assert(!LinkAnalysis.chooseDense(nUsers = 30, sumMSq = Long.MaxValue,
      topicDomain = None, maxDenseUsers = 1L << 21))
    // mask table past the broadcast bound -> sparse regardless
    assert(!LinkAnalysis.chooseDense(nUsers = 100, sumMSq = Long.MaxValue,
      topicDomain = Some(100), maxDenseUsers = 99))
    // |U|^2 must not overflow Long on cluster-scale user counts
    assert(!LinkAnalysis.chooseDense(nUsers = 4000000000L, sumMSq = Long.MaxValue,
      topicDomain = Some(100), maxDenseUsers = Long.MaxValue))
  }

  test("coEngagementEdges end-to-end: deterministic top-k cut, identical " +
      "result whichever regime the stats select, no cached state left") {
    // earlier tests legitimately leave pageRank's documented rank pin;
    // start from a clean slate so the isEmpty check below isolates THIS
    // operator's cleanup
    spark.catalog.clearCache()
    // dense-regime fixture (3 users, rich topic sets)
    val dense = pairsDF(1L -> 0L, 1L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 1L,
      3L -> 2L, 3L -> 3L, 1L -> 3L)
    val got = LinkAnalysis.coEngagementEdges(dense, "u", "tp", topK = 2,
      topicDomain = Some(100))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // supports: (1,2)=2, (1,3)=2, (2,3)=0 -> top-2 by (c desc, ua, ub)
    assert(got == Seq((1L, 2L, 2L), (1L, 3L, 2L)))
    // sparse-regime fixture (many users, one topic each, shared pairwise):
    // 40 users on topic 7 -> all C(40,2) pairs support 1
    val sparseRows = (1L to 40L).map(u => u -> 7L)
    val sp = LinkAnalysis.coEngagementEdges(pairsDF(sparseRows: _*), "u", "tp",
      topK = 1000, topicDomain = Some(100))
    assert(sp.count() == 40L * 39 / 2)
    // the distinct pair table is a documented query-scoped pin, released
    // by the session's per-query cache clear (the engine-wide pattern)
    assert(!spark.sharedState.cacheManager.isEmpty,
      "the pair table should be pinned until the per-query clear")
    spark.catalog.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("staged co-engagement top-500 projection == freshly rebuilt " +
      "projection, and a second call reads the stage") {
    import graft.queries.TrainingQueries
    val staged = TrainingQueries.coEngagementTop500(spark, sfDir)
    val rebuilt = TrainingQueries.coEngagementTop500Fresh(spark, sfDir)
    assert(staged.except(rebuilt).isEmpty && rebuilt.except(staged).isEmpty,
      "staged projection must equal the inline rebuild")
    val again = TrainingQueries.coEngagementTop500(spark, sfDir)
    assert(again.count() == staged.count())
    spark.catalog.clearCache()
  }

  test("staged LPA community mart == freshly rebuilt sweeps, and a " +
      "second call reads the stage") {
    import graft.queries.TrainingQueries
    val staged = TrainingQueries.lpaLabels3(spark, sfDir)
    val rebuilt = TrainingQueries.lpaLabels3Fresh(spark, sfDir)
    assert(staged.except(rebuilt).isEmpty && rebuilt.except(staged).isEmpty,
      "staged labels must equal the inline rebuild")
    val again = TrainingQueries.lpaLabels3(spark, sfDir)
    assert(again.count() == staged.count())
    spark.catalog.clearCache()
  }

  test("labelPropagation: hand-computed synchronous sweeps on two " +
      "triangles joined by a bridge — communities converge and the " +
      "tie-break is the smallest label") {
    // 1-2, 2-3, 1-3 (triangle A), 4-5, 5-6, 4-6 (triangle B), bridge 3-4.
    // l0 = own id. Sweep 1 (most frequent neighbor label, ties -> min):
    //   1:{2,3}->2  2:{1,3}->1  3:{1,2,4}->1  4:{3,5,6}->3  5:{4,6}->4  6:{4,5}->4
    // Sweep 2: 1:{1,1}->1  2:{2,1}->1  3:{2,1,3}->1  4:{1,4,4}->4
    //   5:{3,4}->3  6:{3,4}->3
    // Sweep 3: 1->1 2->1 3:{1,1,4}->1 4:{1,3,3}->3 5:{4,3}->3 6:{4,3}->3
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("a", "b")
    val out = LinkAnalysis.labelPropagation(g, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      4L -> (3L, 3L), 5L -> (3L, 3L), 6L -> (3L, 3L)))
    spark.catalog.clearCache()
  }

  test("communityModularity: hand-computed Newman numerators on the " +
      "bridged triangles — the bridge edge is inter-community") {
    // m = 7. Community 1 = {1,2,3}: intra 3, degrees 2+2+3 = 7,
    // q_num = 4*7*3 - 49 = 35; community 3 = {4,5,6} symmetric.
    // Global Q = (35+35)/(4*49) = 5/14.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("a", "b")
    val lp = LinkAnalysis.labelPropagation(g, "a", "b", rounds = 3)
    val q = LinkAnalysis.communityModularity(g, "a", "b", lp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(q == Map(1L -> (3L, 3L, 7L, 35L), 3L -> (3L, 3L, 7L, 35L)))
    spark.catalog.clearCache()
  }

  test("communityModularity: a community with no internal edge keeps " +
      "its row with intra_edges = 0 and a negative numerator") {
    // star 1-2, 1-3 with forced partition {1}|{2,3}: community 9 has
    // nodes 2,3, no internal edge, D = 2 -> q_num = -4
    val g = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val labels = Seq((1L, 5L), (2L, 9L), (3L, 9L)).toDF("node", "label")
    val q = LinkAnalysis.communityModularity(g, "a", "b", labels)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(q == Map(5L -> (1L, 0L, 2L, -4L), 9L -> (2L, 0L, 2L, -4L)))
    spark.catalog.clearCache()
  }

  test("degreeAssortativity: the 2-path is perfectly disassortative " +
      "(r_num/r_den = -1), sums hand-computed") {
    // edges (1,2),(2,3): degrees 1,2,1. m=2, Σ(j+k)=6, Σ(j²+k²)=10,
    // Σjk=4 -> r_num = 32-36 = -4, r_den = 40-36 = 4 -> r = -1.
    val g = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = LinkAnalysis.degreeAssortativity(g, "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((2L, 6L, 10L, 4L, -4L, 4L)))
  }

  test("degreeAssortativity: the triangle is degree-regular — zero " +
      "variance, r_num = r_den = 0, and duplicates/direction are inert") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L)).toDF("a", "b")
    val r = LinkAnalysis.degreeAssortativity(g, "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(4), r.getLong(5)) == ((3L, 0L, 0L)))
  }

  test("linkPredictionTopK: bridged triangles — exactly the four " +
      "2-hop non-adjacent pairs, hand-computed scores, ordered cut") {
    // candidates via center 3: (1,4),(2,4); via center 4: (3,5),(3,6).
    // All cn=1; pa = 2*3=6, 2*3=6, 3*2=6, 3*2=6. Order (cn desc,
    // pa desc, a, b): (1,4),(2,4),(3,5),(3,6).
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("a", "b")
    val all = LinkAnalysis.linkPredictionTopK(g, "a", "b", topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(all.toSeq == Seq((1L, 4L, 1L, 6L), (2L, 4L, 1L, 6L),
      (3L, 5L, 1L, 6L), (3L, 6L, 1L, 6L)))
    val cut = LinkAnalysis.linkPredictionTopK(g, "a", "b", topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cut.toSeq == Seq((1L, 4L), (2L, 4L), (3L, 5L)))
    spark.catalog.clearCache()
  }

  test("linkPredictionTopK: adjacent pairs never appear even when they " +
      "share many neighbors (the anti-join leg)") {
    // K4 minus nothing: every pair adjacent -> no candidates at all
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toDF("a", "b")
    assert(LinkAnalysis.linkPredictionTopK(k4, "a", "b", 10).count() == 0L)
    spark.catalog.clearCache()
  }

  test("labelPropagation: edge direction and duplication never change " +
      "the result (canonicalized symmetric input)") {
    val fwd = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val rev = Seq((2L, 1L), (3L, 2L), (3L, 1L), (4L, 3L), (1L, 3L))
      .toDF("a", "b")
    val r1 = LinkAnalysis.labelPropagation(fwd, "a", "b", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val r2 = LinkAnalysis.labelPropagation(rev, "a", "b", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(r1.sameElements(r2) && r1.nonEmpty)
    spark.catalog.clearCache()
  }
}
