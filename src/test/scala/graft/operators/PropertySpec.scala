package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Generator-driven invariants over randomized inputs — the properties the
  * example-based specs assert once, checked across arbitrary shapes
  * (duplicate keys, empty batches, ties, singleton tables). Raw scalacheck
  * driving Spark: iterations are kept small because each case is a real
  * distributed job.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withMaxSize(30), prop)
    assert(res.passed, res.status.toString)
  }

  private val rowGen: Gen[(Long, Long, Double)] = for {
    key <- Gen.chooseNum(0L, 6L) // small key space forces collisions
    batch <- Gen.chooseNum(0L, 2L)
    v <- Gen.chooseNum(0, 999)
  } yield (key, batch, v / 100.0)

  private val tableGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOf(rowGen)

  test("delIns is idempotent and exactly-once for ANY target/batch pair") {
    check(Prop.forAll(tableGen, tableGen) { (t0, b0) =>
      val target = t0.toDF("k", "batch_id", "v")
      val batch = b0.map { case (k, _, v) => (k, 99L, v) }.toDF("k", "batch_id", "v")
      val once = DelIns.delIns(target, batch, Seq("batch_id"))
      val twice = DelIns.delIns(once, batch, Seq("batch_id"))
      // retry is a no-op, batch rows land exactly once, foreign batches
      // survive untouched
      twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty &&
        once.filter($"batch_id" === 99L).count() == batch.count() &&
        once.filter($"batch_id" =!= 99L).count() ==
          target.filter($"batch_id" =!= 99L).count()
    })
  }

  private val logGen: Gen[List[(Long, Int, Double, Long)]] = for {
    rows <- Gen.listOf(for {
      key <- Gen.chooseNum(0L, 4L)
      t <- Gen.chooseNum(1, 28)
      v <- Gen.chooseNum(0, 99)
    } yield (key, t, v / 10.0))
  } yield rows.zipWithIndex.map { case ((k, t, v), i) => (k, t, v, i.toLong) }

  test("scd2Merge == full scd2Intervals recompute for ANY log and ANY cut") {
    check(Prop.forAll(logGen, Gen.chooseNum(1, 28)) { (rows, cut) =>
      def df(r: List[(Long, Int, Double, Long)]) = r
        .map { case (k, t, v, id) =>
          (k, java.sql.Timestamp.valueOf(f"2024-01-$t%02d 00:00:00"), v, id) }
        .toDF("user_id", "ts", "value", "event_id")
      val (pre, post) = rows.partition(_._2 < cut)
      val target = AsOfJoin.scd2Intervals(df(pre), Seq("user_id"), "ts",
        Seq("event_id"))
      val merged =
        if (post.isEmpty) target
        else MergeOps.scd2Merge(target, df(post), Seq("user_id"), "ts",
          Seq("event_id"))
      val full = AsOfJoin.scd2Intervals(df(rows), Seq("user_id"), "ts",
        Seq("event_id"))
      merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty
    })
  }

  test("hashSplit is partition-invariant, exhaustive, and disjoint for ANY ids") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      ids0 =>
        val ids = ids0.distinct
        val d = ids.toDF("doc_id")
        val a = Sampling.hashSplit(d, "doc_id")
          .select("doc_id", "split").as[(Long, String)].collect().toMap
        // re-partitioning must not move a single row between splits
        val b = Sampling.hashSplit(d.repartition(7), "doc_id")
          .select("doc_id", "split").as[(Long, String)].collect().toMap
        a == b && a.size == ids.size &&
          a.values.forall(Set("train", "val", "test"))
    })
  }

  private val graphGen: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      a <- Gen.chooseNum(0L, 9L)
      b <- Gen.chooseNum(0L, 9L)
    } yield (a, b))

  test("triangleCounts equals the O(n^3) brute force on ANY small graph") {
    check(Prop.forAll(graphGen) { edges =>
      val adj = edges.collect { case (a, b) if a != b =>
        Set(math.min(a, b) -> math.max(a, b))
      }.flatten.toSet
      def connected(x: Long, y: Long) =
        adj.contains(math.min(x, y) -> math.max(x, y))
      val nodes = adj.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val brute = scala.collection.mutable.Map.empty[Long, Long]
      for {
        i <- nodes.indices; j <- (i + 1) until nodes.size
        k <- (j + 1) until nodes.size
        (a, b, c) = (nodes(i), nodes(j), nodes(k))
        if connected(a, b) && connected(b, c) && connected(a, c)
      } Seq(a, b, c).foreach(n => brute(n) = brute.getOrElse(n, 0L) + 1L)
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else {
          // default = driver forward algorithm; maxDriverEdges = 0
          // forces the distributed wedge join — BOTH must match brute
          val m = LinkAnalysis.triangleCounts(edges.toDF("a", "b"), "a", "b")
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val mPlan = LinkAnalysis.triangleCounts(edges.toDF("a", "b"), "a", "b",
              maxDriverEdges = 0L)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          spark.sharedState.cacheManager.clearCache()
          assert(m == mPlan, s"triangle regimes disagree: $m vs $mPlan")
          m
        }
      got == brute.toMap
    }, n = 10)
  }

  private def canon(edges: List[(Long, Long)]): Set[(Long, Long)] =
    edges.collect { case (a, b) if a != b =>
      math.min(a, b) -> math.max(a, b)
    }.toSet

  test("degreeAssortativity equals the brute-force sufficient " +
      "statistics on ANY small graph") {
    check(Prop.forAll(graphGen) { edges =>
      val adj = canon(edges)
      adj.isEmpty || {
        val deg = adj.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
        val m = adj.size.toLong
        val s1 = adj.toSeq.map(e => deg(e._1) + deg(e._2)).sum
        val s2 = adj.toSeq.map(e =>
          deg(e._1) * deg(e._1) + deg(e._2) * deg(e._2)).sum
        val sp = adj.toSeq.map(e => deg(e._1) * deg(e._2)).sum
        val r = LinkAnalysis.degreeAssortativity(
          edges.toDF("a", "b"), "a", "b").collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)) ==
          ((m, s1, s2, sp, 4 * m * sp - s1 * s1, 2 * m * s2 - s1 * s1))
      }
    }, n = 10)
  }

  test("linkPredictionTopK (uncut) equals the brute-force non-adjacent " +
      "common-neighbor set with exact scores on ANY small graph") {
    check(Prop.forAll(graphGen) { edges =>
      val adj = canon(edges)
      adj.isEmpty || {
        val nbrs = adj.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
          .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
        val nodes = nbrs.keys.toSeq.sorted
        val brute = (for {
          i <- nodes.indices; j <- (i + 1) until nodes.size
          a = nodes(i); b = nodes(j)
          if !adj.contains(a -> b)
          cn = (nbrs(a) & nbrs(b)).size.toLong
          if cn > 0
        } yield (a, b) -> (cn, nbrs(a).size.toLong * nbrs(b).size)).toMap
        val got = LinkAnalysis.linkPredictionTopK(
            edges.toDF("a", "b"), "a", "b", topK = 1000)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
        spark.sharedState.cacheManager.clearCache()
        got == brute
      }
    }, n = 10)
  }

  test("communityModularity equals the brute-force per-community sums " +
      "for ANY small graph under an arbitrary 3-way partition") {
    check(Prop.forAll(graphGen) { edges =>
      val adj = canon(edges)
      adj.isEmpty || {
        val nodes = adj.toSeq.flatMap(e => Seq(e._1, e._2)).distinct
        val lab = nodes.map(n => n -> n % 3).toMap
        val deg = adj.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
        val m = adj.size.toLong
        val brute = nodes.groupBy(lab).map { case (l, ns) =>
          val intra = adj.count(e => lab(e._1) == l && lab(e._2) == l).toLong
          val d = ns.map(deg).sum
          l -> ((ns.size.toLong, intra, d, 4 * m * intra - d * d))
        }
        val labels = nodes.map(n => (n, lab(n))).toDF("node", "label")
        val got = LinkAnalysis.communityModularity(
            edges.toDF("a", "b"), "a", "b", labels)
          .collect().map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
        spark.sharedState.cacheManager.clearCache()
        got == brute
      }
    }, n = 8)
  }

  private val corpusGen: Gen[List[(Long, String)]] = {
    val word = Gen.chooseNum(0, 11).map(i => s"w$i") // tiny vocab → collisions
    Gen.listOfN(6, Gen.listOfN(12, word).map(_.mkString(" ")))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  }

  test("nearDupPairs + hardNegativePairs partition the LSH candidate set " +
      "for ANY corpus and ANY threshold: disjoint and covering") {
    check(Prop.forAll(corpusGen, Gen.chooseNum(1, 9).map(_ / 10.0)) {
      (rows, thr) =>
        val d = rows.toDF("doc_id", "text")
        def pairs(df: org.apache.spark.sql.DataFrame) =
          df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        val pos = pairs(Dedup.nearDupPairs(d, "doc_id", "text",
          n = 3, k = 8, bands = 4, threshold = thr))
        val neg = pairs(Dedup.hardNegativePairs(d, "doc_id", "text",
          n = 3, k = 8, bands = 4, threshold = thr))
        val cands = pairs(Dedup.minhashCandidatePairs(d, "doc_id", "text",
          n = 3, k = 8, bands = 4))
        (pos & neg).isEmpty && (pos | neg) == cands
    }, n = 6)
  }
}
