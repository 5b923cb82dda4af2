package graft.queries

import graft.SparkSpec
import graft.core.GraftSession
import org.apache.spark.sql.DataFrame

/** Physical-plan audits: these assertions pin the plan shapes that keep the
  * engine viable at 100 TB, so a regression in a query rewrite (or a Spark
  * upgrade) that silently degrades the plan fails CI, not production.
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(name: String, dir: String = sfDir): String = {
    GraftSession.tune(spark)
    val df: DataFrame = graft.SparkEntry.queries(name)(spark, dir)
    df.collect() // let AQE finalize
    // keep only the final adaptive plan (toString appends the initial plan too)
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("s4_typed_scan pushes filters and prunes columns at the parquet scan") {
    val p = planOf("s4_typed_scan")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), IsNotNull(o_totalprice), " +
      "EqualTo(o_orderstatus,F), GreaterThan(o_total"), p)
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_orderstatus:string,o_totalprice:double>"), p)
  }

  test("j2_dim_join broadcasts every dimension (no shuffle of the fact side)") {
    val p = planOf("j2_dim_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin"), s"dims must not sort-merge:\n$p")
  }

  test("j3_asof_join executes as an equi join with the range as residual filter") {
    val p = planOf("j3_asof_join")
    val equiJoin = p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")
    assert(equiJoin, s"as-of join must keep the equi key as join key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"keyed as-of join must not degrade to a cross product:\n$p")
  }

  test("j3_asof_global broadcasts the tiny interval side (BNLJ, not cartesian)") {
    // sf0.01: the global price series is non-empty there (at sf0.001 AQE's
    // empty-relation propagation removes the join altogether)
    val p = planOf("j3_asof_global", "/root/testdata/sf0.01")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), s"must never shuffle-cartesian:\n$p")
  }

  test("j4_anti_join stays an anti join (no materialized subquery)") {
    val p = planOf("j4_anti_join")
    assert(p.contains("LeftAnti"), p)
  }

  test("k3_sorted_export and top-1 shapes avoid a global single-partition sort") {
    val p = planOf("j7_cross_scalar")
    // the scalar side collapses to a partial+final agg, not a global window
    assert(!p.contains("Window"), s"scalar-latest must not use a window:\n$p")
  }

  test("q1_pricing_summary aggregates with map-side partial aggregation") {
    val p = planOf("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expect partial+final HashAggregate:\n$p")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz>") ||
      !p.contains("l_orderkey"), s"scan must prune to the 6 needed columns:\n$p")
  }

  test("t_dedup_jaccard: every join is an equi join (no cross products)") {
    val p = planOf("t_dedup_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate/verify joins must stay equi-keyed:\n$p")
    // the common-shingle count join must carry the digest in its key, not
    // re-filter an exploded pair x shingle cross product
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("t_ann_ivf: centroid attach broadcasts; corpus is never cross-joined wide") {
    val p = planOf("t_ann_ivf")
    // assignment + probe sides are tiny and broadcast; the only nested-loop
    // join allowed is against a <= nlist-row broadcast side
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), s"no shuffled cartesian at any size:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded TakeOrdered, not a global sort:\n$p")
  }

  test("t_ann_lsh / t_ann_cosine: top-k is TakeOrdered, query side broadcast") {
    for (q <- Seq("t_ann_lsh", "t_ann_cosine")) {
      val p = planOf(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q must not globally sort:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: no shuffled cartesian:\n$p")
    }
  }

  test("w1_current_state shuffles once on the entity key") {
    val p = planOf("w1_current_state")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"window dedup needs exactly one key shuffle:\n$p")
    // Spark's WindowGroupLimit prunes to rank-1 candidates map-side BEFORE
    // the shuffle — the property that makes latest-state dedup viable when
    // the change log is 1000x the entity count.
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"expected partial window-group-limit pushdown:\n$p")
  }

  test("w2_first_order gets the same partial window-group-limit pushdown") {
    val p = planOf("w2_first_order")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"row_number=1 dedup must prune map-side too:\n$p")
  }

  test("a5_trade_agg / a5_asset_stats broadcast the dimension, never sort-merge") {
    for (q <- Seq("a5_trade_agg", "a5_asset_stats")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: part dim must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q: fact side must not shuffle for the join:\n$p")
    }
  }

  test("t_sketch_kmv runs the sketch as a partial object aggregate") {
    val p = planOf("t_sketch_kmv")
    // TypedImperativeAggregate → ObjectHashAggregate, partial + final:
    // every map partition reduces to <= k hashes per group pre-shuffle
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
    assert(!p.contains("Window"), s"sketch must not fall back to a window sort:\n$p")
  }

  test("t_heavy_hitters runs MG as a partial object aggregate, no window sort") {
    val p = planOf("t_heavy_hitters")
    // partial + final ObjectHashAggregate: each map partition ships <= k
    // (item, cnt) pairs per group — cost independent of vocabulary size
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
    assert(!p.contains("Window"), s"MG must not fall back to a ranked window:\n$p")
  }

  test("t_sketch_mart merges day sketches with partial aggregation on both levels") {
    val p = planOf("t_sketch_mart")
    // build level: graft_kmv_mins partial+final; merge level: the
    // collect_list of <= k-string arrays partially aggregates too
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"mart merge must stay a partial object aggregate:\n$p")
    assert(!p.contains("Window"), s"no window sort in the mart path:\n$p")
  }

  test("a5_balance_running: keyed window, no single-partition funnel") {
    val p = planOf("a5_balance_running")
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"),
      s"running total must stay partitioned by entity:\n$p")
  }

  test("sampling queries: stateless filter over the scan, one agg shuffle only") {
    for (q <- Seq("t_sample_split", "t_sample_stratified")) {
      val p = planOf(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"$q: the only shuffle allowed is the final small aggregate:\n$p")
      assert(!p.contains("Join"), s"$q: sampling must not join:\n$p")
    }
  }

  test("t_multimodal_frames shuffles at most the raw (id, payload) rows " +
      "once (the pre-explode spread) — frame/fingerprint rows never " +
      "shuffle") {
    val p = planOf("t_multimodal_frames")
    assert(p.contains("Generate explode"), p)
    // at most one SHUFFLE exchange, and it sits BELOW the Generate: the
    // spread of the raw rows that parallelizes per-frame fingerprinting
    // on few-split sources (r10). The exploded frame relation itself must
    // stay exchange-free — an Exchange above the Generate would shuffle
    // per-frame rows. Matched per plan LINE at the node-name position
    // (word-bounded, so BroadcastExchange never counts, and AQE wrapper
    // prefixes don't matter), ordered by line index — robust against
    // plan-rendering changes, unlike a raw substring scan.
    val lines = p.linesIterator.toVector
    val shuffleLines = lines.zipWithIndex.filter { case (l, _) =>
      "\\bExchange\\b".r.findFirstIn(l).isDefined
    }
    assert(shuffleLines.size <= 1,
      s"frame rows must not shuffle (found ${shuffleLines.map(_._1)}):\n$p")
    shuffleLines.headOption.foreach { case (_, exIdx) =>
      val genIdx = lines.indexWhere(_.contains("Generate explode"))
      assert(genIdx >= 0 && exIdx > genIdx,
        s"the only shuffle exchange must be below the Generate (plan " +
          s"prints top-down):\n$p")
    }
  }

  test("IVF index probe reads ONLY the probed cells' partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    GraftSession.tune(spark)
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf_audit").toString
    graft.functions.IvfIndex.build(emb, nlist = 16, dir)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select(org.apache.spark.sql.functions.col("embedding"))
    val topk = graft.functions.IvfIndex.topK(spark, dir, q, k = 10, nprobe = 4)
    topk.collect()
    // AQE hides the final plan behind AdaptiveSparkPlanExec — unwrap it
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case s: QueryStageExec        => allScans(s.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other                    => other.children.flatMap(allScans)
    }
    val scan = allScans(topk.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("index")))
      .getOrElse(fail(s"no index scan found in:\n${topk.queryExecution.executedPlan}"))
    val s = scan.toString
    assert(s.contains("PartitionFilters: [") && s.contains("cell"),
      s"probe must prune on the cell partition column:\n$s")
    assert(!s.contains("PartitionFilters: []"),
      s"probe must not scan the whole index:\n$s")
    scan.metrics.get("numPartitions").map(_.value).foreach { n =>
      assert(n == 4, s"nprobe=4 must read 4 cell partitions, read $n")
    }
  }

  test("t_substring_dedup: shuffles carry digests, never document text") {
    val p = planOf("t_substring_dedup")
    // every exchange key/payload is the 32-char digest + counts — the text
    // column must be consumed by the shingle expression before any shuffle
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, p)
    assert(!exchanges.exists(_.contains("text#")),
      s"document text must not cross a shuffle:\n${exchanges.mkString("\n")}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"digest join must stay equi-keyed:\n$p")
  }

  test("t_quality_rules is one fused scan: no shuffle, no join") {
    val p = planOf("t_quality_rules")
    assert(!p.contains("Exchange"), s"rule battery must not shuffle:\n$p")
    assert(!p.contains("Join"), s"rule battery must not join:\n$p")
  }

  test("p1_struct_flatten_wide: the 120-leaf flatten stays one map-side " +
      "projection — at most the NARROW input rows spread once, below the " +
      "parse; flattened rows never shuffle") {
    val p = planOf("p1_struct_flatten_wide")
    // r11: the narrow (5-col) input may round-robin-spread ONCE so the
    // CodegenFallback from_json parse runs wide on few-split sources
    // (no-op on many-split production tables). The exchange must sit
    // BELOW the parse Project — an exchange above it would shuffle the
    // 121-leaf rows. Same line-anchored matching as the frames audit.
    val lines = p.linesIterator.toVector
    val shuffleLines = lines.zipWithIndex.filter { case (l, _) =>
      "\\bExchange\\b".r.findFirstIn(l).isDefined
    }
    assert(shuffleLines.size <= 1,
      s"flattened rows must not shuffle (found ${shuffleLines.map(_._1)}):\n$p")
    shuffleLines.headOption.foreach { case (l, exIdx) =>
      assert(l.contains("RoundRobinPartitioning"),
        s"the only exchange must be the narrow-input spread:\n$p")
      val parseIdx = lines.indexWhere(_.contains("from_json"))
      assert(parseIdx >= 0 && exIdx > parseIdx,
        s"the spread must sit below the parse Project (plan prints " +
          s"top-down):\n$p")
    }
    assert(!p.contains("Join"), s"wide flatten must not join:\n$p")
  }

  test("s9_audit_wide: the six-leg audit coalesce is ONE conditional-agg " +
      "pass — no join, one shuffle") {
    // the reference builds this as six CTEs LEFT-JOINed back together;
    // the Spark-first plan must collapse to a single scan + single
    // hash-aggregate exchange or the 100 TB claim is void
    val p = planOf("s9_audit_wide")
    assert(!p.contains("Join"), s"wide audit mart must not self-join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"exactly one shuffle (the job_id agg):\n$p")
  }

  test("s9_audit_read: the ordered ARRAY_AGG leg is one scan + one " +
      "shuffle (the job_id collect), no join") {
    val p = planOf("s9_audit_read")
    assert(!p.contains("Join"), s"data-read leg must not self-join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"exactly one shuffle (the job_id agg):\n$p")
  }

  test("t_image_dedup: pixels never shuffle — every exchange after the " +
      "decode carries only ids and 8-byte hashes") {
    val p = planOf("t_image_dedup")
    // the payload/grid columns must be confined to the decode tasks:
    // no Exchange row mentions them
    val leaky = p.linesIterator
      .filter(l => l.contains("Exchange"))
      .filter(l => l.contains("payload") || l.contains("grid"))
      .toSeq
    assert(leaky.isEmpty, s"pixels crossed an exchange:\n${leaky.mkString("\n")}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band candidates must stay equi-keyed:\n$p")
  }

  test("t_audio_decode: the audio decode is one shuffle-free pass — " +
      "samples never leave their task") {
    val p = planOf("t_audio_decode")
    assert(!p.contains("Exchange"), s"audio decode must not shuffle:\n$p")
  }

  test("t_video_dedup: pixels and grids are confined to the decode " +
      "tasks; band candidates stay equi-keyed") {
    val p = planOf("t_video_dedup")
    val leaky = p.linesIterator
      .filter(l => l.contains("Exchange"))
      .filter(l => l.contains("payload") || l.contains("grid"))
      .toSeq
    assert(leaky.isEmpty, s"pixels crossed an exchange:\n${leaky.mkString("\n")}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band candidates must stay equi-keyed:\n$p")
  }

  test("t_multimodal_retrieve: frames explode map-side, query broadcasts, " +
      "top-k is TakeOrdered — no corpus-wide shuffle") {
    val p = planOf("t_multimodal_retrieve")
    assert(!p.contains("Exchange hashpartitioning"),
      s"frame retrieval must not hash-shuffle the corpus:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be TakeOrdered:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row query frame must broadcast:\n$p")
  }

  test("t_token_budget: one shuffle (the keyed window), running total " +
      "never funnels to a single partition") {
    val p = planOf("t_token_budget")
    assert(!p.contains("Exchange SinglePartition"),
      s"budget cap must stay keyed, not global:\n$p")
    assert(p.contains("Window"), p)
  }

  test("t_dsir_sample: ratio table broadcasts — no sort-merge join " +
      "anywhere in the scoring pass") {
    val p = planOf("t_dsir_sample", "/root/testdata/sf0.01")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the <=4096-row ratio relation must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no bigram-stream-sized shuffle join is acceptable:\n$p")
  }

  test("t_sample_priority: top-k via TakeOrdered, never a global sort; " +
      "the tau threshold broadcasts") {
    val p = planOf("t_sample_priority", "/root/testdata/sf0.01")
    assert(p.contains("TakeOrderedAndProject"),
      s"the k+1 cut must be a TakeOrdered, not Sort+Limit:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no corpus-wide range-partitioned sort is acceptable:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row tau must broadcast:\n$p")
  }

  test("t_sample_priority_key: exactly one exchange (the key), windows " +
      "share it — no second shuffle, no single-partition funnel") {
    val p = planOf("t_sample_priority_key", "/root/testdata/sf0.01")
    assert(!p.contains("Exchange SinglePartition"),
      s"per-key rank must stay keyed:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"both windows must reuse ONE key exchange, found $exchanges:\n$p")
  }

  test("s9_audit_slots: events scanned once; the per-minute attribution " +
      "windows never funnel to a single partition") {
    val p = planOf("s9_audit_slots", "/root/testdata/sf0.01")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"the timeline must derive from ONE scan, found $scans:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"minute totals must stay keyed on minute_idx:\n$p")
  }

  test("s2_tx_operations: whole-record decode + per-op fan-out is one " +
      "shuffle-free scan -> project -> generate pass inside codegen, " +
      "and the decode runs ONCE per row") {
    val p = planOf("s2_tx_operations", "/root/testdata/sf0.01")
    // the decode is per-row work: NOTHING here justifies an exchange —
    // at 100 TB this plan ingests embarrassingly parallel
    assert(!p.contains("Exchange"), s"record decode must not shuffle:\n$p")
    assert(p.contains("Generate"), s"the operations array must explode:\n$p")
    assert(p.contains("*("),
      s"the decode expressions must run inside codegen stages:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"one pass over the envelope relation, found $scans:\n$p")
    // a non-outer generate lets InferFiltersFromGenerate re-substitute
    // the WHOLE decode into a pushed-down size() filter — the parse, the
    // dominant per-row ingest cost, would run twice per row (the
    // posexplode_outer + null-filter shape in txOpsProject avoids it)
    val decodes = "graft_xdr_tx_envelope".r.findAllIn(p).size
    assert(decodes == 1,
      s"the record decode must appear ONCE in the plan, found $decodes:\n$p")
  }

  test("s2_envelope_kinds + s2_tx_mart: the pure-projection decodes stay " +
      "single-evaluation (CollapseProject must not inline the non-cheap " +
      "decode alias into every output column)") {
    val p1 = planOf("s2_envelope_kinds", "/root/testdata/sf0.01")
    val d1 = "graft_xdr_tx_envelope".r.findAllIn(p1).size
    assert(d1 == 1, s"kinds decode must appear ONCE, found $d1:\n$p1")
    assert(!p1.contains("Exchange"), s"projection must not shuffle:\n$p1")
    val p2 = planOf("s2_tx_mart", "/root/testdata/sf0.01")
    val d2 = "graft_xdr_tx_envelope".r.findAllIn(p2).size
    assert(d2 == 1, s"mart decode must appear ONCE, found $d2:\n$p2")
  }

  test("s2_tx_ops_ext: the extended-arm fan-out keeps the same contract " +
      "— one shuffle-free scan, decode ONCE, codegen throughout") {
    val p = planOf("s2_tx_ops_ext", "/root/testdata/sf0.01")
    assert(!p.contains("Exchange"), s"record decode must not shuffle:\n$p")
    assert(p.contains("*("),
      s"the decode expressions must run inside codegen stages:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"one pass over the envelope relation, found $scans:\n$p")
    val decodes = "graft_xdr_tx_envelope".r.findAllIn(p).size
    assert(decodes == 1,
      s"the record decode must appear ONCE in the plan, found $decodes:\n$p")
  }
}
