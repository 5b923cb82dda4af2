package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-analysis ranking (PageRank power iteration) as relational
  * dataflow — the domain/host authority score web-corpus curation runs
  * over the crawl link graph to prioritize fetching and weight quality
  * (Common-Crawl-style pipelines rank hosts exactly this way).
  *
  * All arithmetic is INTEGER fixed-point: ranks live in `scale` units
  * (default 1e9) and every step is bigint multiply / integer-divide, so
  * the result is bit-identical on any engine and any partitioning — no
  * float summation order anywhere. The oracle replays the rounds
  * relationally with the same integer ops.
  *
  * Scale posture: each round is one equi-join of the rank table against
  * the edge list (shuffle keyed on src), a map-side-combinable sum by
  * dst, and a broadcast of two scalars (node count, dangling mass). The
  * rank and degree tables are node-sized, the join is edge-sized —
  * nothing is ever corpus-quadratic, and round state is persisted
  * eagerly so lineage stays flat. On a cluster the edge list would be
  * bucketed by src so every round's join is exchange-free on the big
  * side.
  */
object LinkAnalysis {

  /** Iterated integer PageRank. Input: a directed edge list (duplicates
    * collapsed here). Returns the scored node table and the persisted
    * final rank state backing it (node-sized), for the caller to
    * unpersist after its terminal action.
    *
    * Per round, with d = dampNum/dampDen and N = node count:
    *   contrib(v) = Σ_{u→v} rank(u) div outdeg(u)
    *   share     = (Σ_{dangling u} rank(u)) div N
    *   rank'(v)  = (scale·(dampDen−dampNum) div dampDen div N)
    *             + ((contrib(v) + share) · dampNum div dampDen)
    */
  private def iterate(edges: DataFrame, srcCol: String, dstCol: String,
                      iters: Int, dampNum: Int, dampDen: Int,
                      scale: Long): (DataFrame, DataFrame) = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count(); outdeg.count()

    // node count as a broadcast 1-row relation: keeps the whole pipeline
    // collect-free and engine-replayable
    val nTbl = broadcast(nodes.agg(count(lit(1)).as("n")))

    var ranks = nodes.crossJoin(nTbl)
      .select(col("node"), expr(s"${scale}L div n").as("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()

    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("insum"))
      val dangling = broadcast(
        ranks.join(outdeg.select(col("src").as("node")), Seq("node"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("dm")))
      val next = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(nTbl).crossJoin(dangling)
        .select(col("node"),
          (expr(s"(${scale}L * ${dampDen - dampNum} div $dampDen) div n") +
            expr(s"(coalesce(insum, 0L) + (dm div n)) * $dampNum div $dampDen"))
            .as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      ranks.unpersist(false)
      ranks = next
    }
    val out = ranks.select(col("node"), col("rank").as("rank_scaled"),
      (col("rank").cast("double") / lit(scale.toDouble)).as("rank"))
    // inputs are released — `out` only scans the materialized final state
    e.unpersist(false); nodes.unpersist(false); outdeg.unpersist(false)
    (out, ranks)
  }

  /** Full scored node table. The backing rank state stays cached until
    * the session's per-query cache clear; use [[pageRankTopK]] when the
    * consumer is a top-k read and the pin should be released eagerly. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampNum: Int = 85, dampDen: Int = 100,
               scale: Long = 1000000000L): DataFrame =
    iterate(edges, srcCol, dstCol, iters, dampNum, dampDen, scale)._1

  /** Deterministic top-k by rank (ties broken by node id) — the read
    * path a crawl scheduler actually consumes. */
  def topK(ranked: DataFrame, k: Int): DataFrame =
    ranked.orderBy(col("rank_scaled").desc, col("node")).limit(k)

  /** Top-k with full cleanup: collects the k result rows (result-sized
    * by construction) so the iteration's node-sized rank pin can be
    * released before returning. */
  def pageRankTopK(spark: SparkSession, edges: DataFrame,
                   srcCol: String, dstCol: String, iters: Int, k: Int,
                   dampNum: Int = 85, dampDen: Int = 100,
                   scale: Long = 1000000000L): DataFrame = {
    val (ranked, pin) = iterate(edges, srcCol, dstCol, iters, dampNum, dampDen, scale)
    val out = topK(ranked, k)
    val rows = out.collect()
    pin.unpersist(false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
  }
}
