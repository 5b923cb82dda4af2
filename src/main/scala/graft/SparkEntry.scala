package graft

import graft.core.GraftSession
import graft.queries.{TrainingQueries, WarehouseQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    WarehouseQueries.queries("j2_dim_join")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data pipeline extensions). Each function tunes the session
    * idempotently before building its plan.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (WarehouseQueries.queries ++ TrainingQueries.queries ++
      graft.streaming.StreamingGate.queries ++
      graft.sources.LakeExports.queries).map {
      case (name, fn) =>
        name -> ((s: SparkSession, dir: String) => { GraftSession.tune(s); fn(s, dir) })
    }

  /** DuckDB-runnable oracle SQL per query — every entry in [[queries]] has
    * one (LSH/IVF via inlined deterministic weights and rules, connected
    * components via recursive CTEs, streaming drains via their batch
    * formulations).
    */
  def oracleSql: Map[String, String] =
    WarehouseQueries.oracles ++ TrainingQueries.oracles ++
      graft.streaming.StreamingGate.oracles ++
      graft.sources.LakeExports.oracles
}
