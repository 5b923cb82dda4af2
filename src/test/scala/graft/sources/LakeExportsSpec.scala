package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode

/** The 14 flat avro-export projections (reference
  * dags/queries/generate_avro): shape, scan pruning, and the full-surface
  * inventory — with [[HistoryOperations]]/[[HistoryEffects]] this covers
  * every EXPORT DATA statement the reference ships. Value correctness is
  * the driver's DuckDB hash gate (each query has an oracle entry). */
class LakeExportsSpec extends SparkSpec {

  test("every reference export has a query + oracle, names aligned") {
    // 14 here + the 2 wide ones = the 16 generate_avro files
    assert(LakeExports.queries.size == 14)
    assert(LakeExports.queries.keySet == LakeExports.oracles.keySet)
  }

  test("transactions export carries the reference's 41 columns") {
    val df = LakeExports.frame(LakeExports.transactions)(spark, sfDir)
    assert(df.columns.length == 41)
    // reference history_transactions.sql:9-50 spot checks, in order
    assert(df.columns.take(3).toSeq ==
      Seq("id", "transaction_hash", "ledger_sequence"))
    assert(df.columns.contains("soroban_resources_instructions"))
  }

  test("trades export keeps the reserved-word `order` column") {
    val df = LakeExports.frame(LakeExports.trades)(spark, sfDir)
    assert(df.columns.contains("order"))
    assert(df.count() > 0)
  }

  test("batch-window filter reaches the parquet scan (partition pruning" +
    " analog at 100 TB)") {
    // audited on the orders-based export: o_orderdate is micros-precision
    // parquet, where Spark pushes timestamp ranges (the events table's ts
    // is NANOS-typed, which parquet pushdown doesn't cover — at warehouse
    // scale the ingest writes micros, as `Sinks`/`DelIns.Warehouse` do)
    val df = LakeExports.frame(LakeExports.transactions)(spark, sfDir)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the range predicate must be pushed to the scan, not applied
    // post-scan — at scale this is what prunes the batch partitions
    assert(plan.matches(
      "(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(o_orderdate.*"),
      s"o_orderdate lower bound not pushed:\n$plan")
    assert(df.count() > 0)
  }

  test("daily-agg exports aggregate with exact decimal sums") {
    val df = LakeExports.tokenBalances(spark, sfDir)
    assert(df.columns.length == 16)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // total_value_locked = lp + offer + contract, row by row
    rows.foreach { r =>
      val lp = Option(r.getAs[java.lang.Double]("liquidity_pool_balance"))
      val of = Option(r.getAs[java.lang.Double]("offer_balance"))
      val cb = Option(r.getAs[java.lang.Double]("contract_balance"))
      val tvl = Option(r.getAs[java.lang.Double]("total_value_locked"))
      if (lp.isDefined && of.isDefined && cb.isDefined)
        assert(tvl.contains(lp.get + of.get + cb.get))
      else assert(tvl.isEmpty)
    }
  }

  test("all 14 exports return rows on the smoke slice") {
    LakeExports.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).limit(1).count() == 1, s"$name empty")
    }
  }
}
