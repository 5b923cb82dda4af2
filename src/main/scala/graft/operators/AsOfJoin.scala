package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 interval construction (W3) + as-of / interval joins (J3).
  *
  * The reference builds price validity intervals with
  * `lead(last_updated_ts, 1, '9999-12-31') over (partition by asset order by ts)`
  * and then left-joins facts on the equi key plus
  * `fact.ts >= valid_from AND fact.ts < valid_to`
  * (reference dags/ddls/queries/v_liquidity_pool_trade_volume.sql:31-52,83-91
  * and v_relevant_asset_trades.sql:28-52,80-91).
  *
  * Physical shape: with an equi key Catalyst runs this as a hash/sort-merge
  * join on the key with the range predicate as a residual filter — one
  * shuffle on the key, linear in both inputs, which holds at 100 TB. The
  * keyless leg (the reference's global XLM price) would degenerate to a
  * cartesian range scan, so [[asOfGlobal]] requires the interval side to be
  * broadcast-small — exactly how the reference treats its one-row/day price
  * feed.
  */
object AsOfJoin {

  /** Open-interval sentinel. The reference uses '9999-12-31'
    * (v_liquidity_pool_trade_volume.sql:37-41), which overflows int64
    * NANOSECONDS — any consumer that materializes timestamp[ns] (pyarrow,
    * pandas) silently wraps it. 2200-01-01 is far past any real event and
    * survives every timestamp unit an engine might pick.
    */
  val EndOfTime = "2200-01-01 00:00:00"

  /** Build SCD2 validity intervals from a change log: each row becomes
    * [tsCol, next tsCol) per key; ties are broken by `tieBreak` so the
    * intervals are deterministic even with duplicate timestamps.
    */
  def scd2Intervals(log: DataFrame, keys: Seq[String], tsCol: String,
                    tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val order = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    log.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to",
        coalesce(lead(col(tsCol), 1).over(w), lit(EndOfTime).cast("timestamp")))
  }

  /** Keyed as-of join: for each fact row, the interval (if any) containing
    * factTs. Left-outer, row-preserving when intervals don't overlap.
    */
  def asOf(facts: DataFrame, intervals: DataFrame,
           equi: Seq[(String, String)], factTs: String): DataFrame = {
    val cond = equi.map { case (f, i) => facts(f) === intervals(i) }
      .reduce(_ && _) &&
      facts(factTs) >= intervals("valid_from") &&
      facts(factTs) < intervals("valid_to")
    facts.join(intervals, cond, "left_outer")
  }

  /** Keyless as-of (global scalar series). The interval side MUST be small:
    * we broadcast it explicitly so the plan is a BroadcastNestedLoopJoin over
    * a tiny build side instead of a shuffled cartesian product.
    */
  def asOfGlobal(facts: DataFrame, intervals: DataFrame, factTs: String): DataFrame =
    facts.join(broadcast(intervals),
      facts(factTs) >= intervals("valid_from") && facts(factTs) < intervals("valid_to"),
      "left_outer")

  /** Latest-value-per-key (W4): rank desc = 1. */
  def latest(log: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(c => col(c).desc): _*)
    log.withColumn("__r", rank().over(w)).filter(col("__r") === 1).drop("__r")
  }

  /** Global latest row — the reference's unpartitioned `rank() over (order by
    * ts desc)` (reference dags/ddls/queries/v_liquidity_pool_value.sql:62)
    * would shuffle everything to one partition; orderBy(...).limit(1) is the
    * scale-safe equivalent (per-partition top-1 then a single-row reduce).
    */
  def globalLatest(df: DataFrame, orderCols: Seq[String]): DataFrame =
    df.orderBy(orderCols.map(c => col(c).desc): _*).limit(1)
}
