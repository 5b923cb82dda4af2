package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** "Current state" deduplication over ledger-entry-change logs (W1/A1/J1).
  *
  * The reference materializes six `v_*_current` views with the identical
  * pattern: `dense_rank() over (partition by <entity key> order by
  * last_modified_ledger desc, ledger_entry_change desc) = 1`, then an inner
  * join to `history_ledgers` on `last_modified_ledger = sequence` to attach
  * `closed_at` (reference dags/ddls/queries/v_accounts_current.sql:30-37 and
  * v_offers_current.sql, v_trust_lines_current.sql, ...).
  *
  * Scale notes: the window shuffles once on the entity key — the same
  * partitioning a downstream merge or key-join reuses, so Catalyst elides the
  * second exchange. The ledgers side of the closed-at join is tiny relative
  * to the change log and is broadcast.
  */
object CurrentState {

  /** Latest row per key. `orderCols` are ranked descending, exactly like the
    * reference's (last_modified_ledger, ledger_entry_change) ordering; pass
    * a unique final column for deterministic ties.
    */
  def latestByKey(log: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(c => col(c).desc): _*)
    log.withColumn("__rnk", dense_rank().over(w))
      .filter(col("__rnk") === 1)
      .drop("__rnk")
  }

  /** Oldest row per key (the reference's in-batch asset dedup, W2:
    * `row_number() over (... order by batch_run_date asc) = 1`,
    * reference dags/queries/history_assets.sql:9-12).
    */
  def firstByKey(log: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Sort-free oldest-per-key: one min_by hash-aggregate instead of the
    * window's shuffle + per-partition sort. Equivalent to [[firstByKey]]
    * whenever the order tuple is unique (both then pick the single
    * minimum; struct comparison and multi-column ASC ordering agree,
    * including nulls-first). This is the scale path: partial aggregation
    * reduces each map partition to ONE candidate row per key before the
    * shuffle, so network volume is bounded by the key cardinality rather
    * than the log size — the window form (even with Spark's
    * WindowGroupLimit partial top-1) still sorts every map partition.
    */
  def firstByKeyAgg(log: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = log.columns.filterNot(keys.contains)
    val first = min_by(struct(payload.map(col): _*), struct(orderCols.map(col): _*))
    val agg = log.groupBy(keys.map(col): _*).agg(first.as("__first"))
    // restore the input column order (getField, not a dotted path string,
    // so payload names containing dots survive)
    agg.select(log.columns.map(c =>
      if (keys.contains(c)) col(c) else col("__first").getField(c).as(c)): _*)
  }

  /** Sort-free LATEST-per-key — [[firstByKeyAgg]]'s max_by twin, equivalent
    * to [[latestByKey]] whenever the order tuple is unique per key. Same
    * scale posture: partial aggregation bounds the shuffle by key
    * cardinality, no per-partition sort.
    */
  def lastByKeyAgg(log: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = log.columns.filterNot(keys.contains)
    val last = max_by(struct(payload.map(col): _*), struct(orderCols.map(col): _*))
    val agg = log.groupBy(keys.map(col): _*).agg(last.as("__last"))
    agg.select(log.columns.map(c =>
      if (keys.contains(c)) col(c) else col("__last").getField(c).as(c)): _*)
  }

  /** Current-state view: window dedup, tombstone filter, then attach the
    * ledger-close timestamp from the spine table (J1). The spine is
    * broadcast when small enough; for a 100 TB change log the spine
    * (one row per ledger) is orders of magnitude smaller than the log.
    */
  def currentView(log: DataFrame, spine: DataFrame,
                  keys: Seq[String], orderCols: Seq[String],
                  logSeqCol: String, spineSeqCol: String,
                  deletedCol: Option[String] = Some("deleted")): DataFrame = {
    val latest = latestByKey(log, keys, orderCols)
    val live = deletedCol.fold(latest)(d => latest.filter(!coalesce(col(d), lit(false))))
    live.join(broadcast(spine), col(logSeqCol) === spine(spineSeqCol), "inner")
  }
}
