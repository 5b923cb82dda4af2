package graft.core

import java.time.{Duration, Instant, LocalDateTime, ZoneOffset}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch identity + window planning.
  *
  * Mirrors the semantics of the reference's batch macros
  * (reference dags/stellar_etl_airflow/macros.py:1-15): a run covering
  * `[data_interval_start, data_interval_end)` is stamped with
  *   batch_id       = runId + "-" + taskAlias
  *   batch_run_date = interval start, shifted back one interval (timezone-naive)
  *   batch_insert_ts = wall-clock insert time (timezone-aware)
  * Every ingested row carries the triple; idempotent del-ins (D1) keys on
  * (batch_run_date, batch_id).
  */
final case class BatchWindow(start: Instant, end: Instant) {
  require(!end.isBefore(start), s"invalid window [$start, $end)")
  def shiftBackOneInterval: BatchWindow = {
    val d = Duration.between(start, end)
    BatchWindow(start.minus(d), end.minus(d))
  }
  /** Half-open chunking for backfills, like the reference's backfill
    * controller (reference dags/stellar_etl_airflow/backfill_controller.py:26-56)
    * which slices an arbitrary range into fixed-size sub-windows.
    */
  def chunks(step: Duration): Seq[BatchWindow] = {
    require(!step.isZero && !step.isNegative, "step must be positive")
    Iterator.iterate(start)(_.plus(step))
      .takeWhile(_.isBefore(end))
      .map(s => BatchWindow(s, Seq(s.plus(step), end).min))
      .toSeq
  }
}

final case class BatchId(runId: String, alias: String) {
  def value: String = s"$runId-$alias"
}

object Batch {
  /** `batch_run_date` is timezone-NAIVE in the reference (DATETIME); we model
    * it as TimestampNTZ by formatting the UTC instant without a zone.
    */
  def naiveRunDate(w: BatchWindow): LocalDateTime =
    LocalDateTime.ofInstant(w.shiftBackOneInterval.start, ZoneOffset.UTC)

  /** Stamp the lineage triple on a batch DataFrame (reference
    * dags/stellar_etl_airflow/build_export_task.py:143-147).
    */
  def stampLineage(df: DataFrame, id: BatchId, w: BatchWindow,
                   insertTs: Instant = Instant.now()): DataFrame =
    df.withColumn("batch_id", lit(id.value))
      .withColumn("batch_run_date",
        lit(naiveRunDate(w).toString).cast("timestamp_ntz"))
      .withColumn("batch_insert_ts", lit(insertTs.toString).cast("timestamp"))
}
