package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sinks.VersionedTable

/** Alert routing + run reporting — the ops tail of the QA battery (the
  * reference routes dbt/Elementary failures to Slack every 15 minutes
  * and ships a weekly run report: reference
  * dags/dbt_data_quality_alerts_dag.py:26-37 `monitor --filters
  * statuses:fail,error`, dags/elementary_report_dag.py:30-45
  * `send-report --days-back 7`, both through
  * build_elementary_slack_alert_task.py:11-85).
  *
  * The engine analog is sink-agnostic: [[routeAlerts]] turns a batch of
  * check results into the NEW failures only — deduplicated against a
  * versioned sent-alert ledger exactly the way Elementary's monitor
  * suppresses re-sends — and commits them exactly-once
  * ([[VersionedTable.commitBatch]] txn replay protection, so a retried
  * monitor run cannot double-post). What leaves the engine is a small
  * DataFrame of alert rows (webhook/chat delivery is a one-line sink a
  * deployment wires; this container has zero egress by design).
  * [[runReport]] is the send-report aggregate: per-check run/failure
  * totals over a bounded history window.
  *
  * Scale posture: the ledger is check-count-sized (not event-sized), the
  * dedup is one broadcast-scale anti-join, and the report is one hash
  * aggregate over (runs x checks) rows.
  */
object Alerting {

  val alertSchema: StructType = StructType(Seq(
    StructField("check_key", StringType),
    StructField("violations", LongType),
    StructField("txn", StringType)))

  /** The sent-alert ledger's current rows (empty before the first
    * routing — the bootstrap read). */
  def sentAlerts(spark: SparkSession, stateRoot: String): DataFrame =
    VersionedTable.latestVersion(spark, stateRoot) match {
      case Some(_) => VersionedTable.read(spark, stateRoot, None)
        .select(col("check_key"), col("violations"), col("txn"))
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], alertSchema)
    }

  /** Route one monitor run: keep `statuses:fail,error` rows (the
    * reference's filter), drop every check_key the ledger has already
    * alerted on, commit the remainder under `txnId` (replayed txns
    * no-op), and return the rows routed BY THIS RUN — read back from the
    * committed ledger, so a replay returns the original batch instead of
    * re-routing. `results` columns: check_key, status, violations.
    *
    * Concurrency contract: ONE monitor writer per ledger. The
    * suppression anti-join reads the ledger at entry, so two monitors
    * racing the same ledger could both emit a check that failed in
    * both — exactly the interleaving the reference precludes by
    * serializing monitor runs (`max_active_runs=1`,
    * dbt_data_quality_alerts_dag.py:19). Retries of the SAME run are
    * safe at any overlap (txn replay). A multi-writer deployment
    * shards ledgers per monitor or serializes like the reference.
    */
  def routeAlerts(results: DataFrame, stateRoot: String, txnId: String): DataFrame = {
    val spark = results.sparkSession
    val fresh = results
      .filter(lower(col("status")).isin("fail", "error"))
      .select(col("check_key"), col("violations").cast("long").as("violations"))
      .join(sentAlerts(spark, stateRoot).select("check_key"),
        Seq("check_key"), "left_anti")
      .withColumn("txn", lit(txnId))
    VersionedTable.commitBatch(fresh, stateRoot, overwrite = false, txnId)
    sentAlerts(spark, stateRoot).filter(col("txn") === txnId)
  }

  /** The send-report aggregate over a check-run history
    * (run_id, check_key, status, violations): per check — runs observed,
    * failures, failure rate, the first failing run (empty string when
    * the check never failed — a null would make the report row
    * disappear from naive joins), the LATEST run's status, and the worst
    * violation count. One hash aggregate; max_by gives the latest
    * status without a window over the history.
    *
    * Run ids must order LEXICOGRAPHICALLY in run order (ISO timestamps,
    * zero-padded sequence ids): first/latest are string min/max_by, so
    * an unpadded scheme like run-9/run-10 would misreport both.
    */
  def runReport(history: DataFrame): DataFrame =
    history
      .withColumn("failed",
        lower(col("status")).isin("fail", "error"))
      .groupBy("check_key")
      .agg(
        count(lit(1)).as("n_runs"),
        sum(when(col("failed"), 1L).otherwise(0L)).as("n_failures"),
        (sum(when(col("failed"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double")).as("fail_rate"),
        coalesce(min(when(col("failed"), col("run_id"))), lit(""))
          .as("first_failed_run"),
        max_by(lower(col("status")), col("run_id")).as("last_status"),
        max(col("violations").cast("long")).as("worst_violations"))
}
