package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-hoc data-quality checks — the engine-side analog of the
  * reference's dbt test surface: singular tests every 30 minutes
  * (reference dags/dbt_singular_tests_dag.py:18-37), daily recency tests
  * (reference dags/dbt_recency_tests_dag.py:15-34), and the Elementary
  * monitor + alert feed (reference dags/dbt_data_quality_alerts_dag.py:15-39,
  * build_elementary_slack_alert_task.py:11-85).
  *
  * Scale posture: every check lowers to an AGGREGATE over the audited
  * table — a per-row violation predicate becomes `count(when(pred, 1))`,
  * uniqueness becomes `count(*) - count(distinct keys)`, recency a
  * predicate on `max(ts)` — and [[battery]] fuses ALL checks on a table
  * into ONE scan + one partial-aggregated pass. Auditing a 100 TB table
  * with a dozen checks costs one read, not twelve; results land in the
  * same (table, check, violations, passed) shape Elementary reports.
  */
object QualityChecks {

  /** A check that counts violating ROWS (fused as count(when(pred,1))). */
  final case class RowCheck(name: String, violation: Column)

  /** A check expressed directly as an aggregate violation count. */
  final case class AggCheck(name: String, violations: Column)

  def notNull(c: String): RowCheck =
    RowCheck(s"not_null_$c", col(c).isNull)

  /** dbt accepted_values: non-null values outside the allow-list. */
  def acceptedValues(c: String, vals: Seq[String]): RowCheck =
    RowCheck(s"accepted_values_$c",
      col(c).isNotNull && !col(c).isin(vals: _*))

  def nonNegative(c: String): RowCheck =
    RowCheck(s"non_negative_$c", col(c) < 0)

  /** dbt unique: number of surplus rows beyond one per key. */
  def unique(keys: Seq[String]): AggCheck =
    AggCheck(s"unique_${keys.mkString("_")}",
      (count(lit(1)) - countDistinct(col(keys.head), keys.tail.map(col): _*))
        .cast("long"))

  /** Recency vs an explicit as-of instant (the scheduler's logical time —
    * never wall-clock, so reruns are byte-identical; reference
    * dbt_recency_tests_dag.py runs with Airflow's logical date). */
  def recency(tsCol: String, asOf: String, maxHours: Int): AggCheck =
    AggCheck(s"recency_${tsCol}_${maxHours}h",
      // an EMPTY table (max is NULL) is the most-stale state there is —
      // NULL < cutoff would be NULL and fall through to "passed"
      when(max(col(tsCol)).isNull ||
        max(col(tsCol)) <
          to_timestamp(lit(asOf)) - expr(s"INTERVAL $maxHours HOURS"), 1L)
        .otherwise(0L))

  def minRows(n: Long): AggCheck =
    AggCheck(s"min_rows_$n", when(count(lit(1)) < n, 1L).otherwise(0L))

  /** dbt relationships (FK integrity): child rows whose non-null key has
    * no match in the parent — the one dbt test shape that inherently reads
    * TWO tables, so it can't fuse into [[battery]]'s single scan. Shape:
    * distinct-project the parent's key column (tiny vs the fact table →
    * Catalyst broadcasts it), then a left-anti count on the child. Emits
    * the same (table, check, violations, passed) row as the battery.
    */
  def relationship(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String,
                   childTable: String, parentTable: String): DataFrame = {
    val name = s"rel_${childKey}_$parentTable"
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).cast("long").as("violations"))
      .select(lit(childTable).as("table_name"), lit(name).as("check_name"),
        col("violations"), (col("violations") === 0L).as("passed"))
  }

  /** Run every check on `df` in a single fused aggregate, then unpivot to
    * one result row per check. */
  def battery(df: DataFrame, table: String,
              rowChecks: Seq[RowCheck], aggChecks: Seq[AggCheck]): DataFrame = {
    val aggs =
      rowChecks.map(rc => count(when(rc.violation, 1)).as(rc.name)) ++
        aggChecks.map(ac => ac.violations.as(ac.name))
    require(aggs.nonEmpty, "battery needs at least one check")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = (rowChecks.map(_.name) ++ aggChecks.map(_.name)).map(n =>
      struct(lit(n).as("check_name"), col(n).cast("long").as("violations")))
    one.select(explode(array(pairs: _*)).as("c"))
      .select(lit(table).as("table_name"),
        col("c.check_name").as("check_name"),
        col("c.violations").as("violations"),
        (col("c.violations") === 0).as("passed"))
  }
}
