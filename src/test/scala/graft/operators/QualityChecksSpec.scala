package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dbt-test analog: violation counting on a dirty fixture, and the
  * one-scan fusion property that makes a battery affordable at 100 TB. */
class QualityChecksSpec extends SparkSpec {
  import QualityChecks._

  test("battery counts each violation kind on a dirty fixture") {
    import spark.implicits._
    val dirty = Seq(
      (Some(1L), Some("ok"), 5.0),
      (Some(1L), Some("ok"), -2.0),   // dup key + negative
      (Some(2L), None, 1.0),          // null type
      (None, Some("bogus"), 3.0))     // null key + bad value
      .toDF("id", "typ", "v")
    val res = battery(dirty, "dirty",
      Seq(notNull("id"), notNull("typ"),
        acceptedValues("typ", Seq("ok")), nonNegative("v")),
      Seq(unique(Seq("id")), minRows(10)))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(res("not_null_id") == ((1L, false)))
    assert(res("not_null_typ") == ((1L, false)))
    assert(res("accepted_values_typ") == ((1L, false)))
    assert(res("non_negative_v") == ((1L, false)))
    // 4 rows, 2 distinct non-null ids (countDistinct ignores the null
    // row — its nullness is the not_null check's finding, not this one's)
    // -> surplus = 4 - 2 = 2
    assert(res("unique_id") == ((2L, false)))
    assert(res("min_rows_10") == ((1L, false)))
  }

  test("a clean battery passes everything") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val res = battery(ev, "events",
      Seq(notNull("ts"), nonNegative("value")),
      Seq(unique(Seq("event_id")), minRows(1),
        recency("ts", "2024-02-01 00:00:00", 48)))
    assert(res.filter(!col("passed")).count() == 0)
  }

  test("relationship counts orphaned child keys, broadcast anti join") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, Some(1L)), (11L, Some(2L)), (12L, Some(9L)),
      (13L, None: Option[Long])).toDF("id", "fk")
    val r = relationship(child, "fk", parent, "pk", "child", "parent")
    val row = r.head()
    assert(row.getString(1) == "rel_fk_parent")
    assert(row.getLong(2) == 1L && !row.getBoolean(3)) // only fk=9; null fk exempt
    val clean = relationship(child.filter(col("fk") =!= 9L), "fk",
      parent, "pk", "child", "parent").head()
    assert(clean.getLong(2) == 0L && clean.getBoolean(3))
    // the parent side must broadcast: the check's cost is one child scan
    val p = r.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"parent key set must broadcast into an anti join:\n$p")
  }

  test("the whole battery fuses into a single scan of the table") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val res = battery(ev, "events",
      Seq(notNull("ts"), notNull("event_type"), nonNegative("value")),
      Seq(unique(Seq("event_id")), minRows(1)))
    val scans = res.queryExecution.executedPlan.toString()
      .split("\n").count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 scan, got $scans")
  }
}
