package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Alert routing ledger: fail/error filter, once-only emission across
  * runs, exactly-once txn replay, and the send-report aggregate.
  */
class AlertingSpec extends SparkSpec {

  import spark.implicits._

  private def results(rows: (String, String, Long)*) =
    rows.toDF("check_key", "status", "violations")

  test("routeAlerts: only fail/error route, a re-failing check is " +
      "suppressed on later runs, and a replayed txn cannot double-post") {
    val root = java.nio.file.Files.createTempDirectory("alerts").toString
    // run 1: one fail, one error, one pass, one warn (not routed)
    val r1 = Alerting.routeAlerts(results(
      ("vol_click", "fail", 5L), ("fk_orders", "error", 2L),
      ("vol_view", "pass", 0L), ("rec_ts", "warn", 1L)), root, "run-1")
    assert(r1.select("check_key").as[String].collect().toSet ==
      Set("vol_click", "fk_orders"))
    // run 2: vol_click STILL failing (suppressed), vol_view newly fails
    val r2 = Alerting.routeAlerts(results(
      ("vol_click", "fail", 7L), ("vol_view", "fail", 3L)), root, "run-2")
    assert(r2.select("check_key").as[String].collect().toSet == Set("vol_view"))
    // replay of run 2 (crash-retry): ledger unchanged, the SAME batch
    // comes back instead of a duplicate
    val r2again = Alerting.routeAlerts(results(
      ("vol_click", "fail", 7L), ("vol_view", "fail", 3L)), root, "run-2")
    assert(r2again.collect().toSeq == r2.collect().toSeq)
    val ledger = Alerting.sentAlerts(spark, root)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(ledger == Set(("vol_click", 5L, "run-1"), ("fk_orders", 2L, "run-1"),
      ("vol_view", 3L, "run-2")))
  }

  test("routeAlerts bootstrap: the first run against an empty root " +
      "routes every failure; an all-pass run routes nothing") {
    val root = java.nio.file.Files.createTempDirectory("alerts2").toString
    val r0 = Alerting.routeAlerts(results(("a", "pass", 0L)), root, "r0")
    assert(r0.isEmpty)
    val r1 = Alerting.routeAlerts(results(("a", "fail", 1L)), root, "r1")
    assert(r1.count() == 1)
  }

  test("runReport: totals, dyadic rate, first failing run, latest " +
      "status, worst violations — hand-computed") {
    val hist = Seq(
      ("r1", "volume", "pass", 0L), ("r2", "volume", "fail", 4L),
      ("r3", "volume", "fail", 9L),
      ("r1", "fk", "pass", 0L), ("r2", "fk", "pass", 0L), ("r3", "fk", "pass", 0L))
      .toDF("run_id", "check_key", "status", "violations")
    val rep = Alerting.runReport(hist).collect()
      .map(r => r.getString(0) -> r).toMap
    val vol = rep("volume")
    assert(vol.getLong(1) == 3L && vol.getLong(2) == 2L)
    assert(vol.getDouble(3) == 2.0 / 3.0)
    assert(vol.getString(4) == "r2" && vol.getString(5) == "fail")
    assert(vol.getLong(6) == 9L)
    val fk = rep("fk")
    assert(fk.getLong(2) == 0L && fk.getString(4) == "" &&
      fk.getString(5) == "pass" && fk.getLong(6) == 0L)
  }
}
