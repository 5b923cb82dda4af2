package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2Intervals builds half-open ranges closed by end-of-time") {
    val log = Seq(
      ("xlm", ts("2024-01-01 00:00:00"), 1.0),
      ("xlm", ts("2024-01-02 00:00:00"), 2.0),
      ("btc", ts("2024-01-01 12:00:00"), 9.0))
      .toDF("asset", "updated", "price")
    val iv = AsOfJoin.scd2Intervals(log, Seq("asset"), "updated")
      .select("asset", "price", "valid_from", "valid_to")
      .as[(String, Double, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(r => (r._1, r._3.getTime))
    assert(iv.length == 3)
    val xlm1 = iv.find(r => r._1 == "xlm" && r._2 == 1.0).get
    assert(xlm1._4 == ts("2024-01-02 00:00:00"), "interval closed by successor")
    val btc = iv.find(_._1 == "btc").get
    assert(btc._4.toString.startsWith("2200-01-01"), "open interval runs to end-of-time")
  }

  test("asOf attaches the prevailing interval, null before first") {
    val log = Seq(("xlm", ts("2024-01-02 00:00:00"), 2.0)).toDF("asset", "updated", "price")
    val iv = AsOfJoin.scd2Intervals(log, Seq("asset"), "updated")
      .select(col("asset").as("p_asset"), col("price"), col("valid_from"), col("valid_to"))
    val facts = Seq(
      (1L, "xlm", ts("2024-01-01 00:00:00")),
      (2L, "xlm", ts("2024-01-03 00:00:00")))
      .toDF("id", "asset", "t")
    val out = AsOfJoin.asOf(facts, iv, Seq("asset" -> "p_asset"), "t")
      .select("id", "price").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty, "fact before first interval gets null")
    assert(out(2L).contains(2.0))
  }

  test("asOfGlobal plans as a broadcast nested-loop join, not a cartesian") {
    val facts = (1 to 100).map(i => (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00")))
      .toDF("id", "t")
    val iv = Seq((1.0, ts("2024-01-01 00:00:00"), ts("2025-01-01 00:00:00")))
      .toDF("price", "valid_from", "valid_to")
    val out = AsOfJoin.asOfGlobal(facts, iv, "t")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected BNLJ in:\n$plan")
    assert(out.count() == 100)
  }

  test("globalLatest avoids a single-partition global window") {
    val log = (1 to 1000).map(i => (i.toLong, ts("2024-01-01 00:00:00"), i.toDouble))
      .toDF("id", "t", "v")
    val latest = AsOfJoin.globalLatest(log, Seq("v"))
    assert(latest.select("id").as[Long].head() == 1000L)
    val plan = latest.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$plan")
  }
}
