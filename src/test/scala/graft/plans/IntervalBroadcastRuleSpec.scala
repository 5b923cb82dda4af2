package graft.plans

import graft.SparkSpec
import graft.core.GraftSession
import org.apache.spark.sql.functions._

class IntervalBroadcastRuleSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def facts = (1 to 500).map(i =>
    (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"))).toDF("id", "t")

  private def intervals = Seq(
    (1.0, ts("2024-01-01 00:00:00"), ts("2024-01-01 12:00:00")),
    (2.0, ts("2024-01-01 12:00:00"), ts("2025-01-01 00:00:00")))
    .toDF("price", "valid_from", "valid_to")

  private def rangeJoin() = {
    val f = facts
    val iv = intervals
    f.join(iv, f("t") >= iv("valid_from") && f("t") < iv("valid_to"), "inner")
  }

  test("keyless range join against an interval table gets broadcast, not cartesian") {
    GraftSession.tune(spark)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable size-based auto-broadcast so only the rule can save the plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = rangeJoin()
      out.collect()
      val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("BroadcastNestedLoopJoin"), s"rule must hint broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"must not cartesian:\n$plan")
      assert(out.count() == 500, "every fact falls in exactly one interval")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a large interval side is NOT force-broadcast (size guard)") {
    GraftSession.tune(spark)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // ~200M rows of (double, ts, ts): stats far above the rule's cap — a
      // forced broadcast here would OOM a real driver.
      val big = spark.range(200L * 1000 * 1000).select(
        col("id").cast("double").as("price"),
        lit(ts("2024-01-01 00:00:00")).as("valid_from"),
        lit(ts("2025-01-01 00:00:00")).as("valid_to"))
      val f = facts
      val out = f.join(big,
        f("t") >= big("valid_from") && f("t") < big("valid_to"), "inner")
      val j = out.queryExecution.optimizedPlan.collectFirst {
        case jn: org.apache.spark.sql.catalyst.plans.logical.Join => jn
      }.get
      assert(j.hint.rightHint.isEmpty,
        s"oversized interval side must not be hinted:\n${out.queryExecution.optimizedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("equi joins are left alone") {
    GraftSession.tune(spark)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val iv = intervals.withColumn("k", lit(1L))
      val f = facts.withColumn("k", col("id") % 2)
      val out = f.join(iv, f("k") === iv("k") && f("t") >= iv("valid_from"), "inner")
      out.collect()
      val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"equi+range join must keep its equi join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
