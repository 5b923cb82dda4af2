package graft.typed

import graft.SparkSpec
import graft.operators.CurrentState
import graft.streaming.MicroBatchIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TypedOpsSpec extends SparkSpec {

  import spark.implicits._

  test("typed latestByUser == untyped W1 window dedup") {
    val ds = TypedOps.events(spark, sfDir)
    val typed = TypedOps.latestByUser(ds)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val windowed = CurrentState
      .latestByKey(ds.toDF(), Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(typed == windowed)
  }

  test("typed userTotals matches the SQL aggregation") {
    val ds = TypedOps.events(spark, sfDir)
    val typed = TypedOps.userTotals(ds)
      .collect().map(a => a.user_id -> a.n).toMap
    val sql = ds.toDF().groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(typed == sql)
  }

  test("mapGroupsWithState accumulates per-user state across triggers") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = MicroBatchIngest.statefulUserTotals(input.toDS())
      .writeStream.format("memory").queryName("user_state").outputMode("update").start()
    try {
      def ev(id: Long, uid: Long, v: Double) =
        Event(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), uid, "purchase", Some(v), "{}")

      input.addData(ev(1, 7, 10.0), ev(2, 7, 5.0), ev(3, 8, 1.0))
      q.processAllAvailable()
      val s1 = spark.table("user_state").as[UserAgg].collect()
        .groupBy(_.user_id).view.mapValues(_.last).toMap
      assert(s1(7L).n == 2 && s1(7L).total == 15.0)
      assert(s1(8L).n == 1)

      input.addData(ev(4, 7, 2.5))
      q.processAllAvailable()
      val s2 = spark.table("user_state").as[UserAgg].collect()
        .filter(_.user_id == 7L).maxBy(_.n)
      assert(s2.n == 3 && s2.total == 17.5, "state must persist across triggers")
    } finally q.stop()
  }
}
