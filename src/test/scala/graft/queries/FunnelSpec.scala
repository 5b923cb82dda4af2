package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ordering semantics of the a6_funnel stage joins: a later stage only
  * counts events strictly AFTER the user's previous-stage first event.
  */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stages require strictly-ordered first events per user") {
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // u2: clicked BEFORE ever viewing -> stops at stage 1
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 11:00:00")),
      // u3: view + purchase but never clicked -> stops at stage 1
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 09:00:00")),
      // u4: never viewed -> not even stage 1
      (4L, "purchase", ts("2024-01-01 08:00:00"))
    ).toDF("user_id", "event_type", "ts")

    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("tv")).groupBy("user_id").agg(min("ts").as("tc"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("tc")).groupBy("user_id").agg(min("ts").as("tp"))

    assert(v.select("user_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(c.select("user_id").as[Long].collect().toSet == Set(1L))
    assert(p.select("user_id").as[Long].collect().toSet == Set(1L))
  }
}
