package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Regression gate for TIMESTAMP_NTZ event time.
  *
  * The driver's `events.parquet` carries a timezone-naive `ts` (parquet
  * timestamp[us] without isAdjustedToUTC → TIMESTAMP_NTZ in Spark), and
  * round 3 shipped three streaming gates that only worked on TIMESTAMP
  * because every spec built its own java.sql.Timestamp fixtures. This spec
  * stages an NTZ fixture that mirrors the driver schema exactly and runs
  * ALL SEVEN StreamingGate drains over it, checking the three event-time
  * ones against batch recomputations — so the NTZ path can never ship
  * unexercised again.
  */
class StreamingNtzGateSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_fixture").toString
    // events: 300 rows, 7 users, 5 types; ts strides 89 s with a 2 h jump
    // every 100 events so each user has multiple >30 min session breaks.
    val ev = spark.range(300).select(
      col("id").as("event_id"),
      expr("CAST(timestamp'2025-01-01 00:00:00' " +
        "+ make_interval(0,0,0,0,0,0, id*89 + CAST(id/100 AS INT)*7200) " +
        "AS TIMESTAMP_NTZ)").as("ts"),
      (col("id") % 7).as("user_id"),
      element_at(
        array(lit("click"), lit("view"), lit("purchase"), lit("click"), lit("cart")),
        (col("id") % 5 + 1).cast("int")).as("event_type"),
      when(col("id") % 11 === 0, lit(null).cast("double"))
        .otherwise(col("id") * 1.5).as("value"),
      lit("{}").as("props"))
    ev.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val orders = spark.range(1, 51).select(
      col("id").as("o_orderkey"),
      (col("id") * 10.0 + 0.5).as("o_totalprice"))
    orders.coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  private def events: DataFrame =
    spark.read.parquet(s"$fixtureDir/events.parquet")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("fixture ts really is TIMESTAMP_NTZ (the driver's type)") {
    assert(events.schema("ts").dataType == TimestampNTZType)
  }

  test("st_dedup drains NTZ events and matches the clean batch aggregate") {
    val got = StreamingGate.dedupGate(spark, fixtureDir)
    val want = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"),
        sum(col("event_id")).as("id_sum"))
    assert(sortedRows(got) == sortedRows(want))
  }

  test("st_stream_join drains NTZ events and matches the batch interval join") {
    val got = StreamingGate.streamJoinGate(spark, fixtureDir)
    // output event-time columns keep the source's naive type
    assert(got.schema("p_ts").dataType == TimestampNTZType)
    assert(got.schema("c_ts").dataType == TimestampNTZType)
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    val want = p.join(c,
        col("pu") === col("cu") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1800 SECONDS") &&
          col("c_ts") <= col("p_ts"))
      .select(col("pu").as("user_id"), col("p_id"), col("c_id"), col("p_ts"), col("c_ts"))
    assert(want.count() > 0, "fixture must actually produce attributions")
    assert(sortedRows(got) == sortedRows(want))
  }

  test("st_sessionize drains NTZ events and matches batch gaps-and-islands") {
    val got = StreamingGate.sessionizeGate(spark, fixtureDir)
    assert(got.schema("start_ts").dataType == TimestampNTZType)
    assert(got.schema("end_ts").dataType == TimestampNTZType)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val want = events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull ||
          col("ts").cast("timestamp").cast("long") -
            col("prev").cast("timestamp").cast("long") > 1800, 1).otherwise(0))
      .withColumn("grp", sum(col("brk")).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "grp")
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_ts", "end_ts", "n_events")
    assert(want.count() > events.select("user_id").distinct().count(),
      "fixture must produce multiple sessions per user")
    assert(sortedRows(got) == sortedRows(want))
  }

  test("st_windowed_counts drains NTZ events and matches the batch bucket counts") {
    val got = StreamingGate.windowedCountsGate(spark, fixtureDir)
    assert(got.schema("w_start").dataType == TimestampNTZType)
    val want = events.groupBy(
        (floor(col("ts").cast("timestamp").cast("long") / 600) * 600)
          .cast("timestamp").cast("timestamp_ntz").as("w_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(want.count() > 1, "fixture must span multiple windows")
    assert(sortedRows(got) == sortedRows(want))
  }

  test("the four stateful gates also run end-to-end on the NTZ fixture") {
    assert(StreamingGate.kmvGate(spark, fixtureDir).count() > 0)
    assert(StreamingGate.upsertGate(spark, fixtureDir).count() > 0)
    assert(StreamingGate.heavyHittersGate(spark, fixtureDir).count() > 0)
    assert(StreamingGate.sketchMartGate(spark, fixtureDir).count() > 0)
  }

  test("st_late_audit on driver NTZ data: drained audit equals the batch " +
      "replay of the global-watermark rule") {
    // driver testdata (NTZ ts, Jan 2024 — inside the gate's slice bounds)
    val got = StreamingGate.lateAuditGate(spark, sfDir)
      .orderBy("batch_seq")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
    val b = least(
      when(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"), 0)
        .when(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"), 1)
        .when(col("ts") < lit("2024-01-22 00:00:00").cast("timestamp"), 2)
        .otherwise(3) +
        when(col("event_id") % 7 === 0, 1).otherwise(0), lit(3))
    val st = ev.withColumn("b", b)
    val mx = st.groupBy("b").agg(max(col("ts")).as("mb"))
    val wm = st.select("b").distinct().as("s")
      .join(mx.as("m"), col("m.b") < col("s.b"))
      .groupBy(col("s.b").as("b"))
      .agg((max(col("mb")) - expr("INTERVAL 600 SECONDS")).as("wmv"))
    val want = st.join(wm, Seq("b"), "left")
      .groupBy(col("b").as("batch_seq"))
      .agg(count(lit(1)).as("n_total"),
        coalesce(sum(when(col("wmv").isNotNull && col("ts") < col("wmv"), 1L)),
          lit(0L)).as("n_late"),
        coalesce(sum(when(col("wmv").isNotNull && col("ts") < col("wmv"),
          col("event_id"))), lit(0L)).as("late_id_sum"))
      .orderBy("batch_seq")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
    assert(got.head._3 == 0L, "batch 0 has no watermark yet, nothing is late")
    assert(got.drop(1).forall(_._3 > 0L),
      "every later batch must catch redelivered-late rows")
  }
}
