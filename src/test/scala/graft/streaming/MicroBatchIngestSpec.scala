package graft.streaming

import graft.SparkSpec
import graft.sources.SchemaRegistry
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** §2.9: the 10-minute micro-batch ingest as Structured Streaming with
  * Trigger.AvailableNow + del-ins (exactly-once under retry).
  */
class MicroBatchIngestSpec extends SparkSpec {

  private val schemaJson =
    """[
      |  {"name": "sequence", "type": "INTEGER"},
      |  {"name": "closed_at", "type": "TIMESTAMP"}
      |]""".stripMargin

  test("AvailableNow drains NDJSON files into the warehouse with lineage") {
    val root = Files.createTempDirectory("stream").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    Files.writeString(java.nio.file.Paths.get(s"$in/100-200-ledgers.txt"),
      """{"sequence": 100, "closed_at": "2026-01-13T00:05:07Z"}
        |{"sequence": 101, "closed_at": "2026-01-13T00:05:12Z"}""".stripMargin)

    val schema = SchemaRegistry.fromJson(schemaJson)
    MicroBatchIngest.runAvailableNow(spark, schema, s"$in/*.txt",
      s"$root/wh", s"$root/ckpt", "run1", "ledgers")

    val out = spark.read.parquet(s"$root/wh")
    assert(out.count() == 2)
    assert(out.columns.contains("batch_id") && out.columns.contains("batch_run_date"))
    assert(out.filter(col("batch_id") === "run1-ledgers").count() == 2)

    // second drain with no new files adds nothing (checkpointed offsets)
    MicroBatchIngest.runAvailableNow(spark, schema, s"$in/*.txt",
      s"$root/wh", s"$root/ckpt", "run1", "ledgers")
    assert(spark.read.parquet(s"$root/wh").count() == 2)

    // a new file is picked up incrementally
    Files.writeString(java.nio.file.Paths.get(s"$in/200-300-ledgers.txt"),
      """{"sequence": 201, "closed_at": "2026-01-13T00:15:07Z"}""")
    MicroBatchIngest.runAvailableNow(spark, schema, s"$in/*.txt",
      s"$root/wh", s"$root/ckpt", "run1", "ledgers")
    assert(spark.read.parquet(s"$root/wh").count() == 3)
  }

  test("windowed counts aggregate per 10-minute window with watermark") {
    import spark.implicits._
    val ev = Seq(
      ("2024-01-01 00:01:00", "click", 1.0),
      ("2024-01-01 00:02:00", "click", 2.0),
      ("2024-01-01 00:11:00", "click", 3.0))
      .toDF("ts_s", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = MicroBatchIngest.windowedCounts(ev, "ts", "event_type")
    val rows = out.select(col("window.start").cast("string"), col("n"), col("value_sum"))
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 2)
    assert(rows(0)._2 == 2 && rows(0)._3 == 3.0)
    assert(rows(1)._2 == 1 && rows(1)._3 == 3.0)
  }

  test("streaming dedup drops redelivered ids across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val ev = src.toDF().toDF("event_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = MicroBatchIngest.streamingDedup(ev, "ts", Seq("event_id"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    src.addData((1L, "2024-01-01 00:01:00"), (2L, "2024-01-01 00:02:00"),
      (1L, "2024-01-01 00:01:00")) // in-batch duplicate
    q.processAllAvailable()
    // redelivery in a later micro-batch: state store still holds id 2
    src.addData((2L, "2024-01-01 00:02:30"), (3L, "2024-01-01 00:03:00"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }
}
