package graft

import graft.core.{Batch, BatchId, BatchWindow}
import graft.operators.{CurrentState, DelIns}
import graft.sources.{Ndjson, SchemaRegistry, Tables}
import java.time.Instant
import org.apache.spark.sql.functions._

/** BASELINE.md check: the reference's per-batch path (export pod + del-ins
  * load) budgets ~700 s per table per 10-minute batch. This spec runs the
  * engine's equivalent end-to-end — NDJSON batch file → FAILFAST
  * schema-enforced read → lineage stamp → idempotent warehouse load →
  * current-state view — on the sf0.1 events table and requires an order of
  * magnitude headroom under that envelope.
  */
class E2EBatchSpec extends SparkSpec {

  private val eventsSchemaJson =
    """[
      |  {"name": "event_id", "type": "INTEGER"},
      |  {"name": "ts", "type": "TIMESTAMP"},
      |  {"name": "user_id", "type": "INTEGER"},
      |  {"name": "event_type", "type": "STRING"},
      |  {"name": "value", "type": "FLOAT"},
      |  {"name": "props", "type": "JSON"}
      |]""".stripMargin

  test("simulated 10-min batch: NDJSON -> del-ins -> current state, well under budget") {
    val root = java.nio.file.Files.createTempDirectory("e2e").toString
    // stage the "export pod" output: one NDJSON batch file from sf0.1
    val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
    ev.coalesce(1).write.json(s"$root/export")
    val batchFile = new java.io.File(s"$root/export").listFiles()
      .filter(_.getName.endsWith(".json")).head.getPath

    val t0 = System.nanoTime()
    val schema = SchemaRegistry.fromJson(eventsSchemaJson)
    val raw = Ndjson.read(spark, schema, batchFile)
    val w = BatchWindow(Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-01T00:10:00Z"))
    val stamped = Batch.stampLineage(raw, BatchId("e2e-run", "events"), w)
      .withColumn("p_day", to_date(col("ts")).cast("string"))
    val wh = new DelIns.Warehouse(spark, s"$root/wh/events", Seq("p_day", "batch_id"))
    wh.loadBatch(stamped)
    val current = CurrentState.latestByKey(wh.read(), Seq("user_id"), Seq("ts", "event_id"))
    val nCurrent = current.count()
    val elapsed = (System.nanoTime() - t0) / 1e9

    info(f"end-to-end batch (read+load+view) on ${ev.count()} rows: $elapsed%.1f s")
    assert(nCurrent == ev.select("user_id").distinct().count())
    assert(wh.read().count() == ev.count())
    assert(elapsed < 120.0,
      f"batch path took $elapsed%.1f s; reference budget is ~700 s and we need 5x+ headroom")

    // retry the same batch: idempotent, still exact
    wh.loadBatch(stamped)
    assert(wh.read().count() == ev.count(), "retry must not duplicate")
  }
}
