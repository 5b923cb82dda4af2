package graft.core

import graft.SparkSpec
import graft.operators.DelIns
import graft.sources.Tables
import java.time.{Duration, Instant}
import org.apache.spark.sql.functions._

/** End-to-end backfill: slice a historical range into chunks (the
  * reference's backfill controller), load each chunk idempotently, and land
  * exactly the full range — with a re-run of one chunk changing nothing.
  */
class BackfillSpec extends SparkSpec {

  test("chunked backfill reconstructs the range; chunk retry is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("backfill").toString
    val wh = new DelIns.Warehouse(spark, s"$dir/events", Seq("batch_id"))
    val ev = Tables.load(spark, sfDir, "events")

    val range = BatchWindow(
      Instant.parse("2024-01-10T00:00:00Z"), Instant.parse("2024-01-13T00:00:00Z"))
    val chunks = range.chunks(Duration.ofHours(24))
    assert(chunks.size == 3)

    def loadChunk(w: BatchWindow): Unit = {
      val rows = ev.filter(
        col("ts") >= lit(w.start.toString).cast("timestamp") &&
          col("ts") < lit(w.end.toString).cast("timestamp"))
      val stamped = Batch.stampLineage(rows, BatchId("backfill", w.start.toString), w)
      wh.loadBatch(stamped)
    }

    chunks.foreach(loadChunk)
    val expected = ev.filter(
      col("ts") >= lit(range.start.toString).cast("timestamp") &&
        col("ts") < lit(range.end.toString).cast("timestamp")).count()
    assert(wh.read().count() == expected, "chunks cover the range exactly once")

    loadChunk(chunks(1)) // operator retry
    assert(wh.read().count() == expected, "retried chunk overwrites its own batch")
    assert(wh.read().select("batch_id").distinct().count() == 3)
  }
}
