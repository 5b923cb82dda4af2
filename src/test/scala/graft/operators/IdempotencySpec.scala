package graft.operators

import graft.SparkSpec
import graft.core.{Batch, BatchId, BatchWindow}
import graft.sources.Tables
import java.time.Instant
import org.apache.spark.sql.functions._

/** The engine's core invariant (SURVEY §7 step 2): del-ins loads are
  * retry-safe — loading the same batch twice yields an identical table.
  */
class IdempotencySpec extends SparkSpec {

  test("delIns: re-delivering a batch leaves the table unchanged") {
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("batch_key", to_date(col("ts")).cast("string"))
    val batch = ev.filter(col("batch_key") === "2024-01-15")
    assert(batch.count() > 0, "fixture day must exist")

    val cols = ev.columns.map(col).toSeq
    val once = DelIns.delIns(ev, batch, Seq("batch_key")).select(cols: _*)
    val twice = DelIns.delIns(once, batch, Seq("batch_key")).select(cols: _*)
    assert(once.count() === ev.count())
    assert(twice.exceptAll(ev).isEmpty && ev.exceptAll(twice).isEmpty)
  }

  test("warehouse: partition-overwrite reload produces no duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val wh = new DelIns.Warehouse(spark, s"$dir/events", Seq("p_day"))
    val w = BatchWindow(Instant.parse("2024-01-15T00:00:00Z"), Instant.parse("2024-01-15T00:10:00Z"))
    val batch = Batch.stampLineage(
      Tables.load(spark, sfDir, "events").filter(to_date(col("ts")) === "2024-01-15"),
      BatchId("run1", "events"), w)
      .withColumn("p_day", to_date(col("ts")).cast("string"))

    wh.loadBatch(batch)
    val n1 = wh.read().count()
    wh.loadBatch(batch) // retry of the same batch
    assert(wh.read().count() === n1, "retry must overwrite, not append")
  }

  test("warehouse: partition expiry drops old partitions only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh2").toString
    val wh = new DelIns.Warehouse(spark, s"$dir/events", Seq("p_day"))
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("p_day", to_date(col("ts")).cast("string"))
    wh.loadBatch(ev.filter(col("p_day") < "2024-01-05"))
    wh.loadBatch(ev.filter(col("p_day") >= "2024-01-05"))
    val dropped = wh.expirePartitions("2024-01-05", "p_day")
    assert(dropped.nonEmpty)
    val left = wh.read()
    assert(left.filter(col("p_day") < "2024-01-05").count() === 0)
    assert(left.count() === ev.filter(col("p_day") >= "2024-01-05").count())
  }

  test("warehouse: archival moves expired partitions cold, idempotently, restorably") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh3").toString
    val wh = new DelIns.Warehouse(spark, s"$dir/events", Seq("p_day"))
    val cold = s"$dir/archive"
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("p_day", to_date(col("ts")).cast("string"))
    wh.loadBatch(ev)
    val nTotal = ev.count()
    val nOld = ev.filter(col("p_day") < "2024-01-05").count()
    val moved = wh.archivePartitions("2024-01-05", "p_day", cold)
    assert(moved.nonEmpty)
    // hot tier lost exactly the old rows; cold tier holds exactly them
    assert(wh.read().count() === nTotal - nOld)
    val coldDf = spark.read.option("basePath", cold).parquet(
      moved.map(m => s"$cold/$m"): _*)
    assert(coldDf.count() === nOld)
    // a retried archive of the remaining data is a no-op
    assert(wh.archivePartitions("2024-01-05", "p_day", cold).isEmpty)
    // restore = rename back: union of tiers is the original table
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    moved.foreach { m =>
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$cold/$m"),
        new org.apache.hadoop.fs.Path(s"$dir/events/$m")))
    }
    assert(wh.read().count() === nTotal)
  }
}
