package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS); Spark's TimestampType
  * is microseconds, so we read nanos as long and floor-divide to micros —
  * exactly the truncation DuckDB applies when it reads the same file, which
  * keeps oracle comparisons bit-identical.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    name match {
      case "events" => readEvents(spark, path)
      case _        => spark.read.parquet(path)
    }
  }

  private def readEvents(spark: SparkSession, path: String): DataFrame = {
    // Spark can't represent TIMESTAMP(NANOS) natively; read the raw int64
    // and truncate to micros. Config is session-scoped and harmless when
    // the file is already micros.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    val tsType = raw.schema("ts").dataType.typeName
    if (tsType == "long")
      // integer div, not double div: ns values ~1.7e18 exceed double's 2^53
      // exact range, and DuckDB truncates ns->us, so we must too.
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
