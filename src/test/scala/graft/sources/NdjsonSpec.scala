package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** S4: schema-enforced NDJSON ingest — the reference's exchange format
  * (batch files [start]-[end]-[table].txt, max_bad_records=0).
  */
class NdjsonSpec extends SparkSpec {

  private val schemaJson =
    """[
      |  {"name": "sequence", "type": "INTEGER"},
      |  {"name": "closed_at", "type": "TIMESTAMP"},
      |  {"name": "batch_run_date", "type": "DATETIME"},
      |  {"name": "deleted", "type": "BOOLEAN"}
      |]""".stripMargin

  private def write(lines: String*): String = {
    val dir = Files.createTempDirectory("ndjson")
    Files.writeString(dir.resolve("100-200-ledgers.txt"), lines.mkString("\n"))
    dir.toString + "/100-200-ledgers.txt"
  }

  test("declared-schema read maps DATETIME to tz-naive, TIMESTAMP to instant") {
    val p = write(
      """{"sequence": 100, "closed_at": "2026-01-13T00:05:07Z", "batch_run_date": "2026-01-12T23:50:00", "deleted": false}""",
      """{"sequence": 101, "closed_at": "2026-01-13T00:05:12Z", "batch_run_date": "2026-01-12T23:50:00", "deleted": null}""")
    val df = Ndjson.read(spark, SchemaRegistry.fromJson(schemaJson), p)
    assert(df.count() == 2)
    assert(df.schema("closed_at").dataType.typeName == "timestamp")
    assert(df.schema("batch_run_date").dataType.typeName == "timestamp_ntz")
    val r = df.orderBy("sequence").collect()(0)
    assert(r.getAs[java.sql.Timestamp]("closed_at").toInstant.toString == "2026-01-13T00:05:07Z")
  }

  test("FAILFAST rejects malformed rows (max_bad_records=0)") {
    val p = write("""{"sequence": "not-a-number on purpose}""")
    val ex = intercept[Exception] {
      Ndjson.read(spark, SchemaRegistry.fromJson(schemaJson), p).collect()
    }
    assert(ex.getMessage != null)
  }

  test("permissive variant captures corrupt rows instead of failing") {
    val p = write(
      """{"sequence": 100, "closed_at": "2026-01-13T00:05:07Z", "batch_run_date": "2026-01-12T23:50:00", "deleted": false}""",
      """{"sequence": bogus}""")
    // caching first is required to query the internal corrupt-record column
    val df = Ndjson.readPermissive(spark, SchemaRegistry.fromJson(schemaJson), p).cache()
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull).count() == 1)
    df.unpersist()
  }
}
