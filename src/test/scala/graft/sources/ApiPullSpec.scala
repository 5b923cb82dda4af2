package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class ApiPullSpec extends SparkSpec {

  private def tmpRoot(): String =
    Files.createTempDirectory("apipull").toString

  test("pull lands the feed at the contract path, stamps lineage per " +
      "record, and a rerun is byte-identical (atomic replace)") {
    val payload =
      """{"id":1,"v":"a"}
        |
        |{"id":2,"v":"b"}
        |{}""".stripMargin
    val meta = Some(ApiPull.BatchMeta("b-1", "2024-01-01T00:00:00", "t0"))
    val root = tmpRoot()
    val out = ApiPull.withLocalEndpoint(payload) { url =>
      val p1 = ApiPull.pullNdjson(url, root, "run_7", "prices", meta)
      assert(p1 == Paths.get(root, "run_7", "prices-exported-entity.txt").toString)
      val first = Files.readAllBytes(Paths.get(p1))
      val p2 = ApiPull.pullNdjson(url, root, "run_7", "prices", meta)
      assert(p2 == p1)
      assert(java.util.Arrays.equals(first, Files.readAllBytes(Paths.get(p2))),
        "retried pull must land byte-identical output")
      p1
    }
    val lines = Files.readAllLines(Paths.get(out))
    // blank line dropped; every record stamped; the empty object gets no
    // leading comma
    assert(lines.size() == 3)
    assert(lines.get(0) ==
      """{"id":1,"v":"a","batch_id":"b-1","batch_run_date":"2024-01-01T00:00:00","batch_insert_ts":"t0"}""")
    assert(lines.get(2) ==
      """{"batch_id":"b-1","batch_run_date":"2024-01-01T00:00:00","batch_insert_ts":"t0"}""")
    // and the landed file round-trips through the S4 FAILFAST load
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("batch_id",
        org.apache.spark.sql.types.StringType)))
    val df = Ndjson.read(spark, schema, out)
    assert(df.count() == 3 &&
      df.filter(df("batch_id") === "b-1").count() == 3)
  }

  test("metadata escaping survives quotes and backslashes; non-object " +
      "lines fail loudly; non-200 fails the batch") {
    val meta = Some(ApiPull.BatchMeta("""b"1\x""", "d", "t"))
    val root = tmpRoot()
    val out = ApiPull.withLocalEndpoint("""{"id":1}""") { url =>
      ApiPull.pullNdjson(url, root, "r", "t1", meta)
    }
    assert(Files.readAllLines(Paths.get(out)).get(0)
      .contains(""""batch_id":"b\"1\\x""""))
    val bad = intercept[IllegalArgumentException] {
      ApiPull.withLocalEndpoint("not-json-at-all") { url =>
        ApiPull.pullNdjson(url, root, "r", "t2", meta)
      }
    }
    assert(bad.getMessage.contains("non-object"))
    // a dead endpoint (connection refused) surfaces as an exception, and
    // no output file appears
    intercept[Exception] {
      ApiPull.pullNdjson("http://127.0.0.1:1/export", root, "r", "t3", None)
    }
    assert(!Files.exists(Paths.get(root, "r", "t3-exported-entity.txt")))
    // without meta the lines pass through verbatim
    val raw = ApiPull.withLocalEndpoint("{\"a\":1}\nplain") { url =>
      ApiPull.pullNdjson(url, root, "r", "t4", None)
    }
    assert(Files.readAllLines(Paths.get(raw)).get(1) == "plain")
  }
}
