package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** S5: schema-declared CSV partner loads with truncate-replace. */
class CsvSpec extends SparkSpec {

  private val schema = SchemaRegistry.fromJson(
    """[
      |  {"name": "payment_id", "type": "INTEGER"},
      |  {"name": "amount", "type": "FLOAT"},
      |  {"name": "currency", "type": "STRING"}
      |]""".stripMargin)

  test("header-skipping declared-schema read") {
    val dir = Files.createTempDirectory("csv")
    Files.writeString(dir.resolve("mgi_2024_01_01.csv"),
      "payment_id,amount,currency\n1,10.5,USD\n2,7.25,EUR\n")
    val df = Csv.read(spark, schema, dir.resolve("mgi_2024_01_01.csv").toString)
    assert(df.count() == 2)
    assert(df.schema("payment_id").dataType.typeName == "long")
  }

  test("loadLatest picks the newest partner file and truncate-replaces") {
    val dir = Files.createTempDirectory("csv2")
    val tgt = Files.createTempDirectory("csv2t").toString + "/t"
    Files.writeString(dir.resolve("mgi_a.csv"), "payment_id,amount,currency\n1,1.0,USD\n")
    Thread.sleep(20)
    Files.writeString(dir.resolve("mgi_b.csv"),
      "payment_id,amount,currency\n2,2.0,USD\n3,3.0,EUR\n")
    val n = Csv.loadLatest(spark, schema, dir.toString, "mgi_", tgt)
    assert(n.contains(2L), "newest file has 2 rows; older file replaced, not appended")
    assert(Csv.loadLatest(spark, schema, dir.toString, "absent_", tgt).isEmpty)
  }
}
