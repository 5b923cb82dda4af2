package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Proves [[SchemaRegistry]] on the REAL reference schemas — all 30 JSON
  * files under the reference schemas dir parse, the hardest two have the
  * expected shape,
  * and a generated history_operations NDJSON fixture round-trips through
  * the full-width schema into [[HistoryOperations.flattenWide]] with
  * nested-schema pruning intact.
  */
class RealSchemaSpec extends SparkSpec {

  private val schemasDir = "/root/reference/schemas"

  private def leaves(dt: DataType): Int = dt match {
    case s: StructType => s.fields.map(f => leaves(f.dataType)).sum
    case a: ArrayType  => leaves(a.elementType)
    case _             => 1
  }

  test("all 30 reference schema files parse to Spark StructTypes") {
    val files = Files.list(Paths.get(schemasDir)).iterator().asScala
      .filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
    assert(files.size == 30, s"expected 30 schema files, found ${files.size}")
    val parsed = files.map { p =>
      val s = SchemaRegistry.fromJson(Files.readString(p))
      assert(s.fields.nonEmpty, s"$p parsed to an empty struct")
      p.getFileName.toString -> s
    }.toMap
    // every BigQuery type in the corpus is covered; spot-check the set
    assert(parsed("history_ledgers_schema.json")("closed_at").dataType == TimestampType)
    assert(parsed("accounts_schema.json")("batch_run_date").dataType == TimestampNTZType)
  }

  test("history_operations: ~230-leaf details RECORD with nested repeated records") {
    val s = SchemaRegistry.fromJson(
      Files.readString(Paths.get(s"$schemasDir/history_operations_schema.json")))
    val details = s("details").dataType.asInstanceOf[StructType]
    assert(details.fields.length == 121, s"details has ${details.fields.length} fields")
    assert(leaves(details) == 194, s"details leaf count ${leaves(details)}")
    // the recursive claimant predicate nests REPEATED records 4+ deep
    val claimants = details("claimants").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val predicate = claimants("predicate").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(predicate.fieldNames.contains("and") && predicate.fieldNames.contains("not"))
    assert(details("price_r").dataType.isInstanceOf[StructType])
    assert(details("set_flags").dataType == ArrayType(LongType, containsNull = true))
  }

  test("claimable_balances: repeated claimant records under a flat state row") {
    val s = SchemaRegistry.fromJson(
      Files.readString(Paths.get(s"$schemasDir/claimable_balances_schema.json")))
    val claimants = s("claimants").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(claimants.fieldNames.contains("destination"))
    assert(s("last_modified_ledger").dataType == LongType)
  }

  test("history_effects fixture reads through the REAL schema and flattens") {
    val real = SchemaRegistry.fromJson(
      Files.readString(Paths.get(s"$schemasDir/history_effects_schema.json")))
    val details = real("details").dataType.asInstanceOf[StructType]
    assert(details.fields.length == 61, s"details has ${details.fields.length} fields")
    assert(leaves(details) == 135, s"details leaf count ${leaves(details)}")
    val root = Files.createTempDirectory("history_fx").toString
    val events = graft.sources.Tables.load(spark, sfDir, "events").limit(200)
    HistoryEffects.syntheticEffects(events)
      .write.mode("overwrite").json(s"$root/ndjson")
    val fx = spark.read.schema(real).option("mode", "FAILFAST").json(s"$root/ndjson")
    val wide = HistoryEffects.flattenWide(fx)
    assert(wide.columns.length >= 65, s"got ${wide.columns.length} columns")
    val row = wide.filter(col("offer_id").isNotNull)
      .select(col("address"), col("authorized_flag"),
        col("liquidity_pool.fee_bp"), col("seller_muxed_id")).head
    assert(row.getString(0).startsWith("acct_"))
    assert(row.getLong(2) == 30L)
  }

  test("NDJSON fixture reads through the REAL schema and flattens full-width") {
    val real = SchemaRegistry.fromJson(
      Files.readString(Paths.get(s"$schemasDir/history_operations_schema.json")))
    // fixture: synthetic ops (replica schema) serialized to NDJSON, read
    // back through the REAL reference schema — proving the two agree on
    // every populated path and the reader tolerates the full depth
    val root = Files.createTempDirectory("history_ops").toString
    val events = graft.sources.Tables.load(spark, sfDir, "events").limit(200)
    HistoryOperations.syntheticOps(events)
      .write.mode("overwrite").json(s"$root/ndjson")
    val ops = spark.read.schema(real).option("mode", "FAILFAST").json(s"$root/ndjson")
    val wide = HistoryOperations.flattenWide(ops)
    assert(wide.columns.length >= 120, s"got ${wide.columns.length} columns")
    val row = wide.filter(col("offer_id").isNotNull).select(
      col("account"), col("authorize"), col("price_r.n"), col("home_domain")).head
    assert(row.getString(0).startsWith("acct_"))
    assert(row.getString(3).startsWith("dom_"))
    // parquet round-trip: selecting 2 leaves must prune the nested scan
    ops.write.mode("overwrite").parquet(s"$root/parquet")
    val pruned = spark.read.parquet(s"$root/parquet")
      .select(col("details.amount"), col("details.account"))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<details:struct<account:string,amount:double>>"),
      s"nested schema pruning must reach the parquet scan:\n$scan")
  }
}
