package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV distinct-count sketch (graft_kmv_kth, a TypedImperativeAggregate
  * with O(k) bounded state).
  */
class KmvSketchSpec extends SparkSpec {

  import spark.implicits._

  private val k = 32

  test("sketch equals the relational window formulation (incl. merge path)") {
    // 20 partitions force partial buffers + merge() + serialize round-trips
    val vals = (1L to 5000L).map(i => (s"g${i % 3}", i % 997))
    val df = vals.toDF("g", "v").repartition(20)
      .select(col("g"), md5(col("v").cast("string")).as("h"))

    val sketch = df.groupBy("g")
      .agg(call_function("graft_kmv_kth", col("h"), lit(k)).as("sk"))
      .select(col("g"), col("sk.n").as("n"), col("sk.kth").as("kth"))

    val w = Window.partitionBy("g").orderBy("hv")
    val window = df.select(col("g"), col("h").as("hv")).distinct()
      .withColumn("rn", row_number().over(w))
      .groupBy("g")
      .agg(least(count(lit(1)), lit(k)).cast("int").as("n"),
        max(when(col("rn") === k, col("hv"))).as("kth"))

    assert(sketch.except(window).isEmpty && window.except(sketch).isEmpty)
  }

  test("below k distinct values the sketch is the exact count, kth is null") {
    val df = Seq.tabulate(200)(i => ("only", i % 7)).toDF("g", "v")
      .select(col("g"), md5(col("v").cast("string")).as("h"))
    val row = df.groupBy("g")
      .agg(call_function("graft_kmv_kth", col("h"), lit(k)).as("sk"))
      .select(col("sk.n"), col("sk.kth")).head
    assert(row.getInt(0) == 7 && row.isNullAt(1))
  }

  test("estimate lands within 20% of the true distinct count at n >> k") {
    val n = 20000
    val df = (1 to n).map(i => i.toString).toDF("v")
      .select(md5(col("v")).as("h"))
    val kth = df.agg(call_function("graft_kmv_kth", col("h"), lit(k)).as("sk"))
      .select(col("sk.kth")).head.getString(0)
    val v = java.lang.Long.parseLong(kth.take(13), 16).toDouble
    val est = (k - 1).toDouble * math.pow(2, 52) / v
    assert(math.abs(est - n) / n < 0.2, s"estimate $est vs true $n")
  }

  test("mins sketch is mergeable: merged per-part sketches == direct sketch") {
    // split one keyspace across 4 disjoint "days", sketch each, merge by
    // union+sort+slice — must equal the sketch of the whole
    val df = (1L to 8000L).map(i => (i % 4, s"v$i")).toDF("part", "v")
      .select(col("part"), md5(col("v")).as("h")).repartition(16)
    val perPart = df.groupBy("part")
      .agg(call_function("graft_kmv_mins", col("h"), lit(k)).as("mins"))
    val merged = perPart
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("mins"))))),
        1, k).as("u"))
      .head.getSeq[String](0)
    val direct = df
      .agg(call_function("graft_kmv_mins", col("h"), lit(k)).as("mins"))
      .head.getSeq[String](0)
    assert(merged == direct)
    assert(direct.length == k && direct == direct.sorted)
  }

  test("mins sketch below k retains every distinct hash exactly") {
    val df = Seq.tabulate(500)(i => i % 9).toDF("v")
      .select(md5(col("v").cast("string")).as("h")).repartition(8)
    val mins = df.agg(call_function("graft_kmv_mins", col("h"), lit(k)).as("m"))
      .head.getSeq[String](0)
    assert(mins.length == 9 && mins == mins.sorted)
  }

  test("duplicates never inflate the sketch") {
    val df = Seq.fill(1000)("same").toDF("v")
      .select(md5(col("v")).as("h")).repartition(10)
    val nd = df.agg(call_function("graft_kmv_kth", col("h"), lit(k)).as("sk"))
      .select(col("sk.n")).head.getInt(0)
    assert(nd == 1)
  }
}
