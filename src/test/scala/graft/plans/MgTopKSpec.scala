package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters (graft_mg_topk, bounded O(k) state). */
class MgTopKSpec extends SparkSpec {

  import spark.implicits._

  private def summary(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(call_function("graft_mg_topk", col("v"), lit(k)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact when distinct <= k, through partial buffers and merges") {
    // 12 distinct values, skewed counts, 20 partitions force merge paths
    val rows = (1 to 3000).map(i => s"v${i % 12}") ++ (1 to 500).map(_ => "v3")
    val df = rows.toDF("v").repartition(20)
    val got = summary(df, 16)
    val want = rows.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    assert(got == want)
  }

  test("approximate regime honors the n/(k+1) error bound and recall guarantee") {
    // zipf-ish: value i appears 2000/i times, i in 1..200 -> distinct >> k
    val rows = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"z$i"))
    val n = rows.size
    val k = 20
    val df = rows.toDF("v").repartition(16)
    val got = summary(df, k)
    assert(got.size <= k)
    val truth = rows.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val bound = n.toDouble / (k + 1)
    // reported counts are lower bounds within n/(k+1) of the truth
    got.foreach { case (item, cnt) =>
      assert(cnt <= truth(item), s"$item overcounted: $cnt > ${truth(item)}")
      assert(truth(item) - cnt <= bound, s"$item undercounted past the bound")
    }
    // every value with true frequency above n/(k+1) must be present
    truth.filter(_._2 > bound).keys.foreach { hh =>
      assert(got.contains(hh), s"heavy hitter $hh missing")
    }
  }

  test("eval orders by count desc then item asc") {
    val rows = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("c")
    val arr = rows.toDF("v")
      .agg(call_function("graft_mg_topk", col("v"), lit(8)).as("hh"))
      .head.getSeq[Row](0)
    assert(arr.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("a", 5L), ("b", 5L), ("c", 2L)))
  }

  test("update state is bounded by k even under an adversarial distinct stream") {
    // Regression: buf.get on a missing key unboxes null to 0L, so a
    // null-test on the result routed every miss through the increment
    // branch — state grew one entry per distinct value and the decrement
    // step never ran. Drive the raw update step with 10k distinct values
    // and assert the buffer never exceeds k.
    val k = 8
    val buf = new java.util.HashMap[String, Long]()
    (1 to 10000).foreach { i =>
      MgTopK.updateMap(buf, s"d$i", k)
      assert(buf.size <= k, s"state grew past k: ${buf.size}")
    }
    // and the decrement branch actually cancels occurrences: a stream of
    // k+1 distinct singletons leaves room for later inserts again
    buf.clear()
    (1 to k + 1).foreach(i => MgTopK.updateMap(buf, s"s$i", k))
    assert(buf.size < k, "decrement pass should have evicted singletons")
  }

  test("nulls are ignored and never counted") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("v").repartition(4)
    val got = summary(df, 4)
    assert(got == Map("x" -> 2L))
  }
}
