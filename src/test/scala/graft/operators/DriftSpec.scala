package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {

  import spark.implicits._

  test("identical periods produce zero drift") {
    val binned = Seq(
      ("k", "A", 0L, 50L), ("k", "A", 1L, 50L),
      ("k", "B", 0L, 500L), ("k", "B", 1L, 500L) // same rates, 10x volume
    ).toDF("key", "period", "bin", "cnt")
    val row = Drift.histDrift(binned, "key").head
    assert(row.getLong(1) == 2)          // n_bins
    assert(row.getDouble(2) == 0.0)      // drift_stat
    assert(row.getDouble(3) == 0.0)      // max_delta
  }

  test("a shifted distribution scores higher than a stable one") {
    val stable = (0L to 9L).flatMap(b => Seq(("s", "A", b, 100L), ("s", "B", b, 101L)))
    val shifted = (0L to 9L).flatMap(b =>
      Seq(("m", "A", b, 100L), ("m", "B", b, if (b < 5) 20L else 180L)))
    val out = Drift.histDrift((stable ++ shifted).toDF("key", "period", "bin", "cnt"), "key")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("m") > out("s") * 100, s"shifted ${out("m")} vs stable ${out("s")}")
    assert(out("s") < 0.001)
  }

  test("a bin present only in the current period still contributes") {
    val binned = Seq(
      ("k", "A", 0L, 100L),
      ("k", "B", 0L, 50L), ("k", "B", 1L, 50L)
    ).toDF("key", "period", "bin", "cnt")
    val row = Drift.histDrift(binned, "key").head
    assert(row.getLong(1) == 2)
    // bin 1: pa=0 -> epsilon floor keeps the term finite but large
    assert(row.getDouble(2) > 100)
    assert(row.getDouble(3) == 0.5)
  }
}
