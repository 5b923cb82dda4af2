package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "good staff great spark spark spark"),
    (2L, "good staff spark spark spark quality"),
    (3L, "bad noise junk filler padding waste"),
    (4L, "noise junk good waste filler padding"),
    (5L, "great quality staff good spark waste")).toDF("doc_id", "text")

  private def seed(lt: org.apache.spark.sql.Column) =
    (size(split(lt, "spark", -1)) - 1) * 3 >
      size(graft.functions.TextFunctions.tokens(lt))

  test("score() is exactly the integer dot product of the collected " +
      "features and weights — replayed in Scala") {
    val sf = QualityClassifier.featurizeSeeded(docs, "doc_id", "text",
      seed, dims = 16)
    val w = QualityClassifier.trainWeights(sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = sf.drop("seed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = feats.groupBy(_._1).map { case (d, fs) =>
      d -> fs.map { case (_, b, v) => v * w.getOrElse(b, 0L) }.sum
    }
    val got = QualityClassifier
      .score(sf.drop("seed"), QualityClassifier.trainWeights(sf))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (d, m) =>
      assert(got(d) == ((m, m > 0)), s"doc $d: ${got(d)} vs $m")
    }
  }

  test("the seed-rule split is what the fixture plants, and the " +
      "classifier generalizes it: spark-dense docs keep, junk drops") {
    val sf = QualityClassifier.featurizeSeeded(docs, "doc_id", "text",
      seed, dims = 16)
    val seeds = sf.select("doc_id", "seed").distinct()
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(seeds == Map(1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> false))
    val kept = QualityClassifier
      .score(sf.drop("seed"), QualityClassifier.trainWeights(sf))
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    // doc 5 shares the seed docs' vocabulary (great/quality/staff/spark)
    // and none of the junk tokens: the distilled weights must keep it
    // even though the seed rule itself rejected it
    assert(kept.contains(5L), s"generalization doc must keep: $kept")
    assert(!kept.contains(3L) && !kept.contains(4L),
      s"junk docs must drop: $kept")
  }

  test("out-of-vocabulary inference: a doc whose buckets the training " +
      "corpus never populated scores margin 0, never a missing row") {
    val sf = QualityClassifier.featurizeSeeded(docs, "doc_id", "text",
      seed, dims = 16)
    val w = QualityClassifier.trainWeights(sf)
      .filter(col("bucket") < 0) // empty weight table: every bucket unseen
    val out = QualityClassifier
      .score(QualityClassifier.featurize(docs, "doc_id", "text", 16), w)
      .collect().map(r => (r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((0L, false)), s"all-zero margins expected: $out")
    assert(QualityClassifier
      .score(QualityClassifier.featurize(docs, "doc_id", "text", 16), w)
      .count() == 5L, "every doc keeps its row")
  }

  test("frozen-model inference commutes with corpus slicing: scoring " +
      "halves independently and unioning equals whole-corpus scoring") {
    val sf = QualityClassifier.featurizeSeeded(docs, "doc_id", "text",
      seed, dims = 16)
    val w = QualityClassifier.trainWeights(sf)
    val whole = QualityClassifier
      .score(QualityClassifier.featurize(docs, "doc_id", "text", 16), w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val halves = QualityClassifier
      .score(QualityClassifier.featurize(
        docs.filter(col("doc_id") <= 2), "doc_id", "text", 16), w)
      .unionByName(QualityClassifier.score(QualityClassifier.featurize(
        docs.filter(col("doc_id") > 2), "doc_id", "text", 16), w))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(whole == halves)
  }
}
