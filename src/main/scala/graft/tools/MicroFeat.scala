package graft.tools

import graft.functions.TextFunctions
import graft.operators.QualityClassifier
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbenchmark of the QualityClassifier featurization pipeline, piece
  * by piece — finds which sub-expression owns the measured ~40 CPU-s per
  * featurize pass over the 5000-doc sf0.1 corpus.
  */
object MicroFeat {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then 3 timed passes
      df.queryExecution.toRdd.count()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[mf] $name%-28s min=${ts.min}%6.2f s  med=${ts.sorted.apply(1)}%6.2f s")
    }
    val base = docs.select(col("doc_id"), lower(col("text")).as("lt"))
      .repartition(col("doc_id"))
    time("repartition-only")(base.select(col("doc_id")))
    time("tokens-explode")(base.select(col("doc_id"),
      explode(TextFunctions.tokens(col("lt"))).as("token")))
    time("seed-expr")(base.select(col("doc_id"),
      QualityClassifier.sparkDensitySeed(col("lt")).as("seed")))
    time("explode+seed")(base.select(col("doc_id"),
      QualityClassifier.sparkDensitySeed(col("lt")).as("seed"),
      explode(TextFunctions.tokens(col("lt"))).as("token")))
    time("agg1(doc,seed,token)")(base.select(col("doc_id"),
      QualityClassifier.sparkDensitySeed(col("lt")).as("seed"),
      explode(TextFunctions.tokens(col("lt"))).as("token"))
      .groupBy("doc_id", "seed", "token").agg(count(lit(1)).as("n")))
    time("full featurizeSeeded")(
      QualityClassifier.featurizeSeeded(docs, "doc_id", "text",
        QualityClassifier.sparkDensitySeed, dims = 64))
    spark.stop()
  }
}
