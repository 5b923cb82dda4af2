package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Two passes over the whole suite, counting Janino compilations per
  * query (CodegenMetrics): pass 1 is the cold compile load; any pass-2
  * compilation means the generated-class cache EVICTED that query's
  * classes during pass 1 — which is exactly what Bench's warm-up is
  * supposed to prevent, so pass-2 counts directly explain "warmed but
  * still slow" bench outliers. Prints per-query (compilations,
  * compile-ms, seconds) for both passes and the totals.
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxEntries = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", maxEntries)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.metrics.source.CodegenMetrics
    def nComp = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def msComp = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1e6
    def runFull(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    (1 to 2).foreach { pass =>
      var c0 = nComp
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try runFull(fn(spark, sfDir)) catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        val c1 = nComp
        if (pass == 2 && c1 > c0 || pass == 1)
          println(f"[cg] pass$pass $name%-28s comps=${c1 - c0}%-5d ${dt}%7.2f s")
        c0 = c1
        spark.catalog.clearCache()
      }
      println(f"[cg] pass$pass TOTAL comps=$nComp compileMsTotal=$msComp%.0f")
    }
    spark.stop()
  }
}
