package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Run a single SparkEntry query exactly the way Bench does. */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("t_dedup_jaccard").split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    (1 to passes).foreach { pass =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        // the FULL-plan action Bench times (see Bench.runFull — a plain
        // count() lets Catalyst drop row-preserving operators)
        val n = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.toRdd.count()
        println(f"[prof] pass$pass $name%-24s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
