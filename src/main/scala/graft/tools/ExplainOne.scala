package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Print the optimized plan of a named gate query — both the full plan
  * (what Verify writes) and the count-collapsed plan (what Bench times):
  * a divergence between the two (e.g. an outer join the optimizer can
  * prove row-preserving and drop under count()) means the bench number
  * is not measuring the operator and the query body needs an action
  * shape the optimizer cannot shortcut.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("t_triangles")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println("=== FULL (Verify) ===")
    println(df.queryExecution.optimizedPlan.toString.take(6000))
    println("=== COUNT (Bench) ===")
    println(df.groupBy().count().queryExecution.optimizedPlan.toString.take(6000))
    spark.stop()
  }
}
