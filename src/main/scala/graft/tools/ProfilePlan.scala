package graft.tools
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
object ProfilePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = Dedup.shingleRows(docs, "doc_id", "text", 3).queryExecution.optimizedPlan.toString
    println("=== OPTIMIZED ===")
    println(plan.take(4000))
  }
}
