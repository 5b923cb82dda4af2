package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Run one SparkEntry query and print per-stage wall/task time — pinpoints
  * whether a slow query burns time in tasks or in scheduling/planning gaps.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("t_dedup_jaccard")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), wall,
          si.taskMetrics.executorRunTime, si.taskMetrics.executorCpuTime / 1000000L,
          si.taskMetrics.jvmGCTime, si.numTasks))
      }
    })

    val t0 = System.nanoTime()
    // the FULL-plan action Bench times (a plain count() lets Catalyst
    // drop row-preserving operators — see Bench.runFull)
    val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    val total = (System.nanoTime() - t0) / 1e9
    // listener bus is async; let it drain
    Thread.sleep(2000)
    println(f"[stages] $name rows=$n total=$total%.2f s")
    stages.sortBy(_._1).foreach { case (id, nm, wall, task, cpu, gc, ntasks) =>
      println(f"[stages]   stage=$id%-4d wall=${wall / 1000.0}%7.2f s taskSum=${task / 1000.0}%8.2f s cpuSum=${cpu / 1000.0}%8.2f s gcSum=${gc / 1000.0}%7.2f s tasks=$ntasks%-4d $nm")
    }
    val wallSum = stages.map(_._3).sum / 1000.0
    println(f"[stages] stageWallSum=$wallSum%.2f s (gap to total = planning/scheduling)")
    spark.stop()
  }
}
