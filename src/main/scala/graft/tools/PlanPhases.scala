package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Break one query's wall time into plan-building, analysis/optimization/
  * physical-planning (QueryPlanningTracker phases + slowest rules) and
  * execution — pinpoints queries whose cost is the DRIVER planning a huge
  * expression tree rather than the cluster running it. */
object PlanPhases {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("p1_effects_flatten_wide").split(",").toSeq
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
        val df = SparkEntry.queries(name)(spark, sfDir)
        val build = (System.nanoTime() - t0) / 1e9
        val qe = df.queryExecution
        val t1 = System.nanoTime()
        qe.executedPlan // forces analysis + optimization + physical planning
        val plan = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val n = qe.toRdd.count()
        val exec = (System.nanoTime() - t2) / 1e9
        println(f"[phases] pass$pass $name%-28s build=$build%6.2f plan=$plan%6.2f exec=$exec%6.2f rows=$n")
        qe.tracker.phases.toSeq.sortBy(_._1).foreach { case (ph, s) =>
          println(f"[phases]   phase $ph%-18s ${(s.endTimeMs - s.startTimeMs) / 1000.0}%7.3f s")
        }
        qe.tracker.rules.toSeq.sortBy(-_._2.totalTimeNs).take(10).foreach {
          case (r, m) =>
            println(f"[phases]   rule ${m.totalTimeNs / 1e9}%8.3f s calls=${m.numInvocations}%-5d eff=${m.numEffectiveInvocations}%-4d $r")
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
