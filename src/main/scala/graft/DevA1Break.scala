package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Dev-only: per-JOB wall decomposition of one catalog query (default
  * a1_profile_lineitem) — which driver-sequenced job owns the time.
  * Usage: runMain graft.DevA1Break <sfDir> [query] [reps]
  */
object DevA1Break {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val name = if (args.length > 1) args(1) else "a1_profile_lineitem"
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = Sessions.local(appName = "graft-deva1")
    val starts = mutable.Map[Int, (Long, String)]()
    val lines = mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val stages = e.stageInfos.map(s => s"${s.name.takeWhile(_ != '(')}x${s.numTasks}").mkString("+")
        starts(e.jobId) = (e.time, stages.take(100))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, d) =>
          lines += f"[a1break]   job ${e.jobId}%3d ${(e.time - t0) / 1000.0}%6.3f s  ${d.take(80)}"
        }
    })
    (0 until reps).foreach { r =>
      lines.clear()
      System.gc()
      val t0 = System.nanoTime()
      val n = Bench.materialize(SparkEntry.queries(name)(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener bus drain
      println(f"[a1break] rep $r $name rows=$n wall $wall%.3f s, jobs:")
      lines.foreach(println)
    }
    spark.stop()
  }
}
