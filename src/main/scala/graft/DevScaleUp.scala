package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: the sf1-rehearsal harness. Times the [[ScaleUp.Headline]]
  * set at the base scale factor and at an N× key-offset copy (default
  * 16 — sf0.1 × 16 ≈ sf1.6 rows for lineitem), printing per-query
  * ratios. Usage: runMain graft.DevScaleUp <sfDir> [copies]
  *
  * Method matches [[Bench]]: one untimed base pass compiles every plan
  * (janino/C2), then the timed base and N× passes run fully
  * materialized behind per-query GC barriers. */
object DevScaleUp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val copies = if (args.length > 1) args(1).toInt else 16
    val spark: SparkSession = Sessions.local(appName = "graft-devscaleup")
    // warm: compile the headline plans at base scale
    ScaleUp.Headline.foreach { n =>
      try Bench.materialize(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[scaleup] warm $n: ${e.getMessage}") }
    }
    val base = ScaleUp.timeHeadline(spark, sfDir).toMap
    val dst = ScaleUp.ensure(spark, sfDir, copies)
    val big = ScaleUp.timeHeadline(spark, dst)
    var baseTotal = 0.0
    var bigTotal = 0.0
    big.foreach { case (n, v) =>
      val b = base.getOrElse(n, -1.0)
      baseTotal += b; bigTotal += v
      println(f"[scaleup] $n%-26s base $b%7.2f  x$copies%-3d $v%7.2f  ratio ${v / math.max(b, 1e-9)}%6.2f")
    }
    println(f"[scaleup] TOTAL base $baseTotal%.2f x$copies $bigTotal%.2f ratio ${bigTotal / math.max(baseTotal, 1e-9)}%.2f (linear = $copies)")
    spark.stop()
  }
}
