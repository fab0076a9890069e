package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Dev-only: sweep every catalog query's physical plan for WindowExec
  * nodes with an EMPTY partition spec (single-task windows) and report
  * the optimizer size estimate of each one's child — the candidates for
  * a "no unpartitioned window over a data-scaled frame" regression
  * gate. Usage: runMain graft.DevWindowSweep <sfDir>
  */
object DevWindowSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(appName = "graft-dev-windowsweep")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, dir).queryExecution
        // the OPTIMIZED LOGICAL plan: AQE's physical root hides children
        // from collect, and logical stats are what a size gate needs
        val hits = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty =>
            s"childBytes=${w.child.stats.sizeInBytes} " +
              s"funcs=${w.windowExpressions.map(_.sql).mkString(",").take(90)}"
        }
        if (hits.nonEmpty)
          println(s"[windowsweep] $name -> ${hits.mkString(" | ")}")
      } catch {
        case e: Throwable =>
          println(s"[windowsweep] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
