package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

object DevAqeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "graft-dev-aqeprobe")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val counts = graft.ops.Drift.ksCountsFrame(
      li.select(col("l_extendedprice")), li.select(col("l_extendedprice")),
      Seq("l_extendedprice"))
    val df = graft.ops.Drift.ksFromCounts(counts, buckets = 32, roundTo = None)
    val root = df.queryExecution.executedPlan
    println(s"[aqeprobe] root=${root.getClass.getSimpleName}")
    val direct = root.collect { case w: WindowExec => w }
    println(s"[aqeprobe] direct WindowExec collect: ${direct.size}")
    val unwrapped = root match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val via = unwrapped.collect { case w: WindowExec => w }
    println(s"[aqeprobe] unwrapped WindowExec collect: ${via.size}")
    spark.stop()
  }
}
