package graft

import org.apache.spark.sql.functions._

/** Dev-only: reproduce the two x16-only oracle divergences (r9).
  * Usage: runMain graft.DevX16Repro <x16Dir> */
object DevX16Repro {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local(appName = "graft-x16repro")
    val li = Tables.lineitem(spark, dir)
    val probs = Seq(0.25, 0.5, 0.75)
    // strategy comparison for the a1 median divergence
    val viaHist = graft.ops.Exact.quantilesMultiCentsHistogram(
      li, Seq("l_extendedprice"), probs)("l_extendedprice")
    println(s"[x16] multiCentsHistogram: ${viaHist.quantiles}")
    val viaDist = graft.ops.Exact.quantilesViaCentsHistogramDistributed(
      li, "l_extendedprice", probs)
    println(s"[x16] centsHistogramDistributed: ${viaDist.toList}")
    val viaPct = li.agg(expr("percentile(l_extendedprice, array(0.25D,0.5D,0.75D))").as("q"))
      .head().getSeq[Double](0)
    println(s"[x16] percentile agg: ${viaPct.toList}")
    // d3 row-by-row (exact catalog shape)
    graft.ops.Drift.driftAll(li, li.filter(col("l_orderkey") % 2 === 1).drop("l_tax"))
      .collect()
      .foreach(r => println(s"[x16] d3 ${r.mkString(" | ")}"))
    spark.stop()
  }
}
