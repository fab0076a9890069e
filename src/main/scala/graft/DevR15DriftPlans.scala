package graft

import org.apache.spark.sql.functions._

/** Dev-only (r15): formatted plans for the drift rows' two dispatch sides
  * (the catalog entry now takes the driver path at bench scale; the
  * at-scale plan path is forced via the spec override). */
object DevR15DriftPlans {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(cpus = "4", appName = "graft-driftplans")
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, sf)
    val before = li.filter(col("l_orderkey") % 2 === 0)
    val after = li.filter(col("l_orderkey") % 2 === 1)
    println("===== d_wasserstein_planpath =====")
    ops.Drift.wasserstein(before, after, "l_extendedprice",
      driverCollect = Some(false)).explain("formatted")
    println("===== d_wasserstein_driverpath =====")
    ops.Drift.wasserstein(before, after, "l_extendedprice").explain("formatted")
    println("===== d_drift_panel_now =====")
    ops.Drift.driftPanel(before, after, "l_extendedprice").explain("formatted")
    spark.stop()
  }
}
