package graft

import org.apache.spark.sql.functions._

/** Dev-only (r15): reconstructs the PRE-change composed driftPanel plan
  * (the exact union the operator shipped before the fused driver
  * dispatch) so plans/r15 carries an honest before artifact. */
object DevR15PanelBefore {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(cpus = "4", appName = "graft-panelbefore")
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, sf)
    val before = li.filter(col("l_orderkey") % 2 === 0)
    val after = li.filter(col("l_orderkey") % 2 === 1)
    val ks = ops.Drift.ksStatistic(before, after, "l_extendedprice")
      .select(lit("ks").as("metric"), col("ks").cast("double").as("value"))
    val ps = ops.Drift.psi(before, after, "l_extendedprice")
      .select(lit("psi").as("metric"), col("psi").cast("double").as("value"))
    val w1 = ops.Drift.wasserstein(before, after, "l_extendedprice",
      driverCollect = Some(false))
      .select(lit("wasserstein").as("metric"), col("w1").cast("double").as("value"))
    println("===== d_drift_panel_before =====")
    ks.union(ps).union(w1).orderBy(col("metric")).explain("formatted")
    spark.stop()
  }
}
