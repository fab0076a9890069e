package graft

import org.apache.spark.sql.functions._

/** Measurement harness for the d3/KS dispatch ceiling: times
  * `ksStatisticMulti` with the driver merge-walk forced ON vs OFF at a
  * given sf directory, so [[graft.ops.Drift.KsDriverMaxBytes]] is a
  * measured crossover, not a guess (the r7 x16 rehearsal showed the
  * driver path's collect+sort tail at ratio 13.8 — the worst §2 row).
  *
  * Usage: runMain graft.DevKsPath <sfDir> [reps]
  */
object DevKsPath {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.local(appName = "graft-dev-kspath")
    val li = Tables.lineitem(spark, dir)
    val before = li
    val after = li.filter(col("l_orderkey") % 2 === 1).drop("l_tax")
    val cols = before.schema.fields
      .filter(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name).filter(after.columns.contains).toSeq
    println(s"[kspath] $dir cols=$cols")
    // warm
    Seq(true, false).foreach { d =>
      graft.ops.Drift.ksStatisticMulti(before, after, cols,
        roundTo = Some(6), driverCollect = Some(d))
    }
    Seq(true, false).foreach { d =>
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val r = graft.ops.Drift.ksStatisticMulti(before, after, cols,
          roundTo = Some(6), driverCollect = Some(d))
        require(r.nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[kspath] driverCollect=$d min=${ts.min}%.3f s runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val bytes = before.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"[kspath] before-side plan-stats bytes=$bytes")
    spark.stop()
  }
}
