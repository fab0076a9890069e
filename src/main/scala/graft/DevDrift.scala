package graft

import org.apache.spark.sql.functions._

/** Dev-only: break down d3's fused component costs. Usage: runMain graft.DevDrift <sfDir> */
object DevDrift {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "graft-devdrift")
    val li = Tables.lineitem(spark, args.head)
    val before = li
    val after = li.filter(col("l_orderkey") % 2 === 1).drop("l_tax")
    val afterCols = after.columns.toSet
    val shared = before.schema.fields.filter(f => afterCols.contains(f.name))
    def numericBoth(f: org.apache.spark.sql.types.StructField) =
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
        after.schema(f.name).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    val numCols = shared.filter(numericBoth).map(_.name).toSeq
    val catCols = shared.filterNot(numericBoth).map(_.name).toSeq
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devdrift] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    li.count()
    (1 to 2).foreach { i =>
      time(s"ksMulti x$i") { graft.ops.Drift.ksStatisticMulti(before, after, numCols, roundTo = Some(6)) }
      time(s"ksMulti-driver x$i") { graft.ops.Drift.ksStatisticMulti(before, after, numCols, roundTo = Some(6), driverCollect = Some(true)) }
      time(s"ksMulti-dist x$i") { graft.ops.Drift.ksStatisticMulti(before, after, numCols, roundTo = Some(6), driverCollect = Some(false)) }
      time(s"chi2Multi x$i") { graft.ops.Drift.chi2Multi(before, after, catCols).collect() }
      time(s"driftAll x$i") { graft.ops.Drift.driftAll(before, after).count() }
    }
    spark.stop()
  }
}
