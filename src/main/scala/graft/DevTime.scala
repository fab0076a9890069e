package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time specific catalog queries. Usage:
  * runMain graft.DevTime <sfDir> <query1> [query2 ...] */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = Sessions.local(appName = "graft-devtime")
    names.foreach { name =>
      // full materialization (Bench.materialize): a .count() here lets
      // Catalyst prune the very work being timed
      System.gc()
      val t0 = System.nanoTime()
      val n = Bench.materialize(SparkEntry.queries(name)(spark, sfDir))
      println(f"[devtime] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
