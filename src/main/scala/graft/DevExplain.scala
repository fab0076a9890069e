package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted physical plan of catalog queries.
  * Usage: runMain graft.DevExplain <sfDir> <query1> [query2 ...] */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.local(cpus = "4", appName = "graft-devexplain")
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
