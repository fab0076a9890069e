package graft

/** Dev-only: isolate a1's component costs (fused quantile job vs wide agg).
  * Usage: runMain graft.DevQuantiles <sfDir> */
object DevQuantiles {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "graft-devq")
    val li = Tables.lineitem(spark, args.head)
    val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devq] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    li.count() // warm page cache + parquet footer
    (1 to 3).foreach { i =>
      time(s"quantilesMulti x$i") {
        graft.ops.Exact.quantilesMultiCentsHistogram(li, numCols, Seq(0.25, 0.5, 0.75))
      }
    }
    (1 to 2).foreach { i =>
      time(s"driverSort-all8 x$i") {
        numCols.map(c => graft.ops.Exact.quantilesViaDriverSort(li, c, Seq(0.25, 0.5, 0.75)))
      }
    }
    (1 to 2).foreach { i =>
      time(s"full-profile x$i") {
        graft.ops.Profile.profile(li).count()
      }
    }
    spark.stop()
  }
}
