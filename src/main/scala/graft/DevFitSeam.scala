package graft

/** Dev-only: measure the psiEdges driver→histogram dispatch seam. The
  * drift fit collects `rows × cols × 8` bytes below 60% of
  * `spark.driver.maxResultSize` and dispatches to the distributed
  * cents-histogram above it; at x16 the 8-column lineitem collect
  * (614 MB) sits 5% UNDER the default cap (644 MB) while x64 (2.46 GB)
  * is far past it — so the recorded x16→x64 curvature compares a
  * driver-path numerator against a histogram-path denominator. Running
  * the same queries with a small cap forces the histogram path at EVERY
  * scale, giving the seam-free curvature of the path that actually
  * survives 100×.
  * Usage: runMain graft.DevFitSeam <dir> [maxResultSize] [reps] [queries...]
  */
object DevFitSeam {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val mrs = if (args.length > 1) args(1) else "100m"
    val reps = if (args.length > 2) args(2).toInt else 3
    val names = if (args.length > 3) args.drop(3).toSeq
                else Seq("d_psi", "d_drift_extended")
    val spark = Sessions.local(appName = "graft-fitseam",
      extraConf = Map("spark.driver.maxResultSize" -> mrs))
    println(s"[fitseam] dir=$dir maxResultSize=$mrs")
    names.foreach { n =>
      (0 until reps).foreach { r =>
        val t = Bench.timed(SparkEntry.queries(n)(spark, dir))
        println(f"[fitseam] $n rep$r $t%.2f s")
      }
    }
    spark.stop()
  }
}
