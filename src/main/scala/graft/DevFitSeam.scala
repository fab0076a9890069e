package graft

/** Measure the psiEdges driver→histogram dispatch seam, and EMIT THE
  * ARTIFACT (r14 — the r13 verdict asked for the seam-free numbers to be
  * a committed gate output, not envelope prose).
  *
  * The drift fit collects `rows × cols × 8` bytes below 60% of
  * `spark.driver.maxResultSize` and dispatches to the distributed
  * cents-histogram above it; at x16 the 8-column lineitem collect
  * (614 MB) sits 5% UNDER the default cap (644 MB) while x64 (2.46 GB)
  * is far past it — so a naive x16→x64 curvature compares a driver-path
  * numerator against a histogram-path denominator and reads ~2×
  * pessimistic. Running the same queries with a small cap forces the
  * histogram path at EVERY scale, giving the seam-free curvature of the
  * only path that exists at 100×.
  *
  * Usage: runMain graft.DevFitSeam <baseDir> <x16Dir> <x64Dir> [out.json]
  *        runMain graft.DevFitSeam <dir> [maxResultSize] [reps] [queries...]   (probe mode)
  *
  * Artifact mode runs d_psi + d_drift_extended at all three scales under
  * maxResultSize=100m (min of 3 steady reps after a warm rep) and writes
  * {query: {base, x16, x64, ratio_x16, ratio_x64, curvature}} — curvature
  * = ratio_x64 / ratio_x16, linear = 4.0.
  */
object DevFitSeam {
  private val SeamQueries = Seq("d_psi", "d_drift_extended")

  def main(args: Array[String]): Unit = {
    val artifactMode = args.length >= 3 &&
      new java.io.File(args(1)).isDirectory && new java.io.File(args(2)).isDirectory
    if (artifactMode) artifact(args(0), args(1), args(2),
      if (args.length > 3) Some(args(3)) else None)
    else probe(args)
  }

  private def artifact(base: String, x16: String, x64: String, out: Option[String]): Unit = {
    val spark = Sessions.local(appName = "graft-fitseam",
      extraConf = Map("spark.driver.maxResultSize" -> "100m"))
    def minWall(n: String, dir: String): Double = {
      Bench.timed(SparkEntry.queries(n)(spark, dir)) // warm: codegen + page cache
      (0 until 3).map { _ =>
        Bench.timed(SparkEntry.queries(n)(spark, dir))
      }.min
    }
    val rows = SeamQueries.map { n =>
      val b = minWall(n, base)
      val w16 = minWall(n, x16)
      val w64 = minWall(n, x64)
      val r16 = w16 / b
      val r64 = w64 / b
      println(f"[fitseam] $n base=$b%.2f x16=$w16%.2f x64=$w64%.2f " +
        f"ratio16=$r16%.2f ratio64=$r64%.2f curvature=${r64 / r16}%.2f")
      f""""$n":{"base":$b%.3f,"x16":$w16%.3f,"x64":$w64%.3f,"ratio_x16":$r16%.3f,"ratio_x64":$r64%.3f,"curvature":${r64 / r16}%.3f}"""
    }
    val json = s"""{"metric":"seamfree_curvature","maxResultSize":"100m","method":"forced cents-histogram fit at every scale (min of 3 steady reps after 1 warm); curvature=ratio_x64/ratio_x16, linear=4.0","queries":{${rows.mkString(",")}}}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json))
    spark.stop()
  }

  private def probe(args: Array[String]): Unit = {
    val dir = args.head
    val mrs = if (args.length > 1) args(1) else "100m"
    val reps = if (args.length > 2) args(2).toInt else 3
    val names = if (args.length > 3) args.drop(3).toSeq else SeamQueries
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
