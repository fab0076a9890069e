package graft

/** Dev-only: materialize a ~4× copy of an sf directory (key-offset
  * unions, see [[ScaleUp]]) and time headline queries on it — empirical
  * evidence that the catalog's plans scale near-linearly rather than
  * super-linearly. The per-round bench embeds the same pass in its JSON.
  * Usage: runMain graft.DevScaleUp [srcSfDir] [copies] */
object DevScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(appName = "graft-scaleup")
    val dst = ScaleUp.ensure(spark, src, copies)
    // warm at the original scale, then time both scales
    ScaleUp.Headline.foreach(n =>
      try SparkEntry.queries(n)(spark, src).count() catch { case _: Throwable => () })
    Seq(src -> "1x", dst -> s"${copies}x").foreach { case (dir, tag) =>
      val times = ScaleUp.timeHeadline(spark, dir)
      times.foreach { case (n, s) => println(f"[scaleup] $tag $n $s%.2f s") }
      println(f"[scaleup] $tag total=${times.map(_._2).sum}%.2f s over ${times.size} queries")
    }
    spark.stop()
  }
}
