package graft

/** Dev-only: materialize the scale-up fixture without running the timed
  * headline sweep, so single-query timings (graft.DevTime) can run
  * against it in isolation.
  * Usage: runMain graft.DevFixture <sfDir> <copies> */
object DevFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val copies = if (args.length > 1) args(1).toInt else 16
    val spark = Sessions.local(appName = "graft-devfixture")
    val dst = ScaleUp.ensure(spark, sfDir, copies)
    println(s"[devfixture] ready: $dst")
    spark.stop()
  }
}
