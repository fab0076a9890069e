package graft

/** Dev-only: reproduce a FuzzSpec engine failure with a full stack.
  * Usage: runMain graft.DevFuzzRepro <fuzzDir> <query> */
object DevFuzzRepro {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = "4", appName = "graft-fuzzrepro")
    try {
      val df = SparkEntry.queries(args(1))(spark, args(0))
      df.collect().take(5).foreach(println)
      println("[repro] OK rows=" + df.count())
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
