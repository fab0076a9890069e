package graft

/** Dev harness: print executed plans for ad-hoc audit (not shipped API). */
object DevPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = "4", appName = "plan-probe")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    args(0).split(",").foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
