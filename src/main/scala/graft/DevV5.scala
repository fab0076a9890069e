package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev-only: v5_smart_suggest cost anatomy — wall time (min of N) and the
  * exact Spark JOB COUNT of one run, pinning the bench row's floor as a
  * measured job budget (the capped-distinct RDD collect + the stats
  * aggregate) rather than a guess. Usage: runMain graft.DevV5 <sfDir> [reps] */
object DevV5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.local(appName = "graft-devv5")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val li = Tables.lineitem(spark, sfDir)
    li.count() // warm scan
    def run(): Double = {
      val t0 = System.nanoTime()
      Bench.materialize(graft.ops.Privacy.smartSuggest(li))
      (System.nanoTime() - t0) / 1e9
    }
    run() // JIT warm
    Thread.sleep(200)
    val samples = (1 to reps).map { _ =>
      System.gc(); Thread.sleep(100)
      jobs.set(0)
      val s = run()
      println(f"[v5] run $s%.3f s jobs=${jobs.get()}")
      s
    }
    println(f"[v5] min ${samples.min}%.3f s  median ${samples.sorted.apply(reps / 2)}%.3f s")
    spark.stop()
  }
}
