package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev-only: v4_synthetic cost anatomy — wall time (min of N) and the
  * exact Spark JOB COUNT of one scoring run, so the bench row's floor can
  * be pinned as "fit + synthesis" rather than guessed.
  * Usage: runMain graft.DevV4 <sfDir> [reps] */
object DevV4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.local(appName = "graft-devv4")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val li = Tables.lineitem(spark, sfDir)
    li.count() // warm scan
    def run(): Double = {
      val t0 = System.nanoTime()
      Bench.materialize(graft.ops.Privacy.syntheticSample(li,
        Seq("l_quantity", "l_extendedprice", "l_returnflag"), seed = 42L))
      (System.nanoTime() - t0) / 1e9
    }
    run() // JIT warm
    Thread.sleep(200)
    val samples = (1 to reps).map { _ =>
      System.gc(); Thread.sleep(100)
      jobs.set(0)
      val s = run()
      println(f"[v4] run $s%.3f s jobs=${jobs.get()}")
      s
    }
    println(f"[v4] min ${samples.min}%.3f s  median ${samples.sorted.apply(reps / 2)}%.3f s")
    // stage split: fit-only (n=0 synthesizes nothing) vs synthesis-only
    val fitOnly = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      Bench.materialize(graft.ops.Privacy.syntheticSample(li,
        Seq("l_quantity", "l_extendedprice", "l_returnflag"), n = 0L, seed = 42L))
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[v4] fit-only min ${fitOnly.min}%.3f s")
    spark.stop()
  }
}
