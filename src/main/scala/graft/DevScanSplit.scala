package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: A/B/C measurement of the file-scan split floor.
  *
  * r10 added `spark.sql.files.minPartitionNum = cores` to fix the x16
  * single-split tail (a few-MB compressed corpus reading as ONE split,
  * running the shingle explode single-task). The same floor forces ≥32
  * scan tasks on every tiny sf0.1 fixture (the split containing a row
  * group's midpoint produces all its rows; the other 31 launch, read the
  * footer, and return empty) — suspected in the bench's pack/media-family
  * inflation. This harness times a query set under three session confs,
  * runtime-set (both are per-query-read SQL confs):
  *
  *   A: minPartitionNum = cores (current Sessions.local)
  *   B: defaults (no floor, 128 MB target splits)
  *   C: no floor, maxPartitionBytes = 4 MB (size-scaled splitting:
  *      sub-4 MB fixtures stay 1 task, the 9.8 MB x16 corpus splits ~8×
  *      before openCostInBytes packing)
  *
  * Usage: runMain graft.DevScanSplit <sfDir> [x16Dir]
  * Prints min-of-2 per query per conf after a warm pass per conf
  * (plans differ across confs, so codegen must recompile before timing).
  */
object DevScanSplit {
  private val SmallQueries = Seq(
    "x_pack_bins", "x_pack_sequences", "x_novelty_yield",
    "m_audio_features", "s_top_paths", "v1_sdc_suppress")
  // The x16 single-split tail cases the floor was introduced for.
  private val BigQueries = Seq(
    "x_neardup_auto", "x_doc_novelty", "x_minhash_lsh_auto")

  private def applyConf(spark: SparkSession, mode: String): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    mode match {
      case "A_minPartitionNum" =>
        spark.conf.set("spark.sql.files.minPartitionNum", cpus)
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
      case "B_defaults" =>
        spark.conf.unset("spark.sql.files.minPartitionNum")
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
      case "C_max4mb" =>
        spark.conf.unset("spark.sql.files.minPartitionNum")
        spark.conf.set("spark.sql.files.maxPartitionBytes", 4L * 1024 * 1024)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val x16Dir = args.lift(1)
    val spark = Sessions.local(appName = "graft-devscansplit")
    Tables.names.foreach { t =>
      try Bench.materialize(Tables.load(spark, sfDir, t))
      catch { case _: Throwable => () }
    }
    val sets: Seq[(String, Seq[String])] =
      Seq(sfDir -> SmallQueries) ++ x16Dir.map(_ -> BigQueries)
    for ((dir, qs) <- sets; mode <- Seq("A_minPartitionNum", "B_defaults", "C_max4mb")) {
      applyConf(spark, mode)
      for (q <- qs) {
        val fn = SparkEntry.queries(q)
        try {
          Bench.materialize(fn(spark, dir)) // warm: compile this conf's plan
          val t = math.min(Bench.timed(fn(spark, dir)), Bench.timed(fn(spark, dir)))
          println(f"[scansplit] $mode%-18s ${dir.split('/').last}%-18s $q%-22s $t%7.3f s")
        } catch { case e: Throwable =>
          println(s"[scansplit] $mode $dir $q FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
