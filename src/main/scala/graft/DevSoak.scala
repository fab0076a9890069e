package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{CorpusStream, DriftStream}

/** Streaming SOAK — the operational axis the per-micro-batch parity
  * specs don't cover (r13 verdict ask 7): run corpus ingestion and the
  * PSI drift monitor TOGETHER for ≥100 seeded micro-batches and verify
  * (a) state stays bounded by the watermark, not the history, and
  * (b) driver memory is stable, i.e. no per-batch leak accumulates.
  *
  * Deterministic: every batch's documents and observations derive from
  * `new scala.util.Random(batch)`; event time advances one minute per
  * batch, so the 10-minute dedup watermark expires fingerprint state
  * ~10 batches behind the head and the 10-minute PSI windows close and
  * emit continuously after the 5-minute watermark.
  *
  * Usage: runMain graft.DevSoak [batches] [out.json] [sink]
  * `sink` = `memory` (default: results queryable, survivors counted) or
  * `noop` (r15, the r14 verdict's ask 6): drains identical
  * micro-batches into Spark's no-op sink so the heap series excludes
  * memory-sink result tables. Measured finding (SOAK_NOOP_r15 /
  * SOAK_NOOP360_r15): the creep is NOT the sink — it persists without
  * it, but a 360-batch run shows it PLATEAUS at ~120 MB from batch
  * ~140 onward, and the controlled experiment in
  * SOAK_NOOP_LOWRETAIN_r15 (same seeds, retained status-history caps
  * shrunk via the conf-override arg) runs dead flat at 79-85 MB:
  * the creep is Spark's retained job/stage/execution history filling
  * to its default caps, not a per-batch leak.
  * Emits one JSON line (and optionally the artifact file) with the
  * state-rows / heap series and pass booleans.
  */
object DevSoak {
  final case class Doc(doc_id: Long, text: String, ingest_ts: Timestamp)
  final case class Obs(ts: Timestamp, v: Double)

  private val words = Seq("the", "a", "of", "and", "to", "in", "is", "on",
    "for", "with", "data", "model", "training", "corpus", "quality",
    "fast", "slow", "small", "large", "clean")
  private val germanish = "der die das und nicht der die das und nicht " +
    "der die das und nicht der die das und"

  private def heapAfterGc(): Long = {
    System.gc(); Thread.sleep(60)
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  private def stateRows(q: StreamingQuery): Long =
    Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(120)
    val out = args.lift(1)
    val sink = args.lift(2).getOrElse("memory")
    require(sink == "memory" || sink == "noop", s"unknown sink '$sink'")
    // optional 4th arg: comma-separated k=v Spark conf overrides, for
    // attribution experiments (e.g. shrinking spark.ui.retained* to
    // prove the plateau is the retained status/progress history)
    val extraConf = args.lift(3).map(_.split(',').map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap).getOrElse(Map.empty[String, String])
    val spark = Sessions.local(cpus = "8", appName = "graft-soak",
      extraConf = extraConf)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    def sunk(df: DataFrame, name: String) = sink match {
      case "memory" =>
        df.writeStream.format("memory").queryName(name).outputMode("append").start()
      case _ =>
        df.writeStream.format("noop").outputMode("append").start()
    }

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime

    // corpus ingestion: quality floor + language filter + watermarked dedup
    val memDocs = MemoryStream[Doc]
    val corpusQ = sunk(CorpusStream.ingest(memDocs.toDF(), watermark = "10 minutes"),
      "soak_corpus")

    // PSI drift monitor over a numeric stream vs a fixed seeded reference
    val reference = spark.range(20000)
      .select((randn(7) * lit(10.0) + lit(50.0)).as("v"))
    val memObs = MemoryStream[Obs]
    val psiQ = sunk(DriftStream.psiMonitor(memObs.toDF(), reference, "v",
      windowDur = "10 minutes", watermark = "5 minutes"), "soak_psi")

    def genDocs(b: Int): Seq[Doc] = {
      val r = new scala.util.Random(b)
      val ts = new Timestamp(t0 + b * 60000L)
      (0 until 300).map { i =>
        val text =
          if (r.nextInt(10) == 0) "short text"                  // fails quality
          else if (r.nextInt(10) == 0) germanish                // fails lang
          else if (r.nextInt(4) == 0)                           // duplicate of a recent text
            Seq.fill(20)(words((b - 1 + i) % words.length)).mkString(" ")
          else {
            // unique-ish but stopword-heavy (passes quality + en)
            val tail = s"tok${b}_$i"
            (Seq.fill(17)(words(r.nextInt(10))) ++ Seq("data", "model", tail)).mkString(" ")
          }
        Doc(b * 100000L + i, text, ts)
      }
    }
    def genObs(b: Int): Seq[Obs] = {
      val r = new scala.util.Random(10000 + b)
      val ts = new Timestamp(t0 + b * 60000L)
      // slow mean drift over the soak — the monitor should emit rising PSI
      val mu = 50.0 + 5.0 * b.toDouble / batches
      (0 until 1000).map(_ => Obs(ts, mu + r.nextGaussian() * 10.0))
    }

    val heapSeries = Seq.newBuilder[(Int, Long)]
    val stateSeries = Seq.newBuilder[(Int, Long, Long)]
    (0 until batches).foreach { b =>
      memDocs.addData(genDocs(b))
      memObs.addData(genObs(b))
      corpusQ.processAllAvailable()
      psiQ.processAllAvailable()
      if (b % 10 == 9 || b == batches - 1) {
        val h = heapAfterGc()
        heapSeries += ((b, h))
        stateSeries += ((b, stateRows(corpusQ), stateRows(psiQ)))
        println(f"[soak] batch $b%3d heapMB=${h / 1048576}%5d " +
          s"corpusState=${stateRows(corpusQ)} psiState=${stateRows(psiQ)}")
      }
    }
    corpusQ.processAllAvailable(); psiQ.processAllAvailable()
    // survivor counts only exist under the memory sink; -1 marks "drained"
    val survivors = if (sink == "memory") spark.table("soak_corpus").count() else -1L
    val psiRows = if (sink == "memory") spark.table("soak_psi").count() else -1L
    corpusQ.stop(); psiQ.stop()

    val states = stateSeries.result()
    val heaps = heapSeries.result()
    // bounded: the tail's state never exceeds 1.5× the mid-run maximum
    // (watermark expiry holds) — a history-shaped leak grows linearly
    val mid = states.slice(states.length / 4, 3 * states.length / 4)
    val tail = states.drop(3 * states.length / 4)
    def tot(t: (Int, Long, Long)) = t._2 + t._3
    val stateBounded = tail.map(tot).max <= math.max(mid.map(tot).max, 1L) * 3 / 2
    // memory stable: post-GC heap at the end ≤ 1.5× the early steady point
    val memStable = heaps.last._2 <= heaps(math.min(1, heaps.length - 1))._2 * 3 / 2
    val json =
      s"""{"metric":"stream_soak","sink":"$sink","batches":$batches,""" +
      s""""conf_overrides":"${extraConf.map { case (k, v) => s"$k=$v" }.mkString(",")}","docs_per_batch":300,"obs_per_batch":1000,""" +
      s""""corpus_survivors":$survivors,"psi_windows":$psiRows,""" +
      s""""state_series":[${states.map(s => s"[${s._1},${s._2},${s._3}]").mkString(",")}],""" +
      s""""heap_mb_series":[${heaps.map(h => s"[${h._1},${h._2 / 1048576}]").mkString(",")}],""" +
      s""""state_bounded":$stateBounded,"memory_stable":$memStable,""" +
      s""""method":"seeded MemoryStream micro-batches, event time +1min/batch; corpus ingest (10min dedup watermark) + PSI monitor (10min windows, 5min watermark) concurrently; state=sum numRowsTotal; heap=post-GC"}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json))
    spark.stop()
    if (!stateBounded || !memStable) sys.exit(1)
  }
}
