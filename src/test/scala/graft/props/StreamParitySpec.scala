package graft.props

import graft.SparkSpec
import graft.streaming.{CorpusStream, DriftStream, Events, EventsStream}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.util.Random

/** Seeded micro-batch events for the stream parity family. */
case class SPEv(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)
case class SPObs(ts: Timestamp, v: java.lang.Double)
case class SPKObs(ts: Timestamp, k: String)
case class SPDoc(doc_id: Long, text: String, ingest_ts: Timestamp)

/** Differential stream/batch parity — the r10 verdict's top coverage gap:
  * the Structured Streaming twins were pinned only by fixed fixtures,
  * while the batch forms carry the DuckDB oracle gate. Here the BATCH
  * twin is the oracle (no DuckDB needed): seeded random event histories
  * replay through `MemoryStream` in random micro-batch splits with
  * bounded event-time disorder (within the watermark, so nothing is
  * late-dropped and the stream sees exactly the rows the batch twin
  * scans), and every finalized emission is diffed against the
  * oracle-gated batch computation of the same rows.
  *
  * Disorder bounds are chosen per twin so parity is EXACT by the twins'
  * own documented contracts:
  *  - windowed monitors / enrich / tumbling: jitter ≤ watermark/4 — no
  *    drops, every window's content equals its event-time content;
  *  - sessionize: per-user clusters spanning ≤ gap with ≥ 2·gap between
  *    clusters, jitter ≤ gap/4 — a straggler is always within `gap` of
  *    its own open session, so cross-micro-batch merges reproduce the
  *    batch sessions exactly (the documented split-straggler deviation
  *    is unreachable under these bounds);
  *  - funnel: the stream buffers until the watermark ripens events, so
  *    ANY within-watermark disorder must replay to the batch result;
  *  - corpus ingest: doc_id is assigned in ARRIVAL order, making the
  *    stream's first-seen-per-fingerprint equal the batch min(doc_id)
  *    per text.
  */
class StreamParitySpec extends SparkSpec {
  import spark.implicits._

  private val Seeds = Seq(101, 202, 303)
  private val HourMs = 3600000L
  // epoch-hour-aligned base so scala-side hour grouping matches window()
  private val BaseMs = (Timestamp.valueOf("2024-03-01 00:00:00").getTime
    / HourMs) * HourMs
  private def at(offMs: Long): Timestamp = new Timestamp(BaseMs + offMs)

  /** Arrival order: event-time order perturbed by bounded jitter. */
  private def arrival[T](rnd: Random, evs: Seq[T], tsMs: T => Long,
                         jitterMs: Long): Seq[T] =
    evs.zipWithIndex
      .map { case (e, i) =>
        (tsMs(e) + rnd.nextLong(2 * jitterMs + 1) - jitterMs, i, e)
      }
      .sortBy { case (k, i, _) => (k, i) }
      .map(_._3)

  /** Random micro-batch split. */
  private def split[T](rnd: Random, evs: Seq[T], minB: Int, maxB: Int): Seq[Seq[T]] = {
    val out = Seq.newBuilder[Seq[T]]
    var rest = evs
    while (rest.nonEmpty) {
      val k = math.min(rest.length, minB + rnd.nextInt(maxB - minB + 1))
      out += rest.take(k)
      rest = rest.drop(k)
    }
    out.result()
  }

  /** Replay batches through a MemoryStream into a memory sink (append). */
  private def replay[T: Encoder](name: String, batches: Seq[Seq[T]])(
      transform: DataFrame => Dataset[_]): DataFrame = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[T]
    val q = transform(mem.toDF()).writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try batches.foreach { b =>
      if (b.nonEmpty) mem.addData(b: _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  // ---------------------------------------------------------------- psi

  /** Gaussian-ish live values drifting per window; ~10% nulls. */
  private def genObs(rnd: Random, nWindows: Int, perWin: Int): Seq[SPObs] =
    (0 until nWindows).flatMap { w =>
      (0 until perWin).map { _ =>
        val v: java.lang.Double =
          if (rnd.nextDouble() < 0.1) null
          else Double.box(rnd.nextGaussian() * 30.0 + 100.0 + w * 12.0)
        SPObs(at(w * HourMs + rnd.nextInt(HourMs.toInt)), v)
      }
    }

  private def refFrame(rnd: Random, n: Int): DataFrame =
    (0 until n).map { _ =>
      if (rnd.nextDouble() < 0.05) null.asInstanceOf[java.lang.Double]
      else Double.box(rnd.nextGaussian() * 30.0 + 100.0)
    }.toDF("v")

  for (seed <- Seeds)
    test(s"psiMonitor parity vs batch psi under micro-batch replay (seed $seed)") {
      val rnd = new Random(seed)
      val ref = refFrame(rnd, 400)
      val obs = genObs(rnd, nWindows = 4, perWin = 60)
      val maxMs = obs.map(_.ts.getTime - BaseMs).max
      val sents = Seq(
        Seq(SPObs(at(maxMs + 3 * HourMs), Double.box(100.0))),
        Seq(SPObs(at(maxMs + 4 * HourMs), Double.box(100.0))))
      val ordered = arrival[SPObs](rnd, obs, _.ts.getTime, jitterMs = 20 * 60000L)
      val batches = split(rnd, ordered, 20, 60) ++ sents

      val out = replay[SPObs](s"sp_psi_$seed", batches)(
        DriftStream.psiMonitor(_, ref, "v", tsCol = "ts")).collect()
        .map(r => r.getTimestamp(0).getTime -> (r.getLong(2), r.getDouble(3))).toMap

      val byWin = obs.groupBy(o => (o.ts.getTime / HourMs) * HourMs)
      assert(out.keySet == byWin.keySet, "emitted windows != generated windows")
      byWin.foreach { case (w, rows) =>
        val nonNull = rows.filter(_.v != null)
        val (n, psi) = out(w)
        assert(n == nonNull.length, s"window $w n")
        val batchPsi = graft.ops.Drift
          .psi(ref, nonNull.map(o => Double.unbox(o.v)).toDF("v"), "v")
          .head().getDouble(1)
        assert(psi == batchPsi, s"window $w: stream $psi vs batch $batchPsi")
      }
    }

  // ----------------------------------------------------------------- js

  private val Vocab = Seq("alpha", "beta", "gamma", "delta", "echo", "foxtrot")

  private def genKObs(rnd: Random, nWindows: Int, perWin: Int,
                      oovFrac: Double): Seq[SPKObs] =
    (0 until nWindows).flatMap { w =>
      (0 until perWin).map { _ =>
        val k =
          if (rnd.nextDouble() < 0.08) null
          else if (rnd.nextDouble() < oovFrac) s"oov${rnd.nextInt(3)}"
          // per-window skew: rotate which vocab prefix dominates
          else Vocab((rnd.nextInt(Vocab.length) + w * (1 + rnd.nextInt(2))) % Vocab.length)
        SPKObs(at(w * HourMs + rnd.nextInt(HourMs.toInt)), k)
      }
    }

  private def refKFrame(rnd: Random, n: Int): DataFrame =
    (0 until n).map { _ =>
      if (rnd.nextDouble() < 0.06) null
      else Vocab(math.min(Vocab.length - 1, (-math.log(rnd.nextDouble()) * 1.5).toInt))
    }.toDF("k")

  for (seed <- Seeds)
    test(s"jsMonitor parity vs batch jsDivergence, in-vocabulary live (seed $seed)") {
      val rnd = new Random(seed)
      val ref = refKFrame(rnd, 300)
      val obs = genKObs(rnd, nWindows = 4, perWin = 50, oovFrac = 0.0)
      val maxMs = obs.map(_.ts.getTime - BaseMs).max
      val sents = Seq(
        Seq(SPKObs(at(maxMs + 3 * HourMs), "alpha")),
        Seq(SPKObs(at(maxMs + 4 * HourMs), "alpha")))
      val ordered = arrival[SPKObs](rnd, obs, _.ts.getTime, jitterMs = 20 * 60000L)
      val batches = split(rnd, ordered, 20, 50) ++ sents

      val out = replay[SPKObs](s"sp_js_$seed", batches)(
        DriftStream.jsMonitor(_, ref, "k", tsCol = "ts")).collect()
        .map(r => r.getTimestamp(0).getTime -> (r.getLong(2), r.getDouble(3))).toMap

      val byWin = obs.groupBy(o => (o.ts.getTime / HourMs) * HourMs)
      assert(out.keySet == byWin.keySet)
      byWin.foreach { case (w, rows) =>
        val (n, js) = out(w)
        assert(n == rows.length, s"window $w n (nulls bucket as NA, all rows count)")
        // live categories ⊆ reference vocabulary (incl. "NA" — the ref has
        // nulls) → the documented bit-exactness window of the monitor
        val batchJs = graft.ops.Drift
          .jsDivergence(ref, rows.map(_.k).toDF("k"), "k")
          .head().getDouble(1)
        assert(js == batchJs, s"window $w: stream $js vs batch $batchJs")
      }
    }

  for (seed <- Seeds.take(1))
    test(s"jsMonitor out-of-vocabulary live folds into __OTHER__ per the formula (seed $seed)") {
      val rnd = new Random(seed)
      val refVals = (0 until 300).map { _ =>
        if (rnd.nextDouble() < 0.06) null
        else Vocab(math.min(Vocab.length - 1, (-math.log(rnd.nextDouble()) * 1.5).toInt))
      }
      val ref = refVals.toDF("k")
      val obs = genKObs(rnd, nWindows = 3, perWin = 50, oovFrac = 0.25)
      val maxMs = obs.map(_.ts.getTime - BaseMs).max
      val sents = Seq(
        Seq(SPKObs(at(maxMs + 3 * HourMs), "alpha")),
        Seq(SPKObs(at(maxMs + 4 * HourMs), "alpha")))
      val ordered = arrival[SPKObs](rnd, obs, _.ts.getTime, jitterMs = 20 * 60000L)
      val batches = split(rnd, ordered, 20, 50) ++ sents

      val out = replay[SPKObs](s"sp_jsoov_$seed", batches)(
        DriftStream.jsMonitor(_, ref, "k", tsCol = "ts")).collect()
        .map(r => r.getTimestamp(0).getTime -> r.getDouble(3)).toMap

      // spec-side replica of the documented fold: vocab = ref categories
      // (≤ maxCategories), live OOV → __OTHER__ carrying pRef tail = 0
      val refCounts = refVals.map(k => if (k == null) "NA" else k)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val vocab = refCounts.keys.toSeq.sorted
      val refTotal = refCounts.values.sum.toDouble
      val keys = vocab :+ "__OTHER__"
      val pRef = keys.map(k => if (k == "__OTHER__") 0.0 else refCounts(k) / refTotal)
      obs.groupBy(o => (o.ts.getTime / HourMs) * HourMs).foreach { case (w, rows) =>
        val mapped = rows.map(o => if (o.k == null) "NA" else o.k)
          .map(k => if (vocab.contains(k)) k else "__OTHER__")
        val cnt = mapped.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val total = rows.length.toDouble
        val js = keys.indices.foldLeft(0.0) { (acc, i) =>
          val p = pRef(i)
          val c = cnt.getOrElse(keys(i), 0L)
          val q = c / total
          val m = (p + q) / 2.0
          acc + (if (p > 0) p * math.log(p / m) * 0.5 else 0.0) +
            (if (c > 0) q * math.log(q / m) * 0.5 else 0.0)
        }
        val exp = BigDecimal(js).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(out(w) - exp) <= 2e-6, s"window $w: stream ${out(w)} vs spec $exp")
      }
    }

  // ----------------------------------------------------------------- w1

  for (seed <- Seeds)
    test(s"w1Monitor parity vs the quantile-bin formula under replay (seed $seed)") {
      val rnd = new Random(seed)
      val ref = refFrame(rnd, 400)
      val obs = genObs(rnd, nWindows = 4, perWin = 60)
      val maxMs = obs.map(_.ts.getTime - BaseMs).max
      val sents = Seq(
        Seq(SPObs(at(maxMs + 3 * HourMs), Double.box(100.0))),
        Seq(SPObs(at(maxMs + 4 * HourMs), Double.box(100.0))))
      val ordered = arrival[SPObs](rnd, obs, _.ts.getTime, jitterMs = 20 * 60000L)
      val batches = split(rnd, ordered, 20, 60) ++ sents

      val out = replay[SPObs](s"sp_w1_$seed", batches)(
        DriftStream.w1Monitor(_, ref, "v", tsCol = "ts")).collect()
        .map(r => r.getTimestamp(0).getTime -> r.getDouble(3)).toMap

      // edges from the same exact-percentile fit the monitor runs; the
      // cumulative-gap metric itself is replicated driver-side (the batch
      // wasserstein is a different, grid-exact metric — this monitor's
      // contract is the quantile-unit form)
      val probs = (1 until 10).map(_.toDouble / 10)
      val edges = ref.filter(col("v").isNotNull)
        .agg(expr(s"percentile(CAST(v AS DOUBLE), array(${probs.mkString("D,")}D))").as("qs"))
        .head().getSeq[Double](0).distinct.sorted
      def binOf(v: Double): Int = edges.count(v >= _)
      val nBins = edges.size + 1
      val refVals = ref.collect().filter(!_.isNullAt(0)).map(_.getDouble(0)).toSeq
      val refCnt = refVals.groupBy(binOf).view.mapValues(_.size.toLong).toMap
      val refTotal = refVals.size.toDouble
      val cumRef = (0 until nBins).scanLeft(0L)((a, i) => a + refCnt.getOrElse(i, 0L))
        .tail.map(_ / refTotal)
      obs.groupBy(o => (o.ts.getTime / HourMs) * HourMs).foreach { case (w, rows) =>
        val vs = rows.filter(_.v != null).map(o => Double.unbox(o.v))
        val cnt = vs.groupBy(binOf).view.mapValues(_.size.toLong).toMap
        val total = vs.size
        val w1 = (0 until nBins - 1).foldLeft(0.0) { (acc, i) =>
          val cumLive = (0 to i).map(j => cnt.getOrElse(j, 0L)).sum.toDouble / total
          acc + math.abs(cumRef(i) - cumLive)
        }
        val exp = BigDecimal(w1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(out(w) - exp) <= 1e-9, s"window $w: stream ${out(w)} vs spec $exp")
      }
    }

  // ------------------------------------------------------------- events

  private val EvTypes = Seq("view", "click", "purchase", "scroll")

  private def genEvents(rnd: Random, nUsers: Int, perUser: Int,
                        spanMs: Long): Seq[SPEv] = {
    var id = 0L
    (1 to nUsers).flatMap { u =>
      (0 until perUser).map { _ =>
        id += 1
        SPEv(id, at(rnd.nextLong(spanMs)), u.toLong,
          EvTypes(rnd.nextInt(EvTypes.length)),
          rnd.nextInt(10000) / 100.0)
      }
    }
  }

  for (seed <- Seeds)
    test(s"funnelStream parity vs batch funnel + driver replay (seed $seed)") {
      val rnd = new Random(seed)
      val evs = genEvents(rnd, nUsers = 12, perUser = 14, spanMs = 4 * HourMs)
      val maxMs = evs.map(_.ts.getTime - BaseMs).max
      val sents = Seq(
        Seq(SPEv(9001, at(maxMs + 2 * HourMs), 999L, "view", 0.0)),
        Seq(SPEv(9002, at(maxMs + 3 * HourMs), 999L, "view", 0.0)))
      // watermark 30 min → jitter 7 min keeps everything replayable
      val ordered = arrival[SPEv](rnd, evs, _.ts.getTime, jitterMs = 7 * 60000L)
      val batches = split(rnd, ordered, 15, 40) ++ sents

      val got = replay[SPEv](s"sp_funnel_$seed", batches)(
        EventsStream.funnelStream(_)).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(3).getTime)).toSet

      // batch oracle on the identical data (sentinels included both sides)
      val all = evs ++ sents.flatten
      val batchCounts = Events.funnel(all.toDF()).collect()
        .map(r => r.getInt(0) -> r.getLong(2)).toMap
      val steps = Seq("view", "click", "purchase")
      steps.indices.foreach { i =>
        val streamUsers = got.filter(_._2 == i + 1).map(_._1)
        assert(streamUsers.size.toLong == batchCounts(i + 1),
          s"step ${i + 1}: stream ${streamUsers.size} users vs batch ${batchCounts(i + 1)}")
      }
      // driver replay pins the per-user first-reach TIMES, which the
      // batch aggregate can't see
      val expected = all.groupBy(_.user_id).flatMap { case (u, rows) =>
        val q = Array.fill(steps.length)(Long.MaxValue)
        val out = Seq.newBuilder[(Long, Int, Long)]
        rows.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val s = steps.indexOf(e.event_type)
          if (s >= 0) {
            val us = e.ts.getTime
            if ((s == 0 || q(s - 1) < us) && us < q(s)) {
              q(s) = us
              out += ((u, s + 1, us))
            }
          }
        }
        out.result()
      }.toSet
      assert(got == expected, s"stream emissions != driver replay " +
        s"(missing ${expected -- got}, extra ${got -- expected})")
    }

  /** Per-user session clusters: span ≤ gap, separation ≥ 2·gap — the
    * regime where micro-batch sessionization is exactly the batch form. */
  private def genClustered(rnd: Random, nUsers: Int, gapMs: Long): Seq[SPEv] = {
    var id = 0L
    (1 to nUsers).flatMap { u =>
      var start = rnd.nextLong(2 * gapMs)
      (0 until 2 + rnd.nextInt(3)).flatMap { _ =>
        val n = 2 + rnd.nextInt(4)
        var t = start
        val cluster = (0 until n).map { _ =>
          id += 1
          val e = SPEv(id, at(t), u.toLong, EvTypes(rnd.nextInt(3)), 1.0)
          t += rnd.nextLong(gapMs / 5) + 1000L
          e
        }
        start = t + 2 * gapMs + rnd.nextLong(gapMs)
        cluster
      }
    }
  }

  for (seed <- Seeds)
    test(s"sessionizeStream parity vs batch sessionize (seed $seed)") {
      val rnd = new Random(seed)
      val gapMs = 30 * 60000L
      val evs = genClustered(rnd, nUsers = 10, gapMs = gapMs)
      val maxMs = evs.map(_.ts.getTime - BaseMs).max
      val sents = Seq(
        Seq(SPEv(9001, at(maxMs + 10 * gapMs), 999L, "view", 0.0)),
        Seq(SPEv(9002, at(maxMs + 11 * gapMs), 999L, "view", 0.0)))
      val ordered = arrival[SPEv](rnd, evs, _.ts.getTime, jitterMs = gapMs / 4 - 60000L)
      val batches = split(rnd, ordered, 10, 30) ++ sents

      val got = replay[SPEv](s"sp_sess_$seed", batches)(
        EventsStream.sessionizeStream(_)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getTimestamp(3).getTime, r.getTimestamp(4).getTime)).toSet

      // the sentinel user's own session never closes — drop it batch-side
      val expected = Events.sessionize((evs ++ sents.flatten).toDF()).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getTimestamp(3).getTime, r.getTimestamp(4).getTime))
        .filterNot(_._1 == 999L).toSet
      assert(got == expected, s"sessions differ " +
        s"(missing ${expected -- got}, extra ${got -- expected})")
    }

  for (seed <- Seeds)
    test(s"attributionStream parity vs batch attribution (seed $seed)") {
      val rnd = new Random(seed)
      val evs = genEvents(rnd, nUsers = 10, perUser = 12, spanMs = 3 * HourMs)
      val maxMs = evs.map(_.ts.getTime - BaseMs).max
      // sentinel click & purchase > 30 min apart: advance both sides'
      // watermarks without matching each other
      val sents = Seq(
        Seq(SPEv(9001, at(maxMs + 2 * HourMs), 999L, "click", 0.0)),
        Seq(SPEv(9002, at(maxMs + 4 * HourMs), 999L, "purchase", 0.0)))
      val ordered = arrival[SPEv](rnd, evs, _.ts.getTime, jitterMs = 7 * 60000L)
      val batches = split(rnd, ordered, 15, 40) ++ sents

      val got = replay[SPEv](s"sp_attr_$seed", batches)(
        EventsStream.attributionStream(_)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = Events.attribution((evs ++ sents.flatten).toDF()).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"pairs differ " +
        s"(missing ${expected -- got}, extra ${got -- expected})")
    }

  for (seed <- Seeds)
    test(s"enrichStream parity vs the batch join+window aggregate (seed $seed)") {
      val rnd = new Random(seed)
      val segs = Seq("BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD")
      val dim = (1 to 8).map(i => (i.toLong, segs(rnd.nextInt(segs.length))))
        .toDF("c_custkey", "c_mktsegment")
      val evs = genEvents(rnd, nUsers = 12, perUser = 12, spanMs = 4 * HourMs)
      val maxMs = evs.map(_.ts.getTime - BaseMs).max
      // user 999 is NOT in dim: the join drops it but the watermark node
      // upstream of the join still sees it — windows close
      val sents = Seq(
        Seq(SPEv(9001, at(maxMs + 1 * HourMs), 999L, "view", 0.0)),
        Seq(SPEv(9002, at(maxMs + 2 * HourMs), 999L, "view", 0.0)))
      // watermark 10 min → jitter 2 min
      val ordered = arrival[SPEv](rnd, evs, _.ts.getTime, jitterMs = 2 * 60000L)
      val batches = split(rnd, ordered, 15, 40) ++ sents

      val got = replay[SPEv](s"sp_enrich_$seed", batches)(
        EventsStream.enrichStream(_, dim)).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getString(2)) ->
          (r.getLong(3), r.getDouble(4))).toMap
      val expected = evs.toDF()
        .join(dim, col("user_id") === col("c_custkey"))
        .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(graft.ops.Exact.cents(col("value"))).cast("double").as("tc"))
        .collect()
        .map(r => (r.getStruct(0).getTimestamp(0).getTime, r.getString(1), r.getString(2)) ->
          (r.getLong(3), r.getDouble(4))).toMap
      assert(got == expected, s"cells differ " +
        s"(missing ${expected.keySet -- got.keySet}, extra ${got.keySet -- expected.keySet})")
    }

  for (seed <- Seeds)
    test(s"tumblingCounts parity vs the batch window aggregate (seed $seed)") {
      val rnd = new Random(seed)
      val evs = genEvents(rnd, nUsers = 10, perUser = 10, spanMs = 3 * HourMs)
      val maxMs = evs.map(_.ts.getTime - BaseMs).max
      val sents = Seq(
        Seq(SPEv(9001, at(maxMs + 1 * HourMs), 999L, "view", 0.0)),
        Seq(SPEv(9002, at(maxMs + 2 * HourMs), 999L, "view", 0.0)))
      val ordered = arrival[SPEv](rnd, evs, _.ts.getTime, jitterMs = 2 * 60000L)
      val batches = split(rnd, ordered, 15, 40) ++ sents

      // the first sentinel's own window also finalizes (the second
      // sentinel's watermark passes it) — compare real-data windows only
      val got = replay[SPEv](s"sp_tumb_$seed", batches)(
        EventsStream.tumblingCounts(_)).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2))
        .filter(_._1._1 <= BaseMs + maxMs).toMap
      val expected = evs.toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getStruct(0).getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got == expected)
    }

  // ------------------------------------------------------------- corpus

  private val EnStop = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private val Content = Seq("fast", "slow", "small", "large", "blue", "green",
    "river", "stone", "cloud", "flame", "quartz", "maple")
  private val Germanish = Seq("der", "die", "das", "und", "nicht", "ein", "zu")

  /** Random doc: quality and language vary across the filter thresholds. */
  private def genText(rnd: Random): String = rnd.nextInt(4) match {
    case 0 => // short / low quality
      (0 until 2 + rnd.nextInt(4)).map(_ => Content(rnd.nextInt(Content.length)))
        .mkString(" ")
    case 1 => // germanish
      (0 until 15 + rnd.nextInt(10)).map(_ => Germanish(rnd.nextInt(Germanish.length)))
        .mkString(" ")
    case _ => // english, stopword-rich, long enough to pass
      (0 until 18 + rnd.nextInt(14)).map { _ =>
        if (rnd.nextDouble() < 0.75) EnStop(rnd.nextInt(EnStop.length))
        else Content(rnd.nextInt(Content.length))
      }.mkString(" ")
  }

  for (seed <- Seeds)
    test(s"CorpusStream.ingest parity vs batch corpusClean (seed $seed)") {
      val rnd = new Random(seed)
      // 40 unique texts; 20 duplicate re-arrivals within 2 min of their
      // original (inside the 10-min dedup watermark)
      val uniques = (0 until 40).map(i => (genText(rnd), rnd.nextLong(20 * 60000L)))
      val dups = (0 until 20).map { _ =>
        val (txt, ms) = uniques(rnd.nextInt(uniques.length))
        (txt, ms + rnd.nextLong(2 * 60000L))
      }
      // arrival order by jittered ts; doc_id = ARRIVAL index, so the
      // stream's first-seen == batch min(doc_id) per text
      val ordered = arrival[(String, Long)](rnd, uniques ++ dups, _._2, jitterMs = 60000L)
      val docs = ordered.zipWithIndex.map { case ((txt, ms), i) =>
        SPDoc(i + 1L, txt, at(ms))
      }
      val batches = split(rnd, docs, 8, 20)

      val got = replay[SPDoc](s"sp_corpus_$seed", batches)(
        CorpusStream.ingest(_)).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val expected = graft.ext.TextStats
        .corpusClean(docs.toDF("doc_id", "text", "ingest_ts"), "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected, s"survivors differ " +
        s"(missing ${expected.keySet -- got.keySet}, extra ${got.keySet -- expected.keySet})")
    }

  test("ingestIncremental: replay after a lost commit appends nothing (exactly-once)") {
    val rnd = new Random(404)
    val dir = java.nio.file.Files.createTempDirectory("graft-sp-inc").toString
    val srcDir = s"$dir/src"; val corpus = s"$dir/corpus"; val ckpt = s"$dir/ckpt"
    new java.io.File(srcDir).mkdirs()
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    def writeFile(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = s"$dir/tmp_$name"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    def start() = CorpusStream.ingestIncremental(
      spark.readStream.schema(schema).parquet(srcDir), corpus, ckpt)
    def corpusIds() = spark.read.parquet(corpus).collect().map(_.getLong(0)).toSet

    val texts1 = (0 until 10).map(_ => genText(rnd)).distinct
    val file1 = texts1.zipWithIndex.map { case (t, i) => (i + 1L, t) } ++
      Seq((100L, texts1.head)) // batch-internal dup → dropped by dedupDelta
    writeFile("f1", file1)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    val after1 = corpusIds()
    assert(after1 == texts1.indices.map(_ + 1L).toSet)

    // simulate a crash AFTER the append but BEFORE the commit marker:
    // batch 0 must replay on restart, and the anti-join must drop every
    // replayed doc — the corpus is the idempotence state
    val commit0 = new java.io.File(s"$ckpt/commits/0")
    assert(commit0.exists, "commit marker expected")
    assert(commit0.delete())
    // the local ChecksumFs keeps a .crc sidecar; leaving it behind makes
    // the replayed commit's rename fail with FileAlreadyExists
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(corpusIds() == after1, "replayed batch appended duplicates")
    assert(spark.read.parquet(corpus).count() == after1.size.toLong)

    // a later file overlapping the corpus adds only the genuinely new docs
    val texts2 = (0 until 6).map(_ => genText(rnd)).distinct
      .filterNot(texts1.contains)
    val file2 = texts2.zipWithIndex.map { case (t, i) => (200L + i, t) } ++
      Seq((300L, texts1.last)) // already in the corpus → dropped
    writeFile("f2", file2)
    val q3 = start()
    try { q3.processAllAvailable() } finally q3.stop()
    assert(corpusIds() == after1 ++ texts2.indices.map(200L + _),
      "second batch must add exactly the new texts")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
