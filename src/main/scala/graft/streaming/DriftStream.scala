package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Online drift monitoring — the Structured Streaming twin of
  * [[graft.ops.Drift.psi]]: per event-time tumbling window, the PSI of a
  * numeric column's live distribution against a STATIC reference
  * distribution (e.g. the training snapshot). The detector a serving
  * pipeline runs continuously, instead of re-scanning history per check.
  *
  * The reference is fitted ONCE, batch-side: exact decile edges and the
  * reference bin proportions both become literals in the streaming plan
  * — no stream-static join, no state beyond the windowed aggregate.
  * Per window the stream shuffles ≤ bins+1 conditional counts (map-side
  * combined), and the PSI term sum is a LITERAL fold over the bin
  * columns — fixed addition order, so a window's PSI is bit-identical to
  * the batch [[graft.ops.Drift.psi]] of the same rows against the same
  * reference.
  */
object DriftStream {

  /** Fit edges + reference proportions on `reference`, return a streaming
    * frame (window_start, window_end, n, psi) — append-ready once the
    * watermark closes each window. */
  def psiMonitor(stream: DataFrame, reference: DataFrame, c: String,
                 tsCol: String = "ts", windowDur: String = "1 hour",
                 watermark: String = "2 hours", bins: Int = 10,
                 eps: Double = 1e-6, roundTo: Int = 6): DataFrame = {
    require(bins > 1, s"psiMonitor: bins must be > 1 (got $bins)")
    val probs = (1 until bins).map(_.toDouble / bins)
    val edgeArr = expr(s"percentile(CAST($c AS DOUBLE), array(${probs.mkString("D,")}D))")
    val refNonNull = reference.filter(col(c).isNotNull)
    // NaN-containing edge sets collapse to Seq.empty, matching the batch
    // psiEdges fallback — otherwise `v >= NaN` is always false and the
    // upper bins silently vanish, diverging from the batch metric
    val edges: Seq[Double] = refNonNull.agg(edgeArr.as("qs")).head() match {
      case r if r.isNullAt(0) => Seq.empty
      case r =>
        val qs = r.getSeq[Double](0)
        if (qs.exists(_.isNaN)) Seq.empty else qs.distinct.sorted
    }
    def binIdx(v: Column): Column = edges.foldLeft(lit(0))((acc, e) =>
      acc + when(v.cast("double") >= lit(e), 1).otherwise(0))
    val nBins = edges.size + 1
    // reference proportions, eps-floored once here (counts are exact longs)
    val refCounts = refNonNull.select(binIdx(col(c)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val refTotal = refCounts.values.sum
    // an empty/all-null reference would make every pRef NaN (0/0) and the
    // monitor would emit psi=NaN forever, silently — fail loudly instead,
    // like jsMonitor's "empty reference" require
    require(refTotal > 0, "psiMonitor: empty reference (no non-null rows)")
    val pRef: Seq[Double] = (0 until nBins).map(i =>
      math.max(refCounts.getOrElse(i, 0L).toDouble / refTotal, eps))

    // project the bin index ONCE per row — folding binIdx inside every
    // per-bin count would re-run the edge fold bins× per row
    val counts = (0 until nBins).map(i =>
      sum(when(col("__bin") === i, 1L).otherwise(0L)).as(s"__c$i"))
    val total = (0 until nBins).map(i => col(s"__c$i")).reduce(_ + _)
    def pLive(i: Int): Column =
      greatest(col(s"__c$i").cast("double") / nullif(total, lit(0L)), lit(eps))
    // literal fold over the bins = fixed addition order, same as the
    // batch plan's ordered cumulative window
    val psi = (0 until nBins).map { i =>
      (lit(pRef(i)) - pLive(i)) * log(lit(pRef(i)) / pLive(i))
    }.reduce(_ + _)
    stream
      .filter(col(c).isNotNull)
      .select(col(tsCol), binIdx(col(c)).as("__bin"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(counts.head, counts.tail: _*)
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        total.as("n"),
        round(psi, roundTo).as("psi"))
  }

  /** Earth-mover monitor — the streaming sibling of
    * [[graft.ops.Drift.wasserstein]], measured in QUANTILE UNITS: per
    * tumbling window, Σᵢ |CumRef(i) − CumLive(i)| over the reference's
    * `bins`-quantile bins (unit bin widths). Dividing the axis by the
    * reference's own quantiles makes the metric scale-free — a value of
    * w1_bins = 1 means "the live distribution is shifted one reference
    * decile", whatever the column's units — and keeps per-window state
    * at `bins` counters exactly like [[psiMonitor]] (true W1 needs the
    * full value grid, which no bounded-state stream can hold). Bin
    * edges + reference cumulative proportions fit once batch-side and
    * fold as literals; the live cumulative sums share one bin-index
    * projection per row. Bounded by bins−1; 0 = distributions agree at
    * every fitted quantile. */
  def w1Monitor(stream: DataFrame, reference: DataFrame, c: String,
                tsCol: String = "ts", windowDur: String = "1 hour",
                watermark: String = "2 hours", bins: Int = 10,
                roundTo: Int = 6): DataFrame = {
    require(bins > 1, s"w1Monitor: bins must be > 1 (got $bins)")
    val probs = (1 until bins).map(_.toDouble / bins)
    val edgeArr = expr(s"percentile(CAST($c AS DOUBLE), array(${probs.mkString("D,")}D))")
    val refNonNull = reference.filter(col(c).isNotNull)
    val edges: Seq[Double] = refNonNull.agg(edgeArr.as("qs")).head() match {
      case r if r.isNullAt(0) => Seq.empty
      case r =>
        val qs = r.getSeq[Double](0)
        if (qs.exists(_.isNaN)) Seq.empty else qs.distinct.sorted
    }
    def binIdx(v: Column): Column = edges.foldLeft(lit(0))((acc, e) =>
      acc + when(v.cast("double") >= lit(e), 1).otherwise(0))
    val nBins = edges.size + 1
    val refCounts = refNonNull.select(binIdx(col(c)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val refTotal = refCounts.values.sum
    require(refTotal > 0, "w1Monitor: empty reference (no non-null rows)")
    val cumRef: Seq[Double] = (0 until nBins).scanLeft(0L)(
      (acc, i) => acc + refCounts.getOrElse(i, 0L)).tail
      .map(_.toDouble / refTotal)

    val counts = (0 until nBins).map(i =>
      sum(when(col("__bin") === i, 1L).otherwise(0L)).as(s"__c$i"))
    val total = (0 until nBins).map(i => col(s"__c$i")).reduce(_ + _)
    def cumLive(i: Int): Column =
      (0 to i).map(j => col(s"__c$j")).reduce(_ + _).cast("double") /
        nullif(total, lit(0L))
    // the last cumulative is 1 on both sides — sum only the free terms,
    // in ascending bin order (fixed addition order)
    val w1 = (0 until nBins - 1).map(i =>
      abs(lit(cumRef(i)) - cumLive(i))).reduce(_ + _)
    stream
      .filter(col(c).isNotNull)
      .select(col(tsCol), binIdx(col(c)).as("__bin"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(counts.head, counts.tail: _*)
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        total.as("n"),
        round(w1, roundTo).as("w1_bins"))
  }

  /** The CATEGORICAL twin of [[psiMonitor]]: per tumbling window, the
    * Jensen–Shannon divergence of a column's live category distribution
    * against a static reference PMF. Vocabulary and reference
    * proportions fit once batch-side and fold as literals (k-ascending,
    * matching the batch [[graft.ops.Drift.jsDivergence]] term order, so
    * a window whose categories all exist in the reference scores
    * bit-identically to the batch metric on the same rows). Live values
    * outside the vocabulary collapse into one `__OTHER__` bucket (pRef =
    * 0 there, contributing only the live-side q·ln 2 mass) — bounding
    * the aggregate width however wild the stream's values get. Nulls
    * bucket as "NA" like every categorical drift metric here. */
  def jsMonitor(stream: DataFrame, reference: DataFrame, c: String,
                tsCol: String = "ts", windowDur: String = "1 hour",
                watermark: String = "2 hours", maxCategories: Int = 100,
                roundTo: Int = 6): DataFrame = {
    val refKey = coalesce(col(c).cast("string"), lit("NA"))
    val refCounts: Seq[(String, Long)] = reference.select(refKey.as("k"))
      .groupBy("k").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    require(refCounts.nonEmpty, "empty reference")
    // the overflow bucket's label must not exist as a REAL reference
    // category: `keys` would contain it twice, double-counting its rows
    // in `total` and mis-assigning its pRef — fail loudly
    require(!refCounts.exists(_._1 == "__OTHER__"),
      "jsMonitor: reference contains the reserved category label \"__OTHER__\"")
    // keep the top-mass categories (count desc, key tie-break — taking
    // the lexicographically-first keys instead would fold DOMINANT
    // categories into __OTHER__ on any wide reference, gutting the drift
    // signal), then order the kept set by UTF-8 BYTE order so the literal
    // fold is deterministic AND matches the batch metric's term order
    // (Spark sorts strings as UTF8 bytes; Scala's String.sorted compares
    // UTF-16 code units — the two disagree for supplementary-plane keys)
    val kept = refCounts.sortBy { case (k, n) => (-n, k) }.take(maxCategories)
    val vocab = kept.map(_._1).sortWith((a, b) =>
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0)
    val refTotal = refCounts.map(_._2).sum.toDouble
    val pRefByK: Map[String, Double] =
      kept.map { case (k, n) => k -> n / refTotal }.toMap
    // fold order: vocabulary ascending, then the OTHER bucket (carrying
    // any reference tail mass past maxCategories)
    val keys = vocab :+ "__OTHER__"
    // tail mass accumulates in VOCAB order (a Map-iteration sum would be
    // non-deterministic in its float addition order across runs)
    val vocabMass = vocab.foldLeft(0.0)((acc, k) => acc + pRefByK(k))
    val pRef: Seq[Double] = keys.map {
      case "__OTHER__" => 1.0 - vocabMass
      case k => pRefByK(k)
    }
    val liveKey = coalesce(col(c).cast("string"), lit("NA"))
    val mapped = when(liveKey.isInCollection(vocab), liveKey).otherwise(lit("__OTHER__"))
    // project the mapped key ONCE per row — folding `mapped` (with its
    // vocab-wide membership scan) inside every per-key count would run
    // it |keys|× per row
    val counts = keys.indices.map(i =>
      sum(when(col("__k") === keys(i), 1L).otherwise(0L)).as(s"__c$i"))
    val total = keys.indices.map(i => col(s"__c$i")).reduce(_ + _)
    val js = keys.indices.map { i =>
      val p = lit(pRef(i))
      val q = col(s"__c$i").cast("double") / nullif(total, lit(0L))
      val m = (p + q) / 2.0
      (if (pRef(i) > 0) p * log(p / m) * 0.5 else lit(0.0)) +
        when(col(s"__c$i") > 0, q * log(q / m) * 0.5).otherwise(0.0)
    }.reduce(_ + _)
    stream
      .select(col(tsCol), mapped.as("__k"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(counts.head, counts.tail: _*)
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        total.as("n"),
        round(js, roundTo).as("js"))
  }
}
