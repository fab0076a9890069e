package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.parallel.CollectionConverters._

/** Anonymization operators (SURVEY.md §2.5 V1–V5, V7) — the reference
  * engine's signature capability (`modules/privacy.py`).
  *
  * Everything is a lazy Column-expression plan: a full Protect chain
  * (suppress → generalize → noise) fuses into one whole-stage-codegen pass
  * plus at most one shuffle per suppressed column — vs the reference's full
  * table copy per stage (`modules/privacy.py:5,14,25`).
  */
object Privacy {

  /** Guards [[collectRawState]]'s temporary `files.minPartitionNum`
    * override — see the comment at the use site. */
  private val fitConfLock = new Object

  /** V1 SDC rare-category suppression (`modules/privacy.py:4-11`): values
    * of `cols` whose GLOBAL frequency < threshold become "OTHER"; non-string
    * columns are silently skipped, as in the reference (`:7`).
    *
    * Implementation: count-over-partition window per column — a single
    * shuffle per suppressed column and no join. At 100 TB with a
    * low-cardinality column, prefer [[sdcSuppressBroadcast]]: groupBy
    * (map-side combinable) + broadcast of only the rare set.
    */
  def sdcSuppress(df: DataFrame, cols: Seq[String], threshold: Long = 5): DataFrame = {
    val strCols = df.schema.fields
      .filter(f => cols.contains(f.name) && f.dataType == StringType)
      .map(_.name)
    strCols.foldLeft(df) { (d, c) =>
      val cnt = count(lit(1)).over(Window.partitionBy(col(c)))
      d.withColumn(c, when(cnt < threshold, lit("OTHER")).otherwise(col(c)))
    }
  }

  /** V1 at scale: per-column grouped counts (tiny: ≤ |distinct|) joined
    * back via broadcast — the full table shuffles zero times. */
  def sdcSuppressBroadcast(df: DataFrame, cols: Seq[String], threshold: Long = 5): DataFrame = {
    val strCols = df.schema.fields
      .filter(f => cols.contains(f.name) && f.dataType == StringType)
      .map(_.name)
    strCols.foldLeft(df) { (d, c) =>
      val rare = d.groupBy(col(c).as("__rare_v"))
        .agg(count(lit(1)).as("__cnt"))
        .filter(col("__cnt") < threshold)
        .select(col("__rare_v"))
      d.join(broadcast(rare), col(c) <=> col("__rare_v"), "left")
        .withColumn(c, when(col("__rare_v").isNotNull, lit("OTHER")).otherwise(col(c)))
        .drop("__rare_v")
    }
  }

  /** V2 numeric generalization by empirical quantile binning
    * (`modules/privacy.py:13-22`). Bin edges are EXACT percentiles
    * (sort-based `percentile`, not approx — SURVEY §4.3); duplicate edges
    * are merged as `pd.qcut(duplicates="drop")` does. Labels follow the
    * declared labels-as-truth convention (SURVEY §4.4.3): left-closed
    * `[lo, hi)`, last bin closed, bounds printed with 2 decimals.
    *
    * The edge list is tiny (≤ bins+1 doubles) — collected to the driver
    * and compiled into a when-chain, which codegens into the scan pass.
    */
  /** Quantile-edge strategies for [[generalizeNumeric]]:
    *  - [[QuantileStrategy.CentsHistogram]]: distributed histogram over the
    *    value DOMAIN; the scale path, valid for ≤2-decimal columns only
    *    (quantiles of the cents-rounded values).
    *  - [[QuantileStrategy.DriverSort]]: collect the RAW doubles, select on
    *    the driver — `quantile_cont` bit-exact for ANY doubles; fastest
    *    while one column fits driver memory. Equal to CentsHistogram only
    *    when the column is cents-eligible.
    *  - [[QuantileStrategy.SortPercentile]]: Spark's exact percentile
    *    aggregate — distributed general-doubles path (its interpolation
    *    can differ from quantile_cont by 1 ulp on rare inputs). */
  sealed trait QuantileStrategy
  object QuantileStrategy {
    case object CentsHistogram extends QuantileStrategy
    case object DriverSort extends QuantileStrategy
    case object SortPercentile extends QuantileStrategy
  }

  def generalizeNumeric(df: DataFrame, c: String, bins: Int = 10,
                        strategy: QuantileStrategy = QuantileStrategy.CentsHistogram): DataFrame = {
    val probs = (0 to bins).map(i => i.toDouble / bins)
    val raw: Seq[Double] = strategy match {
      case QuantileStrategy.CentsHistogram =>
        // bucketed two-pass plan (no single-task window over the value
        // domain); falls back to the legacy ordered-window form only when
        // the caller FORCED this strategy on a non-cents-eligible column,
        // whose documented semantics are quantiles of cents-rounded values
        Exact.quantilesMultiCentsHistogram(df, Seq(c), probs)(c).quantiles
          .getOrElse(Exact.quantilesViaCentsHistogramDistributed(df, c, probs))
      case QuantileStrategy.DriverSort =>
        Exact.quantilesViaDriverSort(df, c, probs)
      case QuantileStrategy.SortPercentile =>
        df.agg(expr(s"percentile($c, array(${probs.mkString("D,")}D))").as("q"))
          .head().getSeq[Double](0)
    }
    if (raw.exists(_.isNaN)) return df.withColumn(c, lit(null).cast("string"))
    val edges = raw.distinct
    if (edges.length < 2) return df.withColumn(c, lit(null).cast("string"))
    val labeled = labelExpr(col(c), edges)
    df.withColumn(c, labeled)
  }

  /** [[generalizeNumeric]] with the quantile strategy chosen from the DATA
    * (the auto-dispatch pattern shared with profile/synthesize/KS):
    * non-cents-eligible columns (>2 decimals, |x| ≥ ~1e16 — one cheap
    * scan verifies) take the general sort-based percentile; eligible
    * columns below the driver-collect ceiling take the fused driver sort
    * (bit-exact `quantile_cont`, beats any shuffle at the job floor);
    * eligible columns at scale take the bucketed cents histogram, which
    * shuffles only the value DOMAIN. Arbitrary CSV columns with >2
    * decimal places must never be binned on cents-rounded values. */
  def generalizeNumericAuto(df: DataFrame, c: String, bins: Int = 10): DataFrame =
    generalizeNumeric(df, c, bins,
      if (!Exact.centsEligible(df, c)) QuantileStrategy.SortPercentile
      else if (driverFits(df, nCols = 1)) QuantileStrategy.DriverSort
      else QuantileStrategy.CentsHistogram)

  /** C-printf-compatible "%.2f": round the EXACT binary value of the
    * double half-to-even, as C (and DuckDB's printf) does. Java's own
    * Formatter instead HALF_UPs the SHORTEST decimal representation,
    * which flips labels when an edge's shortest repr lands exactly on a
    * 2-decimal tie but its exact binary value sits below it (observed at
    * sf0.1: 52923.184999…997 prints ".18" in C, ".19" in Java). */
  def fmt2(d: Double): String =
    if (d.isNaN || d.isInfinite) String.format("%.2f", Double.box(d)) // "NaN"/"Infinity"
    else {
      val s = new java.math.BigDecimal(d).setScale(2, java.math.RoundingMode.HALF_EVEN).toPlainString
      // BigDecimal drops the sign of -0.0; C printf keeps it
      if (s == "0.00" && (java.lang.Double.doubleToRawLongBits(d) < 0)) "-0.00" else s
    }

  /** when-chain mapping a value into its `[lo, hi)` label (last bin
    * closed). Labels are precomputed driver-side with [[fmt2]] so both
    * engines print identical bin bounds. Kept separate so tests can
    * exercise edge semantics. */
  def labelExpr(v: Column, edges: Seq[Double]): Column = {
    val pairs = edges.zip(edges.tail)
    val lastIdx = pairs.length - 1
    pairs.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((lo, hi), i)) =>
        val in =
          if (i == lastIdx) v >= lo && v <= hi
          else v >= lo && v < hi
        val close = if (i == lastIdx) "]" else ")"
        when(in, lit(s"[${fmt2(lo)}, ${fmt2(hi)}$close")).otherwise(acc)
    }
  }

  /** V3 DP-style Laplace noise (`modules/privacy.py:24-31`): adds iid
    * Laplace(0, sensitivity/max(ε,1e-6)) to each value. The reference is
    * unseeded; we are seeded-by-default (SURVEY §4.4.4) via `rand(seed)` +
    * inverse CDF — a pure codegen'd column expression, no UDF.
    *
    * Determinism caveat (documented): `rand(seed)` is seeded per
    * partition, so results are stable for a fixed partitioning but not
    * across repartitioning — acceptable because the oracle checks
    * distribution moments, not rows (SURVEY §2 match mode `seeded`).
    */
  def dpNoise(df: DataFrame, cols: Seq[String], epsilon: Double,
              sensitivity: Double = 1.0, seed: Long = 42L): DataFrame = {
    val b = sensitivity / math.max(epsilon, 1e-6)
    val numCols = df.schema.fields
      .filter(f => cols.contains(f.name) && f.dataType.isInstanceOf[NumericType])
      .map(_.name)
    numCols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val u = rand(seed + i) - 0.5
      val lap = -signum(u) * log(lit(1.0) - lit(2.0) * abs(u)) * b
      d.withColumn(c, col(c).cast("double") + lap)
    }
  }

  /** DP histogram release — the aggregate-release sibling of [[dpNoise]]
    * (which noises rows): per-category counts + Laplace(1/ε) noise,
    * clamped at 0 and rounded to integers — the standard counting-query
    * release (sensitivity 1: one row moves one bucket by 1).
    *
    * Unlike v3's `rand(seed)` (stable only for a fixed partitioning),
    * the noise here is a PURE FUNCTION OF THE CATEGORY KEY:
    * `xxhash64(category, seed)` → uniform in (0,1) → inverse-CDF
    * Laplace. Released counts are therefore bit-identical under ANY
    * partitioning, executor count, or row order — the property an
    * auditable privacy release needs at 1000 executors (same run, same
    * release). One partial+final hash aggregate; the noise rides the
    * final projection. Declared seeded mode (the oracle cannot express
    * Spark's xxhash64); PrivacySpec pins determinism-under-repartition,
    * the ε→∞ exact-recovery limit, and the noise-scale envelope.
    *
    * NOT a production DP mechanism under repeated release: because the
    * noise is a pure function of (category, seed), two releases over
    * EVOLVING data reuse identical per-key noise — differencing them
    * recovers exact count deltas, and anyone holding the seed can
    * denoise exactly. The fixed default seed exists for reproducible
    * benchmarking and auditability of a SINGLE release. For real
    * adversarial privacy, supply a FRESH seed per release (each
    * release is then ε-DP on its own; sequential composition across
    * releases applies as usual) and treat seeds as secrets. */
  def dpHistogram(df: DataFrame, c: String, epsilon: Double = 1.0,
                  seed: Long = 42L): DataFrame = {
    val b = 1.0 / math.max(epsilon, 1e-6)
    val m = 1L << 52
    val cat = coalesce(col(c).cast("string"), lit("NA"))
    val counts = df.groupBy(cat.as("category")).agg(count(lit(1)).as("n"))
    // u ∈ (−0.5, 0.5): (h mod 2^52 + 0.5)/2^52 − 0.5 never hits the
    // log(0) endpoints; signum(0)·log(1) = 0 handles the midpoint.
    val u = (pmod(xxhash64(col("category"), lit(seed)), lit(m)).cast("double") +
      lit(0.5)) / lit(m.toDouble) - lit(0.5)
    val lap = -signum(u) * log(lit(1.0) - lit(2.0) * abs(u)) * lit(b)
    counts
      .select(col("category"),
        greatest(lit(0L), round(col("n") + lap).cast("long")).as("n_released"))
      .orderBy(col("category"))
  }

  /** DP mean release — the scalar-release sibling of [[dpHistogram]]:
    * clip values to the public [lo, hi] range, add Laplace noise to the
    * clipped SUM (sensitivity hi−lo) and to the COUNT (sensitivity 1)
    * with ε split evenly, release noisy_sum / max(1, noisy_n) — the
    * textbook ε-DP mean under the standard composition argument. The two
    * noise draws are seeded driver-side (pure function of the seed —
    * trivially partition-invariant; nothing random executes on
    * executors), so the same run always publishes the same number. One
    * aggregate job. Declared seeded mode; PrivacySpec pins determinism,
    * the ε→∞ exact-recovery limit, and the clipped-range bound. */
  def dpMean(df: DataFrame, c: String, lo: Double, hi: Double,
             epsilon: Double = 1.0, seed: Long = 42L): DataFrame = {
    require(hi > lo, "need a non-degenerate public clip range")
    val eps = math.max(epsilon, 1e-6)
    def lap(i: Int, b: Double): Double = {
      val u = new scala.util.Random(seed * 31 + i).nextDouble() - 0.5
      -math.signum(u) * math.log(1.0 - 2.0 * math.abs(u)) * b
    }
    val noiseSum = lap(1, 2.0 * (hi - lo) / eps)
    val noiseN = lap(2, 2.0 / eps)
    val clipped = least(greatest(col(c).cast("double"), lit(lo)), lit(hi))
    df.agg(sum(clipped).as("__s"), count(col(c)).as("__n"))
      .select(
        (coalesce(col("__s"), lit(0.0)) + lit(noiseSum)).as("noisy_sum"),
        (col("__n") + lit(noiseN)).as("noisy_n"))
      .select(col("noisy_sum"), col("noisy_n"),
        (col("noisy_sum") / greatest(lit(1.0), col("noisy_n"))).as("mean_released"))
  }

  /** V4 lightweight synthetic sampler (`modules/privacy.py:33-53`):
    * column-independent synthesis, correlations intentionally destroyed.
    * Numeric → 50% bootstrap resample + 50% Normal(μ, σ or 1); categorical
    * → iid draws from the empirical PMF via inverse-CDF range join.
    * Seeded; row order explicitly arbitrary (as the reference's index is).
    *
    * Columns attach to a `spark.range(n)` id spine: numeric draws are pure
    * column expressions over a broadcast cents histogram (inverse CDF),
    * categorical draws are a broadcast range join on the cumulative PMF.
    * At scale each column costs one histogram/PMF aggregate plus zero
    * shuffles of the output.
    */
  /** Numeric fit: distinct values, cumulative CDF, exact μ / σ-or-1. */
  private final case class NumFit(values: Array[Double], cum: Array[Double],
                                  mu: Double, sigma: Double)

  /** ONE fused scan over the internal rows collecting, per numeric
    * column, the SORTED raw doubles (nulls and non-finites dropped) and,
    * per string column, the full category histogram (null is a key) —
    * the shared fitting collector behind [[syntheticSample]]'s driver
    * path and [[protectFit]]. Primitive batches, no encoder; practical
    * while the projected columns fit driver memory (documented ceiling
    * [[DriverFitMaxCells]]). */
  private def collectRawState(df: DataFrame, numNames: Seq[String], catNames: Seq[String])
      : (Long, Map[String, Array[Double]], Map[String, Map[String, Long]]) = {
    // r14: the fused one-job form below decodes every projected column
    // SERIALLY within each scan task, and a small fixture's task count is
    // its row-group count — a 1-row-group file runs the whole fit on one
    // core while 31 idle (the v4 bench floor). When the scan's
    // parallelism ceiling is far below the machine and several columns
    // are projected, split the collect per COLUMN instead: column chunks
    // are independent byte ranges, so per-column jobs decode in parallel
    // at zero duplicated IO, and the exact row count ships free in the
    // same footers. The fused path stays the at-scale form (row groups
    // ≥ cores: scan tasks already saturate the cluster, one job beats
    // |columns| scheduler round-trips).
    // Fastest form first: a pure parquet scan's chunks decode DRIVER-side
    // with (files × columns)-way parallelism and no scheduler at all
    // (graft.io.DriverParquet — strict type pairings, refuses anything
    // with cast/filter semantics). Safe here by construction: this
    // collector only runs behind the DriverFitMaxCells dispatch, so the
    // data was already driver-bound.
    graft.io.DriverParquet.collectColumns(df, numNames, catNames) match {
      case Some((rowsTotal, rawNums, catMaps)) =>
        val numArrs = numNames.par.map { c =>
          val a = rawNums(c)._1 // non-finite values dropped, as this fit wants
          java.util.Arrays.parallelSort(a)
          c -> a
        }.toList.toMap
        return (rowsTotal, numArrs, catMaps)
      case None => ()
    }
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val layout = graft.io.ScanStats.parquetScanLayout(df)
    if (numNames.length + catNames.length > 1 &&
        layout.exists { case (_, groups) => groups * 2 <= cores }) {
      val rowsTotal = layout.get._1
      def collectNum(c: String): Array[Double] = {
        val slices = df.select(col(c).cast("double")).queryExecution.toRdd
          .mapPartitions { it =>
            val b = new scala.collection.mutable.ArrayBuilder.ofDouble
            it.foreach { r =>
              if (!r.isNullAt(0)) {
                val v = r.getDouble(0)
                if (!v.isNaN && !v.isInfinite) b += v
              }
            }
            Iterator.single(b.result())
          }.collect()
        val sorted = new Array[Double](slices.map(_.length).sum)
        var off = 0
        slices.foreach { p => System.arraycopy(p, 0, sorted, off, p.length); off += p.length }
        java.util.Arrays.parallelSort(sorted)
        sorted
      }
      def collectCat(c: String): Map[String, Long] = {
        val slices = df.select(col(c).cast("string")).queryExecution.toRdd
          .mapPartitions { it =>
            // UTF8String-keyed with clone-on-first-insert: row buffers are
            // transient, but content hash/equals makes the un-cloned probe
            // safe — only the vocabulary pays an allocation, not every row
            val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]()
            it.foreach { r =>
              val key = if (r.isNullAt(0)) null else r.getUTF8String(0)
              val cnt = m.get(key)
              if (cnt != null) cnt(0) += 1L
              else m.put(if (key == null) null else key.clone(), Array(1L))
            }
            val out = scala.collection.mutable.HashMap.empty[String, Long]
            m.forEach((k, v) => out.update(if (k == null) null else k.toString, v(0)))
            Iterator.single(out.toMap)
          }.collect()
        val merged = scala.collection.mutable.HashMap.empty[String, Long]
        slices.foreach(_.foreach { case (k, v) =>
          merged.update(k, merged.getOrElse(k, 0L) + v)
        })
        merged.toMap
      }
      // The session's `files.minPartitionNum = cores` floor (right for
      // data-bearing scans) makes EACH of these jobs launch `cores`
      // splits of which only the row-group-bearing ones produce rows —
      // |columns| × (cores − groups) empty task launches of pure
      // overhead. Parallelism here comes from the per-column fan-out,
      // so pin the floor to the true row-group count around the fit
      // (runtime SQL conf, read at each job's planning inside the try).
      // The set/restore window is serialized (r15, ADVICE): two
      // overlapping fits on one session would otherwise race the
      // save/restore and the second restore could persist the pinned
      // floor. A single process-wide monitor is enough — the window is
      // tens of ms on the tiny inputs that reach this branch, and the
      // fit's own parallelism (the per-column .par fan-out) runs inside
      // the lock, not against it.
      val sconf = df.sparkSession.conf
      val results = fitConfLock.synchronized {
        val prevFloor = sconf.getOption("spark.sql.files.minPartitionNum")
        try {
          sconf.set("spark.sql.files.minPartitionNum", layout.get._2.toString)
          (numNames.map(Left(_): Either[String, String]) ++
            catNames.map(Right(_): Either[String, String])).par.map {
            case Left(c)  => Left(c -> collectNum(c))
            case Right(c) => Right(c -> collectCat(c))
          }.toList
        } finally prevFloor match {
          case Some(v) => sconf.set("spark.sql.files.minPartitionNum", v)
          case None    => sconf.unset("spark.sql.files.minPartitionNum")
        }
      }
      val numArrs = results.collect { case Left(kv) => kv }.toMap
      val catMaps = results.collect { case Right(kv) => kv }.toMap
      return (rowsTotal, numArrs, catMaps)
    }
    val kN = numNames.length
    val kC = catNames.length
    val proj = df.select(numNames.map(c => col(c).cast("double")) ++
      catNames.map(c => col(c).cast("string")): _*)
    val parts = proj.queryExecution.toRdd.mapPartitions { it =>
      val bufs = Array.fill(kN)(new scala.collection.mutable.ArrayBuilder.ofDouble)
      val maps = Array.fill(kC)(scala.collection.mutable.HashMap.empty[String, Long])
      var rows = 0L
      it.foreach { r =>
        rows += 1
        var i = 0
        while (i < kN) {
          if (!r.isNullAt(i)) {
            val v = r.getDouble(i)
            if (!v.isNaN && !v.isInfinite) bufs(i) += v
          }
          i += 1
        }
        var j = 0
        while (j < kC) {
          val key = if (r.isNullAt(kN + j)) null else r.getUTF8String(kN + j).toString
          val m = maps(j)
          m.update(key, m.getOrElse(key, 0L) + 1L)
          j += 1
        }
      }
      Iterator.single((rows, bufs.map(_.result()), maps.map(_.toMap)))
    }.collect()
    val rowsTotal = parts.map(_._1).sum
    // parallelSort + per-column parallelism: the driver fit's sort was
    // the single-threaded half of v4's fit wall (r13 DevV4: 0.36 s
    // fit-only against a 0.18 s collect job). Sort order is
    // deterministic either way; the array stays bounded by the
    // DriverFitMaxCells dispatch.
    val numArrs = numNames.zipWithIndex.par.map { case (c, bi) =>
      val slices = parts.map(_._2(bi))
      val sorted = new Array[Double](slices.map(_.length).sum)
      var off = 0
      slices.foreach { p => System.arraycopy(p, 0, sorted, off, p.length); off += p.length }
      java.util.Arrays.parallelSort(sorted)
      c -> sorted
    }.toList.toMap
    val catMaps = catNames.zipWithIndex.map { case (c, bj) =>
      val merged = scala.collection.mutable.HashMap.empty[String, Long]
      parts.foreach(_._3(bj).foreach { case (k, v) =>
        merged.update(k, merged.getOrElse(k, 0L) + v)
      })
      c -> merged.toMap
    }.toMap
    (rowsTotal, numArrs, catMaps)
  }

  /** Fit from a SORTED raw-double array (driver path): one pass builds
    * the distinct (values, cum) inverse-CDF table; μ/σ come from two-pass
    * Kahan-compensated sums — accurate to the last ulps for any finite
    * data of sane magnitude (d² can still overflow past ~1.3e154; the σ
    * fallback also catches that Inf), and V4's Gaussian half only
    * consumes them as parameters (seeded/rows-only match mode). Raw
    * doubles mean NO ≤2-decimal precondition: arbitrary user columns
    * bootstrap on their exact values. */
  private def fitFromSortedDoubles(sorted: Array[Double]): NumFit = {
    val nn = sorted.length
    val vs = Array.newBuilder[Double]
    val cm = Array.newBuilder[Double]
    var i = 0
    var s = 0.0
    var comp = 0.0
    while (i < nn) {
      val y = sorted(i) - comp
      val t = s + y
      comp = (t - s) - y
      s = t
      if (i == nn - 1 || sorted(i + 1) != sorted(i)) {
        vs += sorted(i)
        cm += (i + 1).toDouble / nn
      }
      i += 1
    }
    val mu = s / nn
    var s2 = 0.0
    var c2 = 0.0
    i = 0
    while (i < nn) {
      val d = sorted(i) - mu
      val y = d * d - c2
      val t = s2 + y
      c2 = (t - s2) - y
      s2 = t
      i += 1
    }
    val sdRaw = if (nn < 2) Double.NaN else math.sqrt(s2 / (nn - 1))
    val sigma = if (nn < 2 || sdRaw == 0.0 || sdRaw.isNaN || sdRaw.isInfinite) 1.0 else sdRaw
    val (cv, cc) = capCdf(vs.result(), cm.result())
    NumFit(cv, cc, mu, sigma)
  }

  /** Cap an inverse-CDF support table to ≤ [[MaxCdfKnots]] knots by
    * subsampling at evenly spaced cumulative-probability targets (every
    * kept knot is an exact (value, cum) point of the empirical CDF; the
    * final knot always carries cum = 1.0, so the sampler's binary search
    * domain is unchanged). A near-unique money column otherwise embeds
    * ~n distinct doubles TWICE as plan literals — megabytes of codegen
    * constants per column, which dominated v4's wall time and grew
    * linearly with input. V4's declared match mode is seeded/
    * distributional (moments/PMF within tolerance), and the quantile
    * subsample moves each bootstrap draw by less than one inter-knot
    * quantile step — orders of magnitude inside those tolerances. */
  private val MaxCdfKnots = 4096

  /** Bucket ceiling for the at-scale fit's cents histogram: the collect
    * in [[syntheticSample]]'s distributed branch is bounded by this per
    * numeric column however large the value domain grows (16× finer
    * than [[MaxCdfKnots]], so the knot subsample downstream never sees
    * the bucketing on top of its own quantile step). */
  private val FitHistMaxBuckets = 65536L

  private def capCdf(values: Array[Double], cum: Array[Double]): (Array[Double], Array[Double]) = {
    val n = values.length
    if (n <= MaxCdfKnots) return (values, cum)
    val vs = new Array[Double](MaxCdfKnots)
    val cs = new Array[Double](MaxCdfKnots)
    var j = 0
    var i = 0
    while (j < MaxCdfKnots) {
      val target = (j + 1).toDouble / MaxCdfKnots
      while (i < n - 1 && cum(i) < target) i += 1
      vs(j) = values(i)
      cs(j) = cum(i)
      j += 1
    }
    (vs, cs)
  }

  /** Row-based driver-fit dispatch for [[syntheticSample]] /
    * [[generalizeNumericAuto]] (round 7 — replaces the earlier 16 MiB
    * plan-stats byte ceiling). The byte estimate is compression-skewed
    * for parquet sources — snappy routinely packs 5-8× on these tables,
    * so a byte ceiling lets inputs with millions of rows slip into the
    * driver path, whose cost (single-threaded collect bandwidth +
    * O(n log n) sort) grows with ROWS × collected COLUMNS, not with
    * compressed bytes. Decision: the CBO row count when available,
    * else a LIMIT-bounded row probe (every task stops after cap+1
    * narrow rows, so the probe costs at most the ceiling — it never
    * executes an unbounded upstream plan just to decide dispatch)
    * against a CELL ceiling. A plan whose byte estimate already
    * exceeds 1 GiB can't fit any plausible ceiling, so at true scale
    * the probe is skipped entirely and nothing is added to the 100 TB
    * path.
    *
    * The ceiling is deliberately LOW (a few 10⁶ cells, far under what
    * the driver could physically hold): driver-path wall time grows
    * superlinearly long before memory is at risk, while the distributed
    * fit is a flat map-side-combined aggregate whose shuffle is only
    * value-DOMAIN sized — an earlier 8 GiB ceiling kept the driver path
    * in a region where a 4× input cost ~10× the wall time. */
  private val DriverFitMaxCells = 4L << 20

  private def driverFits(df: DataFrame, nCols: Int): Boolean = {
    val stats = df.queryExecution.optimizedPlan.stats
    if (stats.sizeInBytes > (BigInt(1) << 30)) return false
    val cap = DriverFitMaxCells / math.max(1, nCols)
    stats.rowCount.map(_.toLong)
      // Pure parquet-scan plans answer from footers driver-side — no
      // probe JOB at all (the common catalog shape: Tables.* scans).
      // The 1 GiB byte short-circuit above already bounds the footer
      // IO this can trigger.
      .orElse(graft.io.ScanStats.parquetScanRowCount(df)) match {
      case Some(rows) => rows <= cap
      case None =>
        // No CBO row estimate: per-partition capped count over unit rows.
        // Each task counts its OWN partition, stopping at cap+1; only one
        // long per partition reaches the driver. This dominates both
        // earlier probe forms: limit(n).count() shuffled up to
        // n×partitions unit rows to one task, and limit(n).collect()
        // (CollectLimitExec) shipped up to cap+1 actual rows to the
        // driver through its incremental partition ramp — ~5 s of
        // driver-side accumulation at a 1.4M-row cap on a 9.6M-row input
        // (the x16 rehearsal's v4 regression). The projection is a
        // constant, so column pruning leaves a zero-column scan; on a
        // derived plan the subtree executes once with no row movement —
        // the same single pass any dispatch decision costs at minimum.
        val counts = df.select(lit(1).as("__probe")).queryExecution.toRdd
          .mapPartitions { it =>
            var m = 0L
            while (m <= cap && it.hasNext) { it.next(); m += 1 }
            Iterator.single(m)
          }
          .collect()
        counts.forall(_ <= cap) && counts.sum <= cap
    }
  }

  def syntheticSample(df: DataFrame, cols: Seq[String], n: Long = -1L,
                      seed: Long = 42L, driverFit: Option[Boolean] = None): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.filter(f => cols.contains(f.name))
    val numIdx = fields.zipWithIndex.filter(_._1.dataType.isInstanceOf[NumericType])
    val catIdx = fields.zipWithIndex.filterNot(_._1.dataType.isInstanceOf[NumericType])

    // Fitting strategy — auto-selected from the optimizer's size estimate
    // (mirrors generalizeNumericAuto's shape dispatch) unless forced.
    // The auto decision may add one LIMIT-bounded probe job (see
    // [[driverFits]]); the fit itself is then exactly ONE Spark job:
    //  - driver fit (small side; right while the columns fit driver
    //    memory): one fused scan over the internal rows collects every
    //    numeric column's RAW doubles (primitive batches, no encoder,
    //    sorted on the driver — a near-unique money column costs a 5 MB
    //    collect instead of a ~1 s distinct shuffle, and arbitrary-
    //    precision columns bootstrap on exact values), every categorical
    //    PMF (vocabulary-sized hash maps), and the row count.
    //  - distributed fit (the 100 TB path, the default beyond
    //    [[DriverFitMaxCells]] rows×columns — see [[driverFits]]): every
    //    row explodes into a counter entry plus one (colIdx, cents-bin |
    //    category) entry per column; a single map-side-combinable
    //    aggregate yields the row count, every cents histogram, and every
    //    PMF. Only the value DOMAIN shuffles.
    val useDriverFit = driverFit.getOrElse(driverFits(df, fields.length))

    val (sourceRows, numFits, catCounts): (Long, Map[Int, NumFit], Map[Int, Seq[(String, Long)]]) =
      if (useDriverFit) {
        val (rowsTotal, numArrs, catMaps) =
          collectRawState(df, numIdx.map(_._1.name).toSeq, catIdx.map(_._1.name).toSeq)
        // per-column Kahan fit in parallel (driver-bounded arrays; each
        // column's fit is independent and order-insensitive in the map)
        val nf = numIdx.par.flatMap { case ((f, i)) =>
          val sorted = numArrs(f.name)
          if (sorted.isEmpty) None else Some(i -> fitFromSortedDoubles(sorted))
        }.toList.toMap
        val cc = catIdx.map { case (f, i) => i -> catMaps(f.name).toSeq }.toMap
        (rowsTotal, nf, cc)
      } else {
        // ---- at-scale fit (r11 rework): collects bounded at ANY domain.
        // The previous form collected the EXACT cents histogram — value-
        // DOMAIN-sized, which the honest x16 fixture (per-copy cent
        // offsets make money domains grow with the data) measured at
        // ~10 M collected rows on near-unique columns (v4 ratio 32 vs
        // linear 16), and which on a 100 TB near-unique column is a
        // driver kill — the same class as the PSI collect the x64
        // rehearsal caught. Everything the sampler CONSUMES is already
        // bounded (capCdf keeps ≤ MaxCdfKnots knots; μ/σ are two
        // numbers), so the fit is now two bounded jobs:
        //   job 1 — one fused narrow aggregate: row count and, per
        //   numeric column, the EXACT decimal moments (same forms as
        //   Profile — μ/σ lose nothing to the bucketing) plus cents
        //   min/max;
        //   job 2 — per-row entries with the cents BUCKETED to
        //   ≤ FitHistMaxBuckets equi-width bins per column (identity
        //   when the span already fits, so small domains collect the
        //   exact histogram bit-for-bit as before), one map-side-
        //   combinable aggregate carrying each bucket's count and exact
        //   decimal cents sum, and a collect bounded by buckets×columns
        //   + categorical vocabularies. Each bucket's knot VALUE is its
        //   weighted mean, so the bootstrap half's expectation equals
        //   the source mean and every knot stays inside [min, max] —
        //   within V4's declared distributional envelopes by
        //   construction.
        val hiLo = graft.io.ScanStats.parquetScanRowCount(df)
          .exists(_ <= Exact.HiLoSafeMaxRows)
        // cents projected ONCE per column under the aggregate (the
        // corr-matrix 50× lesson — aggregate slots don't get reliable
        // subexpression elimination, and this is the branch where
        // per-row cost matters most). The count slot counts the CENTS
        // column, not the raw one: NaN/±Inf cents-cast to null, so the
        // moment sums exclude them — the divisor must match or μ/σ on a
        // NaN-bearing column bias toward zero and disagree with the CDF
        // knots (normalized by the histogram's non-null count).
        def centsName(i: Int) = s"__cents_$i"
        val pre = df.select(
          numIdx.map { case (f, i) => Exact.cents(col(f.name)).as(centsName(i)) }: _*)
        val momAggs = Seq(count(lit(1)).as("__n")) ++ numIdx.flatMap { case (_, i) =>
          val cts = col(centsName(i))
          Exact.momentAggsPre(cts, s"c$i", hiLo) ++
            Seq(min(cts).as(s"c${i}__mn"), max(cts).as(s"c${i}__mx"),
              count(cts).as(s"c${i}__cnt"))
        }
        val momSel = Seq(col("__n")) ++ numIdx.flatMap { case (_, i) =>
          Seq(Exact.s1Col(s"c$i", hiLo).as(s"c${i}__s1"),
            Exact.s2Col(s"c$i", hiLo).as(s"c${i}__s2"),
            col(s"c${i}__mn"), col(s"c${i}__mx"), col(s"c${i}__cnt"))
        }
        val mrow = pre.agg(momAggs.head, momAggs.tail: _*).select(momSel: _*).head()
        val rowsTotal = mrow.getLong(0)
        val ranges: Map[Int, (Long, Long)] = numIdx.flatMap { case (_, i) =>
          val mn = mrow.getAs[Any](s"c${i}__mn")
          val mx = mrow.getAs[Any](s"c${i}__mx")
          if (mn == null || mx == null) None
          else Some(i -> (mn.asInstanceOf[Long], mx.asInstanceOf[Long]))
        }.toMap

        def catEntry(f: org.apache.spark.sql.types.StructField, i: Int) =
          struct(lit(i).as("i"), lit(null).cast("long").as("bin"),
            col(f.name).cast("string").as("cat"),
            lit(null).cast("long").as("cents"))
        val entries = fields.zipWithIndex.map { case (f, i) =>
          if (f.dataType.isInstanceOf[NumericType]) {
            val cents = Exact.cents(col(f.name))
            val bin = ranges.get(i) match {
              case Some((mn, mx)) if BigInt(mx) - BigInt(mn) + 1 > FitHistMaxBuckets =>
                // bucket index in double space: boundary rounding at 1e18
                // magnitudes only shifts a bucket edge, never correctness
                val spanD = (BigInt(mx) - BigInt(mn) + 1).toDouble
                least(lit(FitHistMaxBuckets - 1L), greatest(lit(0L),
                  floor((cents.cast("double") - lit(mn.toDouble)) *
                    lit(FitHistMaxBuckets.toDouble / spanD)).cast("long")))
              case _ => cents // span fits (or column all-null): exact bins
            }
            struct(lit(i).as("i"), when(cents.isNotNull, bin).as("bin"),
              lit(null).cast("string").as("cat"), cents.as("cents"))
          } else catEntry(f, i)
        }.toSeq
        val st = df.select(explode(array(entries: _*)).as("e"))
          .groupBy(col("e.i").as("i"), col("e.bin").as("bin"), col("e.cat").as("cat"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("e.cents").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("cs"))
          .collect()
        val nf = numIdx.flatMap { case (_, i) =>
          val hist = st.filter(r => r.getInt(0) == i && !r.isNullAt(1))
            .map(r => (r.getLong(1), r.getLong(3), r.getDecimal(4))).sortBy(_._1)
          if (hist.isEmpty) None
          else {
            val nn = hist.map(_._2).sum
            val bucketed = ranges.get(i).exists { case (mn, mx) =>
              BigInt(mx) - BigInt(mn) + 1 > FitHistMaxBuckets }
            val values =
              if (bucketed) hist.map { case (_, cnt, cs) =>
                // weighted-mean knot: the bucket's exact decimal cents
                // sum over its count — the bootstrap half's expectation
                // telescopes to the source (cents) mean
                cs.doubleValue() / cnt / 100.0
              }.toArray
              else hist.map(_._1 / 100.0).toArray
              // identity bins: the bin IS the cents value — derive the
              // knot from it directly, bit-for-bit the pre-bucketing
              // fit (cs/cnt loses exactness once a bucket's cents sum
              // passes 2⁵³, even though cnt = bucket multiplicity)
            val cum = hist.map(_._2.toDouble).scanLeft(0.0)(_ + _).tail
              .map(_ / nn).toArray
            val s1 = mrow.getDecimal(mrow.fieldIndex(s"c${i}__s1"))
            val s2 = mrow.getDecimal(mrow.fieldIndex(s"c${i}__s2"))
            val cn = mrow.getLong(mrow.fieldIndex(s"c${i}__cnt"))
            val mu = Exact.meanDouble(s1, cn)
            val sdRaw = Exact.stdDouble(s1, s2, cn)
            val sigma = if (cn < 2 || sdRaw == 0.0 || sdRaw.isNaN) 1.0 else sdRaw
            val (cv, cc2) = capCdf(values, cum)
            Some(i -> NumFit(cv, cc2, mu, sigma))
          }
        }.toMap
        val cc = catIdx.map { case (_, i) =>
          i -> st.filter(_.getInt(0) == i)
            .map(r => (if (r.isNullAt(2)) null else r.getString(2), r.getLong(3))).toSeq
        }.toMap
        (rowsTotal, nf, cc)
      }

    val rows = if (n >= 0) n else sourceRows
    val base = spark.range(rows).select(col("id").as("__row_id"))
    val n2 = rows / 2

    fields.zipWithIndex.foldLeft(base) { case (acc, (f, i)) =>
      val c = f.name
      if (f.dataType.isInstanceOf[NumericType]) {
        numFits.get(i) match {
          case None =>
            // all-null source column → all-null synthesis (modules/privacy.py:40-42)
            acc.withColumn(c, lit(null).cast("double"))
          case Some(NumFit(values, cum, mu, sigma)) =>
          // Bootstrap half = iid draws from the empirical distribution,
          // realized as inverse-CDF over the fitted table (a bootstrap IS
          // iid empirical sampling; only the RNG mechanics differ, and V4
          // is seeded/rows-only by declared match mode). The search runs
          // as the native codegen'd `empirical_sample` expression — the
          // fit arrays ride along as plan references, no UDF boxing.
          graft.functions.GraftFunctions.ensureRegistered(spark)
          val sampleEmpirical = call_function("empirical_sample",
            rand(seed + i), typedlit(values), typedlit(cum))
          val gauss = randn(seed + 1000 + i) * sigma + mu
          acc.withColumn(c,
            when(col("__row_id") < n2, sampleEmpirical)
              .otherwise(gauss))
        }
      } else {
        // Inverse-CDF over the empirical PMF (nulls are a category, as in
        // the PMF the previous range-join consumed): cumulative bounds in
        // (count desc, value asc nulls first) order, compiled into a
        // when-chain for small vocabularies — no join at all.
        val cats = catCounts(i).toArray
          .sortBy { case (v, cnt) => (-cnt, v != null, v) } // nulls first among ties
        val total = cats.map(_._2).sum.toDouble
        if (cats.isEmpty) acc.withColumn(c, lit(null).cast(f.dataType))
        else if (cats.length > CatWhenChainMax) {
          // Large vocabularies (timestamps cast to string, near-unique
          // labels): a when-chain would nest one expression level PER
          // CATEGORY — thousands of levels overflow the analyzer stack
          // and defeat codegen. Instead sample the INDEX through the
          // native empirical_sample binary search (cum bounds identical
          // to the chain's [lo, hi) bins) and look the label up in a
          // broadcast literal array — O(log k) per row, depth O(1).
          graft.functions.GraftFunctions.ensureRegistered(spark)
          val cum = cats.map(_._2.toDouble / total).scanLeft(0.0)(_ + _).tail
          val idx = call_function("empirical_sample", rand(seed + 2000 + i),
            typedlit(cats.indices.map(_.toDouble)), typedlit(cum.toSeq))
            .cast("int")
          val nullIdx = cats.indexWhere(_._1 == null)
          val arr = typedlit(cats.map { case (v, _) => if (v == null) "" else v }.toSeq)
          val picked = element_at(arr, idx + 1)
          val out =
            if (nullIdx >= 0) when(idx === nullIdx, lit(null).cast("string")).otherwise(picked)
            else picked
          acc.withColumn(c, out.cast(f.dataType))
        }
        else {
          val cumHi = cats.map(_._2.toDouble / total).scanLeft(0.0)(_ + _).tail
          // u must be MATERIALIZED once per row before the when-chain: a
          // rand() instance referenced at k sites advances its RNG state at
          // each reference, which would skew the drawn distribution.
          val withU = acc.withColumn("__u", rand(seed + 2000 + i))
          val u = col("__u")
          val label = cats.zip(cumHi).zipWithIndex.foldLeft(lit(null).cast("string")) {
            case (elseExpr, (((v, _), hi), k)) =>
              val lo = if (k == 0) 0.0 else cumHi(k - 1)
              when(u >= lo && u < hi,
                if (v == null) lit(null).cast("string") else lit(v)).otherwise(elseExpr)
          }
          withU.withColumn(c, label.cast(f.dataType)).drop("__u")
        }
      }
    }.drop("__row_id")
  }

  /** The suggestion heuristic only asks "more than 50 / 20 distinct?" —
    * any saturation cap above both thresholds yields exact decisions. */
  private val SuggestDistinctCap = 64

  /** Vocabulary ceiling for the categorical inverse-CDF when-chain in
    * [[syntheticSample]] — beyond it the chain's per-category expression
    * nesting overflows the analyzer stack (and codegen), so sampling
    * switches to the index-lookup form. */
  private val CatWhenChainMax = 64

  /** V5 smart suggestion heuristic (`modules/privacy.py:55-68`): per
    * column, dtype + distinct-count dispatch into a suggested transform.
    *
    * The dispatch thresholds only need "distinct > 50 (numeric) / > 20
    * (string)?", never the exact cardinality — so the counts SATURATE at
    * [[SuggestDistinctCap]] (> both thresholds ⇒ identical decisions,
    * with a ~2⁻⁶⁴-per-pair hash-collision caveat that cannot flip a
    * threshold in practice). One narrow scan: xxhash64 per column inside
    * codegen, then a per-partition capped hash-set sweep over the raw
    * internal rows (the sanctioned use of the RDD layer: genuinely
    * imperative per-partition state). Every partition emits ≤ cap+1 longs
    * per column no matter the cardinality — a full count_distinct on ONE
    * high-cardinality column alone costs ~0.9 s at sf0.1 (the distinct
    * shuffle IS the cost), and a typed-Aggregator formulation pays ~1 µs
    * of encoder overhead per row; this form pays a hash-set insert.
    * Eager by design — the result is a driver-sized config. */
  def smartSuggest(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.toSeq
    // Only string/numeric columns influence a suggestion.
    val allCounted = fields.filter(f =>
      f.dataType == StringType || f.dataType.isInstanceOf[NumericType])
    def threshold(f: StructField): Long = if (f.dataType == StringType) 20L else 50L
    // Metadata fast path (r14): when the input is a pure parquet scan,
    // the `nunique > T` comparisons are usually PROVABLE from the footers'
    // dictionary metadata alone (graft.io.DictStats) — every proven column
    // skips the scan entirely; only the unprovable remainder pays the
    // capped hash-set sweep below. On the catalog fixtures every counted
    // column proves, so V5 runs with ZERO Spark jobs.
    val proven: Map[String, Boolean] =
      try graft.io.DictStats.distinctExceeds(df,
        allCounted.map(f => f.name -> threshold(f)).toMap)
      catch { case scala.util.control.NonFatal(_) => Map.empty }
    val counted = allCounted.filterNot(f => proven.contains(f.name))
    val cap = SuggestDistinctCap
    val k = counted.length
    val uniq: Map[String, Long] = (if (counted.isEmpty) Map.empty[String, Long]
      else {
        // Long.MinValue marks SQL NULL (excluded from distinct counts, as
        // nunique does); xxhash64 emitting it legitimately is a 2⁻⁶⁴ event.
        val hashed = df.select(counted.map(f =>
          when(col(f.name).isNull, lit(Long.MinValue))
            .otherwise(xxhash64(col(f.name))).as(f.name)): _*)
        // partial per (partition, column): Some(distinct hashes) or None
        // once saturated — ≤ cap+1 longs either way.
        val partials = hashed.queryExecution.toRdd
          .mapPartitions { iter =>
            val sets = Array.fill(k)(scala.collection.mutable.HashSet.empty[Long])
            val over = new Array[Boolean](k)
            iter.foreach { row =>
              var j = 0
              while (j < k) {
                if (!over(j)) {
                  val v = row.getLong(j)
                  if (v != Long.MinValue) {
                    val s = sets(j)
                    s.add(v)
                    if (s.size > cap) { over(j) = true; s.clear() }
                  }
                }
                j += 1
              }
            }
            Iterator.tabulate(k) { j =>
              j -> (if (over(j)) None else Some(sets(j).toArray))
            }
          }.collect()
        partials.groupBy(_._1).map { case (j, parts) =>
          val merged = scala.collection.mutable.HashSet.empty[Long]
          var over = false
          parts.foreach {
            case (_, Some(arr)) if !over =>
              arr.foreach { v =>
                merged.add(v)
                if (merged.size > cap) { over = true; merged.clear() }
              }
            case (_, None) => over = true
            case _ => ()
          }
          counted(j).name -> (if (over) cap + 1L else merged.size.toLong)
        }
      })
      .withDefaultValue(0L)
    val rows = fields.flatMap { f =>
      val isStr = f.dataType == StringType
      val isNum = f.dataType.isInstanceOf[NumericType]
      def exceeds = proven.getOrElse(f.name, uniq(f.name) > threshold(f))
      val suggestion: Option[String] =
        if (isStr) { if (exceeds) Some("sdc") else None }
        else if (isNum) { if (exceeds) Some("generalize+dp") else Some("dp") }
        else None
      suggestion.map(s =>
        (f.name, s, if (isNum) Some(1.0) else Option.empty[Double]))
    }
    import spark.implicits._
    // rows is already driver-local (the capped-distinct collect above) —
    // sort it HERE: an .orderBy on the LocalRelation would pay a range-
    // partitioning sample job plus a sort job (DevV5 measured them as
    // half of v5's 4-job budget) to order a ≤|columns|-row frame.
    rows.sortBy(_._1).toDF("column", "suggestion", "epsilon")
  }

  /** V8 (extension): k-anonymity assessment over a quasi-identifier set —
    * the standard SDC release gate the reference's risk step approximates
    * with k-NN. One hash aggregate over the quasi combination, then a
    * 4-field summary: the minimum group size (the dataset's k), group
    * count, and how many rows sit in groups below the requested k.
    * Null quasi values form their own groups (GROUP BY semantics, same
    * in every engine). Scale shape: one map-side-combinable shuffle on
    * the quasi columns; the summary aggregate is group-domain-sized. */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Int = 5): DataFrame = {
    val g = df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("c"))
    g.agg(
      min(col("c")).as("k_min"),
      count(lit(1)).as("n_groups"),
      coalesce(sum(when(col("c") < k, col("c")).otherwise(0L)), lit(0L)).as("n_rows_below_k"),
      (coalesce(sum(when(col("c") < k, col("c")).otherwise(0L)), lit(0L)).cast("double") * 100.0 /
        sum(col("c"))).as("pct_below_k"))
  }

  /** V9 (extension): distinct l-diversity — the minimum number of
    * distinct sensitive values within any quasi-identifier group (k-
    * anonymity's complement against homogeneity attacks). Same single-
    * shuffle shape with a count_distinct per group. */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count_distinct(col(sensitive)).as("l"))
      .agg(min(col("l")).as("l_min"), count(lit(1)).as("n_groups"))

  /** V10 (extension): t-closeness — the third release gate next to
    * [[kAnonymity]]/[[lDiversity]]: the worst total-variation distance
    * between any quasi group's sensitive-value distribution and the
    * global one (TV is the standard instantiation for unordered
    * categorical sensitive values; EMD reduces to it under the discrete
    * metric). A released table is t-close when the reported maximum ≤ t.
    *
    * Exactness: every |p_gv − p_v| term cross-multiplies to the integer
    * |c_gv·N − c_v·n_g|, absent categories contribute (N − Σ_{v∈g} c_v)/N,
    * and each group does ONE double division at the end — identical bits
    * in any engine, no float accumulation. Integer products stay in long
    * for row counts < ~3·10⁹ (the decimal form takes over past that).
    *
    * Plan shape: one map-side-combinable aggregate on (quasi, sensitive);
    * the marginals and the TV terms are windows over the grouped CELL
    * frame (|groups|·|V| rows, never data-sized). */
  def tCloseness(df: DataFrame, quasi: Seq[String], sensitive: String): DataFrame = {
    val cells = df
      .groupBy((quasi.map(col) :+
        coalesce(col(sensitive).cast("string"), lit("NA")).as("__v")): _*)
      .agg(count(lit(1)).as("c"))
    val wG = Window.partitionBy(quasi.map(col): _*)
    val wV = Window.partitionBy("__v")
    val wAll = Window.partitionBy()
    val term = abs(col("c") * col("N") - col("cv") * col("ng"))
    val perGroup = cells
      .withColumn("ng", sum("c").over(wG))
      .withColumn("cv", sum("c").over(wV))
      .withColumn("N", sum("c").over(wAll))
      .groupBy(quasi.map(col): _*)
      .agg(max("ng").as("ng"), max("N").as("N"),
        sum(term).as("s1"), sum("cv").as("s2"))
    val tv = (col("s1").cast("double") / (col("ng") * col("N")) +
      (col("N") - col("s2")).cast("double") / col("N")) * 0.5
    perGroup.agg(max(tv).as("t_max"), count(lit(1)).as("n_groups"))
  }

  /** V7 quasi-identifier suggestions (`modules/risk.py:8`): static list ∩
    * actual columns. */
  val QuasiIdSuggestions: Seq[String] =
    Seq("age", "gender", "zipcode", "pincode", "city", "state", "education", "income")

  def quasiSuggestions(df: DataFrame): Seq[String] =
    QuasiIdSuggestions.filter(df.columns.contains)

  /** One-scan fitted state for the whole protect pipeline: V5
    * suggestions, V1 rare-category sets, and V2 quantile edges are all
    * pure driver-side reads of the same collected buffers, so
    * suggest→suppress→generalize costs ONE fitting job instead of one
    * scan per operator (the round-2 verdict's fusion item). V4 keeps its
    * own fit because it must observe the TRANSFORMED frame (generalized
    * columns are labels by the time synthesis runs).
    *
    * Driver-fit regime only (ceiling [[DriverFitMaxCells]], same
    * auto-dispatch contract as [[syntheticSample]]) — beyond it,
    * [[GraftSession.protect]]'s per-operator distributed fits are each
    * scale-safe on their own and remain the 100 TB path. */
  final case class ProtectFit private[ops] (
      rows: Long,
      fields: Seq[StructField],
      numSorted: Map[String, Array[Double]],
      catCounts: Map[String, Map[String, Long]]) {

    /** Non-null distinct count. Numeric: uniques in the sorted buffer
      * (non-finites dropped by the collector — a ≤2-equivalence-class
      * divergence from [[smartSuggest]]'s hash sweep that cannot flip
      * the >50 threshold on finite data). */
    def distinctCount(c: String): Long =
      numSorted.get(c).map { arr =>
        var u = 0L; var i = 0
        while (i < arr.length) { if (i == 0 || arr(i) != arr(i - 1)) u += 1; i += 1 }
        u
      }.orElse(catCounts.get(c).map(_.keysIterator.count(_ != null).toLong))
        .getOrElse(0L)

    /** [[smartSuggest]]'s decisions from the fitted counts — identical
      * rules, identical output shape. */
    def suggestions: Seq[(String, String, Option[Double])] =
      fields.flatMap { f =>
        val u = distinctCount(f.name)
        val s: Option[String] =
          if (f.dataType == StringType) { if (u > 20) Some("sdc") else None }
          else if (f.dataType.isInstanceOf[NumericType])
            Some(if (u > 50) "generalize+dp" else "dp")
          else None
        s.map(x => (f.name, x,
          if (f.dataType.isInstanceOf[NumericType]) Some(1.0) else None))
      }

    /** V2 edges: exact interpolated quantiles over the sorted buffer —
      * the [[QuantileStrategy.DriverSort]] arithmetic verbatim. Empty
      * buffer (all-null column) → empty. */
    def quantileEdges(c: String, bins: Int): Seq[Double] = {
      val arr = numSorted.getOrElse(c, Array.empty[Double])
      if (arr.isEmpty) Seq.empty
      else (0 to bins).map { i =>
        val h = (i.toDouble / bins) * (arr.length - 1)
        val k = math.floor(h).toInt
        if (h == math.floor(h)) arr(k) else Exact.interp(arr(k), arr(k + 1), h - math.floor(h))
      }
    }

    /** V1 rare categories of a fitted string column: (non-null rare
      * values, whether the null group is rare). */
    def rareCategories(c: String, threshold: Long): (Set[String], Boolean) = {
      val m = catCounts.getOrElse(c, Map.empty)
      (m.collect { case (k, n) if k != null && n < threshold => k }.toSet,
        m.get(null) match { case Some(n) => n < threshold; case None => false })
    }
  }

  /** Build a [[ProtectFit]] with ONE fused scan (see class doc). */
  def protectFit(df: DataFrame): ProtectFit = {
    val fields = df.schema.fields.toSeq
    val numNames = fields.filter(_.dataType.isInstanceOf[NumericType]).map(_.name)
    val catNames = fields.filter(_.dataType == StringType).map(_.name)
    val (rows, numArrs, catMaps) = collectRawState(df, numNames, catNames)
    ProtectFit(rows, fields, numArrs, catMaps)
  }

  /** V1 with a PRE-FITTED rare set (from [[ProtectFit]]): the suppress
    * pass is a pure codegen when-chain — no counting job, no join. */
  def sdcSuppressFitted(df: DataFrame, c: String,
                        rare: Set[String], nullRare: Boolean): DataFrame = {
    val isRare =
      (if (nullRare) col(c).isNull else lit(false)) ||
        (if (rare.nonEmpty) col(c).isInCollection(rare) else lit(false))
    df.withColumn(c, when(isRare, lit("OTHER")).otherwise(col(c)))
  }

  /** V2 with PRE-FITTED raw quantile edges: duplicate-merge and
    * degenerate-domain semantics identical to [[generalizeNumeric]]. */
  def generalizeFitted(df: DataFrame, c: String, raw: Seq[Double]): DataFrame = {
    if (raw.isEmpty || raw.exists(_.isNaN))
      return df.withColumn(c, lit(null).cast("string"))
    val edges = raw.distinct
    if (edges.length < 2) df.withColumn(c, lit(null).cast("string"))
    else df.withColumn(c, labelExpr(col(c), edges))
  }
}
