package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Anonymization operators (SURVEY.md §2.5 V1–V5, V7) — the reference
  * engine's signature capability (`modules/privacy.py`).
  *
  * Everything is a lazy Column-expression plan: a full Protect chain
  * (suppress → generalize → noise) fuses into one whole-stage-codegen pass
  * plus at most one shuffle per suppressed column — vs the reference's full
  * table copy per stage (`modules/privacy.py:5,14,25`).
  */
object Privacy {

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
  def generalizeNumeric(df: DataFrame, c: String, bins: Int = 10,
                        centsHistogram: Boolean = true): DataFrame = {
    val probs = (0 to bins).map(i => i.toDouble / bins)
    // Exact edges either from the cents histogram (≤2-decimal data — all
    // harness money columns; far cheaper at scale since only the crossing
    // bins reach the driver) or the sort-based percentile aggregate
    // (general doubles). Both match quantile_cont bitwise.
    val raw: Seq[Double] =
      if (centsHistogram) Exact.quantilesViaCentsHistogramDistributed(df, c, probs)
      else df.agg(expr(s"percentile($c, array(${probs.mkString("D,")}D))").as("q"))
        .head().getSeq[Double](0)
    if (raw.exists(_.isNaN)) return df.withColumn(c, lit(null).cast("string"))
    val edges = raw.distinct
    if (edges.length < 2) return df.withColumn(c, lit(null).cast("string"))
    val labeled = labelExpr(col(c), edges)
    df.withColumn(c, labeled)
  }

  /** [[generalizeNumeric]] with the quantile strategy chosen from the DATA:
    * the cents-histogram path only when the column verifiably round-trips
    * through DECIMAL(18,2) (≤2 decimals, no overflow) — one cheap scan —
    * otherwise the general sort-based percentile. This is the entry point
    * the user-facing pipeline uses: arbitrary CSV columns with >2 decimal
    * places or |x| ≥ ~1e16 must not be binned on cents-rounded values. */
  def generalizeNumericAuto(df: DataFrame, c: String, bins: Int = 10): DataFrame =
    generalizeNumeric(df, c, bins, centsHistogram = Exact.centsEligible(df, c))

  /** when-chain mapping a value into its `[lo, hi)` label (last bin
    * closed). Kept separate so tests can exercise edge semantics. */
  def labelExpr(v: Column, edges: Seq[Double]): Column = {
    val pairs = edges.zip(edges.tail)
    val lastIdx = pairs.length - 1
    pairs.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((lo, hi), i)) =>
        val in =
          if (i == lastIdx) v >= lo && v <= hi
          else v >= lo && v < hi
        when(in, format_string("[%.2f, %s", lit(lo),
          format_string(if (i == lastIdx) "%.2f]" else "%.2f)", lit(hi))))
          .otherwise(acc)
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
  def syntheticSample(df: DataFrame, cols: Seq[String], n: Long = -1L,
                      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.filter(f => cols.contains(f.name))

    // ONE stats job fits every column: each source row explodes into a
    // row-counter entry plus one (colIdx, cents-bin | category) entry per
    // synthesized column; a single map-side-combinable aggregate then
    // yields row count, every numeric cents histogram (μ/σ derive from it
    // exactly), and every categorical PMF. The fused pass replaces the
    // previous count + moments + per-column histogram/PMF jobs (~5 jobs →
    // 1) — at 100 TB, one scan instead of k+2.
    val counterEntry = struct(lit(-1).as("i"), lit(0L).as("bin"),
      lit(null).cast("string").as("cat"))
    val colEntries = fields.zipWithIndex.map { case (f, i) =>
      if (f.dataType.isInstanceOf[NumericType])
        struct(lit(i).as("i"), Exact.cents(col(f.name)).as("bin"),
          lit(null).cast("string").as("cat"))
      else
        struct(lit(i).as("i"), lit(null).cast("long").as("bin"),
          col(f.name).cast("string").as("cat"))
    }
    val stats = df.select(explode(array(counterEntry +: colEntries: _*)).as("e"))
      .groupBy(col("e.i").as("i"), col("e.bin").as("bin"), col("e.cat").as("cat"))
      .agg(count(lit(1)).as("cnt"))
      .collect()

    val sourceRows = stats.collectFirst {
      case r if r.getInt(0) == -1 => r.getLong(3)
    }.getOrElse(0L)
    val rows = if (n >= 0) n else sourceRows
    val base = spark.range(rows).select(col("id").as("__row_id"))
    val n2 = rows / 2

    fields.zipWithIndex.foldLeft(base) { case (acc, (f, i)) =>
      val c = f.name
      if (f.dataType.isInstanceOf[NumericType]) {
        // Histogram of exact cents (nulls excluded), sorted by bin.
        val hist = stats.filter(r => r.getInt(0) == i && !r.isNullAt(1))
          .map(r => (r.getLong(1), r.getLong(3))).sortBy(_._1)
        if (hist.isEmpty) {
          // all-null source column → all-null synthesis (modules/privacy.py:40-42)
          acc.withColumn(c, lit(null).cast("double"))
        } else {
          // μ/σ from the exact moments of the same histogram (identical to
          // Profile.muSigma: sample std with the reference's `or 1.0`
          // fallback for constant / single-value columns).
          val nn = hist.map(_._2).sum
          val s1 = hist.foldLeft(java.math.BigDecimal.ZERO) { case (a, (b, cnt)) =>
            a.add(java.math.BigDecimal.valueOf(b).multiply(java.math.BigDecimal.valueOf(cnt)))
          }
          val s2 = hist.foldLeft(java.math.BigDecimal.ZERO) { case (a, (b, cnt)) =>
            a.add(java.math.BigDecimal.valueOf(b).multiply(java.math.BigDecimal.valueOf(b))
              .multiply(java.math.BigDecimal.valueOf(cnt)))
          }
          val mu = Exact.meanDouble(s1, nn)
          val sdRaw = Exact.stdDouble(s1, s2, nn)
          val sigma = if (nn < 2 || sdRaw == 0.0 || sdRaw.isNaN) 1.0 else sdRaw

          // Bootstrap half = iid draws from the empirical distribution,
          // realized as inverse-CDF over the broadcast histogram (a
          // bootstrap IS iid empirical sampling; only the RNG mechanics
          // differ, and V4 is seeded/rows-only by declared match mode).
          // The binary search is the one UDF in the engine, used exactly
          // where per-row access to broadcast state has no expression form.
          val values: Array[Double] = hist.map(_._1 / 100.0)
          val cum: Array[Double] = {
            val total = nn.toDouble
            hist.map(_._2.toDouble).scanLeft(0.0)(_ + _).tail.map(_ / total)
          }
          val bv = spark.sparkContext.broadcast((values, cum))
          val sampleEmpirical = udf { (u: Double) =>
            val (vs, cm) = bv.value
            val j = java.util.Arrays.binarySearch(cm, u)
            val idx = math.min(if (j >= 0) j else -j - 1, vs.length - 1)
            vs(idx)
          }
          val gauss = randn(seed + 1000 + i) * sigma + mu
          acc.withColumn(c,
            when(col("__row_id") < n2, sampleEmpirical(rand(seed + i)))
              .otherwise(gauss))
        }
      } else {
        // Inverse-CDF over the empirical PMF (nulls are a category, as in
        // the PMF the previous range-join consumed): cumulative bounds in
        // (count desc, value asc nulls first) order, compiled into a
        // when-chain for small vocabularies — no join at all.
        val cats = stats.filter(_.getInt(0) == i)
          .map(r => (if (r.isNullAt(2)) null else r.getString(2), r.getLong(3)))
          .sortBy { case (v, cnt) => (-cnt, v != null, v) } // nulls first among ties
        val total = cats.map(_._2).sum.toDouble
        if (cats.isEmpty) acc.withColumn(c, lit(null).cast(f.dataType))
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

  /** V5 smart suggestion heuristic (`modules/privacy.py:55-68`): per
    * column, dtype + distinct-count dispatch into a suggested transform.
    *
    * All distinct counts come from ONE job: each row explodes into
    * (column, value-as-string) pairs — string casts are injective for
    * every testdata type, so distinct counts are unchanged — then a
    * map-side-combinable two-level aggregate (distinct pairs, then count
    * per column). One scan and one shuffle of the DISTINCT pairs instead
    * of k scans (or an Expand at k× the row count). Eager by design —
    * the result is a driver-sized config. */
  def smartSuggest(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.toSeq
    // Only string/numeric columns influence a suggestion — don't haul
    // other types (binary blobs, arrays) through the explode.
    val counted = fields.filter(f =>
      f.dataType == StringType || f.dataType.isInstanceOf[NumericType])
    val uniq: Map[String, Long] = (if (counted.isEmpty) Map.empty[String, Long]
      else df.select(explode(array(counted.map(f =>
          struct(lit(f.name).as("c"), col(f.name).cast("string").as("v"))): _*)).as("p"))
        .select(col("p.c").as("c"), col("p.v").as("v"))
        .filter(col("v").isNotNull)
        .groupBy("c", "v").agg(count(lit(1)))
        .groupBy("c").agg(count(lit(1)).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      .withDefaultValue(0L)
    val rows = fields.flatMap { f =>
      val u = uniq(f.name)
      val isStr = f.dataType == StringType
      val isNum = f.dataType.isInstanceOf[NumericType]
      val suggestion: Option[String] =
        if (isStr) { if (u > 20) Some("sdc") else None }
        else if (isNum) { if (u > 50) Some("generalize+dp") else Some("dp") }
        else None
      suggestion.map(s =>
        (f.name, s, if (isNum) Some(1.0) else Option.empty[Double]))
    }
    import spark.implicits._
    rows.toDF("column", "suggestion", "epsilon").orderBy(col("column"))
  }

  /** V7 quasi-identifier suggestions (`modules/risk.py:8`): static list ∩
    * actual columns. */
  val QuasiIdSuggestions: Seq[String] =
    Seq("age", "gender", "zipcode", "pincode", "city", "state", "education", "income")

  def quasiSuggestions(df: DataFrame): Seq[String] =
    QuasiIdSuggestions.filter(df.columns.contains)
}
