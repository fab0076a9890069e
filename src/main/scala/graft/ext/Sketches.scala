package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the 100 TB summary path where even the
  * grouped result is too big or too re-aggregated to keep exact.
  * Sketches shuffle O(sketch bytes) per group instead of O(domain), and
  * re-aggregate WITHOUT rescanning data: yesterday's sketches merge with
  * today's in one tiny pass — the property exact counts fundamentally
  * lack. Both operators are approximate by declaration (rows-only match;
  * specs pin the error envelopes against the exact siblings).
  */
object Sketches {

  /** Count-min-sketch token-frequency estimates for the exact top-`k`
    * vocabulary ([[TextStats.vocabTopK]] is the exact sibling): ONE
    * mergeable sketch summarizes the whole token stream, then the
    * (driver-sized) top-k list is estimated against it. Output
    * (token, n_exact, n_est); CMS never under-estimates, so
    * n_est ≥ n_exact always.
    *
    * Scale shape: the sketch aggregate is a constant-size buffer
    * (⌈e/eps⌉ × ⌈ln(1/δ)⌉ longs) combined map-side — the corpus shuffles
    * ONE sketch per partition regardless of vocabulary size. The exact
    * top-k side exists here for the comparison; a pure monitoring
    * pipeline would ship only the sketch. */
  def vocabCms(df: DataFrame, textCol: String, k: Int,
               eps: Double = 0.0001, confidence: Double = 0.99,
               seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(
      explode(regexp_extract_all(lower(col(textCol)),
        lit(TextStats.BpeTokenPattern), lit(0))).as("token"))
    val bytes = toks
      .agg(count_min_sketch(col("token"), lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exact = TextStats.vocabTopK(df, textCol, k).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    exact.toSeq.map { case (t, n) => (t, n, cms.estimateCount(t)) }
      .toDF("token", "n_exact", "n_est")
  }

  /** Per-group distinct-count estimates from DataSketches HLL, plus an
    * `__ALL__` row whose estimate comes from MERGING the per-group
    * sketches — never from rescanning the data. That union step is the
    * point: partition/day/source-level sketches roll up to any coarser
    * grain for free, which is how a 100 TB profile stays incremental.
    * Output (group, n_distinct_est, is_total): the merged row carries
    * group = "__ALL__" AND is_total = true — the flag, not the label,
    * is the contract (a real group VALUE spelled "__ALL__" stays
    * distinguishable), and the (is_total, group) sort GUARANTEES the
    * union row last (a bare union after orderBy only happens to
    * concatenate that way). */
  def distinctSketchMerge(df: DataFrame, keyCol: String, groupCol: String,
                          lgK: Int = 12): DataFrame = {
    val perGroup = df
      .groupBy(col(groupCol).cast("string").as("group"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sk"))
    val union = perGroup
      .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
      .select(lit("__ALL__").as("group"), col("sk"))
    perGroup.select(col("group"),
        round(hll_sketch_estimate(col("sk"))).cast("long").as("n_distinct_est"),
        lit(false).as("is_total"))
      .unionAll(union.select(col("group"),
        round(hll_sketch_estimate(col("sk"))).cast("long").as("n_distinct_est"),
        lit(true).as("is_total")))
      .orderBy("is_total", "group")
  }
}
