package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the learned sibling of the
  * Gopher heuristic rules (the CCNet/fastText-classifier role in a
  * training-data pipeline): fit a logistic regression from
  * hashing-trick term-count features to the heuristic verdict, then
  * score every document with a calibrated pass probability. The model
  * generalizes the hard rules into a smooth score usable as a mixing /
  * curriculum signal, and — in the real pipeline — transfers to corpora
  * where the rule thresholds were never tuned.
  *
  * Scale shape: the label pass and the feature pass are both stateless
  * codegen scans. The LBFGS fit runs over a BOUNDED deterministic hash
  * sample (≤ [[FitSampleCap]] rows — the PQ-codebook idiom): below the
  * cap the sample is the corpus, above it a hash gate on the id keeps a
  * fixed-size, partition-invariant subset, and only that sample is
  * repartitioned down to a few fat partitions (each LBFGS iteration is
  * a treeAggregate job, so task count, not data size, dominates the fit
  * at sample scale). Scoring then applies the fitted coefficient vector
  * — constant-size driver state riding the task closure — as ONE
  * stateless projection over the FULL corpus at its natural
  * parallelism: the corpus is never coalesced, cached, or shuffled by
  * this operator, so scoring survives any corpus size the scan
  * survives.
  *
  * Declared prop mode (SURVEY §2 contract): MLlib's optimizer output is
  * not SQL-expressible — QualityModelSpec pins that training accuracy
  * beats the label base rate, probabilities are calibrated to [0,1],
  * scoring is deterministic within a session, and the scoring stage's
  * partition count tracks the input (the no-corpus-funnel guarantee). */
object QualityModel {

  /** Fit-sample ceiling: enough rows to saturate a dim=64 linear model
    * by orders of magnitude, small enough that the sample-side
    * repartition is always a trivial shuffle. */
  private val FitSampleCap = 65536L

  def qualityClassifier(df: DataFrame, textCol: String, idCol: String,
                        dim: Int = 64): DataFrame =
    scored(df, textCol, idCol, dim).orderBy(col(idCol))

  /** The unsorted scoring plan behind [[qualityClassifier]] — exposed so
    * the spec can assert on the partitioning of the stage that actually
    * scores (the public form's orderBy necessarily ends in a range
    * exchange). */
  private[graft] def scored(df: DataFrame, textCol: String, idCol: String,
                            dim: Int = 64): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    def dataOver(src: DataFrame): DataFrame = {
      val labels = graft.ext.TextStats.gopherRules(src, textCol, idCol)
        .select(col(idCol), col("passes").cast("double").as("label"))
      val feats = src.select(col(idCol),
        graft.ext.TextStats.hashEmbedVec(col(textCol), dim)
          .cast("array<double>").as("arr"))
      feats.join(labels, idCol)
        .withColumn("features", array_to_vector(col("arr")))
    }
    // FIT input stays on the un-widened frame: the sample's physical
    // placement feeds LBFGS's float-sum order, so widening it would
    // perturb coefficients in the last ulps for no model-quality gain.
    // SCORING is a stateless per-row projection — identical values under
    // any partitioning — so it reads the widened frame: the gopher-rule
    // + hash-embed kernels were measured serializing on ONE core behind
    // the single-split bench corpus scan (~0.8 s of the row's 2.8 s;
    // Par.widen is a no-op on a real multi-split corpus).
    val data = dataOver(df)
    // Row count for the fit-sample fraction comes from the INPUT frame,
    // never from `data`: the join is inner 1:1 on the id (labels derive
    // from the same rows), so the counts are equal — and for the common
    // parquet-scan input the count is read from row-group footers
    // driver-side (ScanStats — no job), while the earlier `data.count()`
    // executed the hash-embed + gopher-rules join over the whole corpus
    // once per scoring run just to pick a fraction. A CBO row estimate
    // is trusted ONLY when it exceeds the cap — there it merely sets the
    // sample fraction, where slack is tolerable. An estimate AT OR BELOW
    // the cap would skip sampling entirely, and a stale catalog stat on
    // a corpus that has since grown would then fit on the full frame —
    // the exact full-corpus funnel this operator forbids — so the
    // small-side decision requires an exact count (parquet footers when
    // the plan is a pure scan, a zero-column count job otherwise).
    // Precedence: footer count FIRST — it is exact and costs
    // milliseconds, so when the plan is a pure scan the CBO estimate
    // must never override it (a stale-HIGH catalog stat on a corpus
    // that has since shrunk would otherwise shrink the sample fraction
    // and silently under-sample the fit). CBO breaks ties only for
    // non-scan plans, and only on the above-cap side where slack is
    // tolerable.
    val cboRows = df.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong)
    val n = graft.io.ScanStats.parquetScanRowCount(df)
      .orElse(cboRows.filter(_ > FitSampleCap))
      .getOrElse(df.count())
    // Deterministic hash sample for the fit (never the scoring): the
    // gate is a pure function of the id, so the sample — and therefore
    // the model — is identical under any partitioning. repartition (a
    // real exchange), NOT coalesce: coalesce is narrow, so it would pull
    // the upstream join itself into 4 tasks — the full-corpus funnel
    // this operator must never create.
    def sampled(cap: Long) =
      (if (n <= cap) data
       else data.filter(pmod(xxhash64(col(idCol)), lit(1000000L)) <
         lit(math.max(1L, (cap.toDouble / n * 1e6).toLong)))
      ).repartition(4).cache()
    var fitData = sampled(FitSampleCap)
    try {
      var classes = fitData.select(count_distinct(col("label"))).head().getLong(0)
      if (classes < 2 && n > FitSampleCap) {
        // The SAMPLE is single-class but the corpus may not be: a rare
        // minority class can miss a ≤65536-row sample entirely, and
        // silently downgrading a healthy corpus to the heuristic echo
        // would be wrong. One retry at 16× the cap (still bounded)
        // recovers any minority class down to ~1-in-10⁴ prevalence;
        // only then does the degenerate path engage, loudly.
        fitData.unpersist()
        fitData = sampled(FitSampleCap * 16)
        classes = fitData.select(count_distinct(col("label"))).head().getLong(0)
        if (classes < 2)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"qualityClassifier: fit sample single-class at ${FitSampleCap * 16} " +
              "rows — scoring degrades to the heuristic echo (p_pass ∈ {0,1})")
      }
      val scoreData = dataOver(graft.ops.Par.widen(df))
      if (classes < 2)
        // degenerate corpus (all-pass or all-fail in the fit sample):
        // the heuristic IS the classifier — echo it with probability
        // 0/1, same schema, still over the full corpus
        return scoreData.select(col(idCol), col("label"),
          col("label").as("p_pass"), col("label").as("prediction"))
      val model = new LogisticRegression()
        .setMaxIter(100).setTol(1e-4).fit(fitData)
      // transform = broadcast-coefficient stateless projection: adds
      // columns to the scoring frame without repartitioning it
      model.transform(scoreData)
        .select(col(idCol), col("label"),
          vector_to_array(col("probability")).getItem(1).as("p_pass"),
          col("prediction"))
    } finally fitData.unpersist()
  }
}
