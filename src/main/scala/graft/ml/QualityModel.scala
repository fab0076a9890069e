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
    val labels = graft.ext.TextStats.gopherRules(df, textCol, idCol)
      .select(col(idCol), col("passes").cast("double").as("label"))
    val feats = df.select(col(idCol),
      graft.ext.TextStats.hashEmbedVec(col(textCol), dim)
        .cast("array<double>").as("arr"))
    val data = feats.join(labels, idCol)
      .withColumn("features", array_to_vector(col("arr")))
    val n = data.count()
    // Deterministic hash sample for the fit (never the scoring): the
    // gate is a pure function of the id, so the sample — and therefore
    // the model — is identical under any partitioning. repartition (a
    // real exchange), NOT coalesce: coalesce is narrow, so it would pull
    // the upstream join itself into 4 tasks — the full-corpus funnel
    // this operator must never create.
    val fitData = (
      if (n <= FitSampleCap) data
      else data.filter(pmod(xxhash64(col(idCol)), lit(1000000L)) <
        lit(math.max(1L, (FitSampleCap.toDouble / n * 1e6).toLong)))
    ).repartition(4).cache()
    try {
      val classes = fitData.select(count_distinct(col("label"))).head().getLong(0)
      if (classes < 2)
        // degenerate corpus (all-pass or all-fail in the fit sample):
        // the heuristic IS the classifier — echo it with probability
        // 0/1, same schema, still over the full corpus
        return data.select(col(idCol), col("label"),
          col("label").as("p_pass"), col("label").as("prediction"))
      val model = new LogisticRegression()
        .setMaxIter(100).setTol(1e-4).fit(fitData)
      // transform = broadcast-coefficient stateless projection: adds
      // columns to `data` without repartitioning it
      model.transform(data)
        .select(col(idCol), col("label"),
          vector_to_array(col("probability")).getItem(1).as("p_pass"),
          col("prediction"))
    } finally fitData.unpersist()
  }
}
