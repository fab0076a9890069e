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
  * codegen scans; the LBFGS fit is O(iterations) treeAggregate rounds
  * over dim-sized gradient vectors (dim = 64 here — constant-size driver
  * state); scoring broadcasts the coefficient vector into one stateless
  * projection. Nothing in fit or transform shuffles the corpus itself,
  * so the operator survives any corpus size the scan survives.
  *
  * Declared prop mode (SURVEY §2 contract): MLlib's optimizer output is
  * not SQL-expressible — QualityModelSpec pins that training accuracy
  * beats the label base rate, probabilities are calibrated to [0,1],
  * and scoring is deterministic within a session. */
object QualityModel {

  def qualityClassifier(df: DataFrame, textCol: String, idCol: String,
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
      // few fat partitions: each LBFGS iteration is a treeAggregate job,
      // so task count, not data size, dominates at spec scale (same
      // rationale as UtilityCheck.evalOne)
      .coalesce(4)
      .cache()
    try {
      val classes = data.select(count_distinct(col("label"))).head().getLong(0)
      if (classes < 2)
        // degenerate corpus (all-pass or all-fail): the heuristic IS the
        // classifier — echo it with probability 0/1, same schema
        return data.select(col(idCol), col("label"),
          col("label").as("p_pass"), col("label").as("prediction"))
          .orderBy(col(idCol))
      val model = new LogisticRegression()
        .setMaxIter(100).setTol(1e-4).fit(data)
      model.transform(data)
        .select(col(idCol), col("label"),
          vector_to_array(col("probability")).getItem(1).as("p_pass"),
          col("prediction"))
        .orderBy(col(idCol))
    } finally data.unpersist()
  }
}
