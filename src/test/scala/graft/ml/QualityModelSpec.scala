package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Prop-mode contract for the learned quality filter: the declared
  * (rows-only) catalog entry rides on these properties, since an MLlib
  * fit has no SQL-oracle form. */
class QualityModelSpec extends SparkSpec {

  test("quality classifier beats the label base rate and is calibrated") {
    val docs = Tables.documents(spark, Sf)
    val out = QualityModel.qualityClassifier(docs, "text", "doc_id").cache()
    try {
      val n = out.count()
      assert(n == docs.count(), "one scored row per document")
      // probabilities are probabilities
      assert(out.filter(col("p_pass") < 0.0 || col("p_pass") > 1.0).count() == 0)
      val agg = out.agg(
        avg(col("label")).as("base"),
        avg((col("prediction") === col("label")).cast("double")).as("acc"))
        .head()
      val base = agg.getDouble(0)
      val acc = agg.getDouble(1)
      // accuracy must beat always-guess-majority-class on the TRAIN set
      // (a linear model over term counts that can't out-fit the constant
      // predictor has learned nothing)
      val majority = math.max(base, 1.0 - base)
      assert(acc >= majority,
        s"train accuracy $acc below majority-class rate $majority")
      // in-session determinism: same fit, same scores
      val again = QualityModel.qualityClassifier(docs, "text", "doc_id")
      val diff = out.select(col("doc_id"), col("p_pass").as("p1"))
        .join(again.select(col("doc_id"), col("p_pass").as("p2")), "doc_id")
        .filter(col("p1") =!= col("p2")).count()
      assert(diff == 0, s"$diff docs scored differently on refit")
    } finally out.unpersist()
  }

  test("scoring runs at input parallelism — the corpus is never funneled") {
    // Regression for the full-corpus coalesce(4): only the bounded fit
    // sample may run on few fat partitions; the SCORING stage must keep
    // the corpus's own parallelism. AQE off + no auto-broadcast so the
    // join's partition count is deterministic for the assertion.
    val conf = spark.conf
    val aqe0 = conf.get("spark.sql.adaptive.enabled")
    val sp0 = conf.get("spark.sql.shuffle.partitions")
    val bc0 = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", "11")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.documents(spark, Sf).repartition(13)
      val out = QualityModel.scored(docs, "text", "doc_id")
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Coalesce"), s"corpus coalesced in scoring plan:\n$plan")
      val parts = out.rdd.getNumPartitions
      // 11 (shuffle join) or 13 (broadcast-join streamed side) — the
      // old funnel gave 4 here regardless of input
      assert(parts >= 11, s"scoring ran at $parts partitions for a 13-partition input")
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe0)
      conf.set("spark.sql.shuffle.partitions", sp0)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bc0)
    }
  }

  test("degenerate single-class corpus echoes the heuristic verdict") {
    import spark.implicits._
    // texts engineered to all FAIL the word-count rule → one class
    val df = Seq((1L, "too short"), (2L, "also short")).toDF("doc_id", "text")
    val out = QualityModel.qualityClassifier(df, "text", "doc_id").collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0))
  }
}
