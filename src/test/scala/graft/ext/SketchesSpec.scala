package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("vocabCms: estimates never under-count and stay within the eps envelope") {
    val docs = graft.Tables.documents(spark, Sf)
    val rows = Sketches.vocabCms(docs, "text", 30).collect()
    assert(rows.length == 30)
    // total token count bounds the CMS additive error: est ≤ exact + eps·N
    val totalTokens = docs.select(
      sum(size(regexp_extract_all(lower(col("text")),
        lit(TextStats.BpeTokenPattern), lit(0))))).head.getLong(0)
    val slack = (0.0001 * totalTokens).ceil.toLong
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS must never under-estimate: ${r.getString(0)}")
      assert(est <= exact + slack,
        s"estimate ${est} exceeds exact ${exact} + eps·N ${slack} for ${r.getString(0)}")
    }
  }

  test("vocabCms: fixed seed reproduces identical estimates") {
    val docs = graft.Tables.documents(spark, Sf).limit(100)
    val a = Sketches.vocabCms(docs, "text", 10).collect().map(_.toSeq)
    val b = Sketches.vocabCms(docs, "text", 10).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("distinctSketchMerge: per-group and merged estimates within HLL error of exact") {
    val docs = graft.Tables.documents(spark, Sf)
    val est = Sketches.distinctSketchMerge(docs, "text", "source").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactPerGroup = docs.groupBy("source")
      .agg(count_distinct(col("text")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = docs.select(count_distinct(col("text"))).head.getLong(0)
    // lgK=12 → relative standard error ≈ 1.04/√2¹² ≈ 1.6%; allow 5σ
    def close(e: Long, x: Long) = math.abs(e - x) <= math.max(2.0, 0.081 * x)
    exactPerGroup.foreach { case (g, x) =>
      assert(close(est(g), x), s"group $g: est ${est(g)} vs exact $x")
    }
    assert(close(est("__ALL__"), exactAll),
      s"merged estimate ${est("__ALL__")} vs exact $exactAll")
    // the union row must come from sketch MERGE, not a rescan: within the
    // union's own error it is bounded by the sum of the per-group
    // estimates, and at least the largest group
    val sumEst = exactPerGroup.keys.toSeq.map(est).sum
    assert(est("__ALL__") <= (sumEst * 1.05).toLong + 2,
      s"union ${est("__ALL__")} far exceeds Σ per-group $sumEst")
    assert(est("__ALL__") >= exactPerGroup.keys.toSeq.map(est).max)
  }
}
