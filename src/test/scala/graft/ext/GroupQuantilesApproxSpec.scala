package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Rank-error envelope for the sketch-based group-quantile twin: every
  * approx quantile must be an actual sample whose empirical rank inside
  * its group sits within the QuantileSummaries error bound of the target
  * rank. This is the contract the declared (rows-only) catalog entry
  * rides on — the oracle can't express sketch output, the spec can. */
class GroupQuantilesApproxSpec extends SparkSpec {

  test("approx group quantiles stay within rank tolerance of exact") {
    val dir = Sf
    val base = graft.Tables.documents(spark, dir)
      .select(col("lang"), size(split(col("text"), " ")).cast("double").as("n"))
      .cache()
    try {
      val approx = SparkEntry.queries("x_group_quantiles_approx")(spark, dir)
        .collect().map(r => r.getString(0) ->
          Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(approx.nonEmpty)
      val targets = Seq(0.25, 0.5, 0.75)
      approx.foreach { case (lang, qs) =>
        // ordered output is part of the contract
        assert(qs(0) <= qs(1) && qs(1) <= qs(2), s"$lang quantiles unordered: $qs")
        val grp = base.filter(col("lang") === lang)
        val total = grp.count().toDouble
        targets.zip(qs).foreach { case (p, v) =>
          val below = grp.filter(col("n") <= v).count().toDouble
          val above = grp.filter(col("n") >= v).count().toDouble
          // v's attainable rank interval [1 - above/total, below/total]
          // must overlap [p - eps, p + eps]; accuracy 10000 → eps 1e-4,
          // widened to 1e-2 so tiny sf0.001 groups (rank granularity
          // 1/|group|) don't flake.
          val eps = 0.01 + 1.0 / total
          assert(1.0 - above / total <= p + eps && below / total >= p - eps,
            s"$lang p$p=$v rank window [${1.0 - above / total}, ${below / total}] misses $p±$eps")
        }
      }
    } finally base.unpersist()
  }
}
