package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Two-table statistical drift operators (SURVEY.md §2.4 D1–D3; reference
  * `modules/utility.py:92-123`).
  *
  * Determinism note: every metric here reduces doubles that were derived
  * from exact integer counts. D1's cumulative CDFs are pure Long
  * arithmetic (partition-invariant); D2's double term-sum runs through an
  * ORDERED running-sum window over the few categories, so its
  * floating-point addition order is fixed and identical to the oracle's.
  */
object Drift {

  /** D1 two-sample Kolmogorov–Smirnov statistic on a numeric column:
    * D = max over all sample points of |F₁(x) − F₂(x)|, the exact
    * `scipy.ks_2samp(...).statistic` semantics; null if either side has
    * fewer than 5 non-null rows (`modules/utility.py:95-96`).
    *
    * Plan (scale-safe, no single-task window): tag + union both sides,
    * count per (value, side) — ONE shuffle — then range-partition the
    * distinct values and compute the cumulative CDF in TWO parallel
    * passes: per-bucket cumulative counts (window partitioned by bucket)
    * plus broadcast per-bucket prefix offsets from a ≤`buckets`-row
    * aggregate. All cumulative arithmetic is exact integer counts, so the
    * result is bitwise-identical to a global ordered window while every
    * O(|distinct|) stage runs on all cores. A continuous column at 100×
    * scale (|distinct| ≈ n) stays parallel end-to-end; the only
    * single-partition window left touches ≤`buckets` rows.
    */
  def ksStatistic(before: DataFrame, after: DataFrame, c: String,
                  buckets: Int = 32): DataFrame = {
    val a = before.select(col(c).cast("double").as("v"))
      .na.drop().withColumn("ca", lit(1L)).withColumn("cb", lit(0L))
    val b = after.select(col(c).cast("double").as("v"))
      .na.drop().withColumn("ca", lit(0L)).withColumn("cb", lit(1L))
    val counts = a.union(b).groupBy("v")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    // Contiguous value ranges → bucket id; ties land in one bucket by
    // construction (range partitioner keys on v). Bucket boundaries vary
    // with sampling, but offsets make the CDF independent of placement.
    val parts = counts.repartitionByRange(buckets, col("v"))
      .withColumn("bucket", spark_partition_id())
    val wBkt = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val wAllB = Window.partitionBy()
    // ≤`buckets` rows: the one single-partition window in the plan.
    val offsets = parts.groupBy("bucket").agg(sum("na").as("sa"), sum("nb").as("sb"))
      .withColumn("offa", coalesce(sum("sa").over(wBkt), lit(0L)))
      .withColumn("offb", coalesce(sum("sb").over(wBkt), lit(0L)))
      .withColumn("ta", sum("sa").over(wAllB))
      .withColumn("tb", sum("sb").over(wAllB))
      .select("bucket", "offa", "offb", "ta", "tb")
    val wCum = Window.partitionBy("bucket").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .withColumn("pa", sum("na").over(wCum))
      .withColumn("pb", sum("nb").over(wCum))
      .join(broadcast(offsets), Seq("bucket"))
      .agg(
        max(when(col("ta") >= 5 && col("tb") >= 5,
          abs((col("pa") + col("offa")).cast("double") / col("ta") -
            (col("pb") + col("offb")).cast("double") / col("tb"))))
          .as("ks"))
      .withColumn("column", lit(c))
      .select(col("column"), col("ks"))
  }

  /** D2 chi-square-LIKE categorical drift — NOT Pearson χ²: the reference's
    * own formula Σ (o_a − o_b)² / (o_a + o_b + 1e-9) over the union of
    * categories, raw counts, nulls bucketed as "NA"
    * (`modules/utility.py:99-110`, formula preserved verbatim incl. the
    * 1e-9). Null when either side is empty.
    *
    * The category-term sum runs through an ordered cumulative window so
    * double addition order is fixed (categories are few — this is a
    * driver-sized frame after the two grouped counts).
    */
  def chi2Drift(before: DataFrame, after: DataFrame, c: String): DataFrame = {
    def counted(df: DataFrame, out: String) =
      df.select(coalesce(col(c).cast("string"), lit("NA")).as("k"))
        .groupBy("k").agg(count(lit(1)).as(out))
    val j = counted(before, "oa").join(counted(after, "ob"), Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("oa"), lit(0L)).as("oa"),
        coalesce(col("ob"), lit(0L)).as("ob"))
    val term = (col("oa") - col("ob")).cast("double") * (col("oa") - col("ob")) /
      ((col("oa") + col("ob")).cast("double") + 1e-9)
    val wCum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    j.withColumn("cum", sum(term).over(wCum))
      .withColumn("ta", sum("oa").over(wAll))
      .withColumn("tb", sum("ob").over(wAll))
      .agg(max(when(col("ta") > 0 && col("tb") > 0, col("cum"))).as("chi2_like"))
      .withColumn("column", lit(c))
      .select(col("column"), col("chi2_like"))
  }

  /** D3 drift dispatcher (`modules/utility.py:112-123`): for each column
    * present in BOTH tables — columns missing from `after` are silently
    * skipped (`:115-116`) — numeric-in-both → KS, anything else
    * (including the string output of generalization, SURVEY §4.4.1) →
    * chi²-like. Returns (column, type, metric). */
  def driftAll(before: DataFrame, after: DataFrame): DataFrame = {
    val afterCols = after.columns.toSet
    val shared = before.schema.fields.filter(f => afterCols.contains(f.name))
    val parts = shared.map { f =>
      val numericBoth = f.dataType.isInstanceOf[NumericType] &&
        after.schema(f.name).dataType.isInstanceOf[NumericType]
      // metric rounded to 6 decimals: ordered double accumulation differs in
      // tree shape across engines (segment-tree vs sequential window sums),
      // so the last ulps of many-category sums are not portable.
      if (numericBoth)
        ksStatistic(before, after, f.name)
          .select(col("column"), lit("ks").as("type"), round(col("ks"), 6).as("metric"))
      else
        chi2Drift(before, after, f.name)
          .select(col("column"), lit("chi2_like").as("type"), round(col("chi2_like"), 6).as("metric"))
    }
    parts.reduce(_ union _).orderBy("column")
  }
}
