package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The two sides of profile's quantile auto-dispatch must agree exactly:
  * the fused driver-sort path (small data) and the bucketed cents-histogram
  * path (100 TB side — no longer exercised through `profile` at test scale,
  * so it is pinned here directly). Both also certify exact distinct counts
  * (QuantFit.nUnique) that the profile substitutes for count_distinct. */
class ExactQuantilesSpec extends SparkSpec {

  private val probs = Seq(0.25, 0.5, 0.75)

  test("histogram path == driver-sort path on all lineitem numeric columns") {
    val li = Tables.lineitem(spark, Sf)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val hist = Exact.quantilesMultiCentsHistogram(li, cols, probs)
    val sort = Exact.quantilesViaDriverSortMulti(li, cols, probs)
    val exact = cols.map(c =>
      c -> li.agg(count_distinct(col(c))).head().getLong(0)).toMap
    cols.foreach { c =>
      assert(hist(c).quantiles.isDefined, s"$c should be cents-eligible")
      // bit-exact: same h = p·(n−1) ranks, same interp formula, exact cents
      assert(hist(c).quantiles.get == sort(c).quantiles.get,
        s"$c: ${hist(c).quantiles.get} vs ${sort(c).quantiles.get}")
      assert(hist(c).nUnique.contains(exact(c)), s"$c hist nUnique")
      assert(sort(c).nUnique.contains(exact(c)), s"$c sort nUnique")
    }
  }

  test("histogram path with few buckets exercises cross-bucket offsets") {
    import spark.implicits._
    // 100 distinct values, 2 buckets → quantile ranks cross bucket borders
    val df = (1 to 100).map(i => i.toDouble / 2).toDF("v")
    val r = Exact.quantilesMultiCentsHistogram(df, Seq("v"), Seq(0.0, 0.33, 0.5, 0.99, 1.0), buckets = 2)
    val expect = Exact.quantilesViaDriverSortMulti(df, Seq("v"), Seq(0.0, 0.33, 0.5, 0.99, 1.0))
    assert(r("v").quantiles.get == expect("v").quantiles.get)
    assert(r("v").nUnique.contains(100L) && expect("v").nUnique.contains(100L))
  }

  test("non-cents-eligible column (3 decimals) reports None for fallback") {
    import spark.implicits._
    val df = Seq(1.001, 2.5, 3.0).toDF("x").withColumn("y", col("x") * 2)
    val r = Exact.quantilesMultiCentsHistogram(df, Seq("x", "y"), probs)
    assert(r("x").quantiles.isEmpty && r("x").nUnique.isEmpty,
      "1.001 does not survive the DECIMAL(18,2) roundtrip")
  }

  test("eligible and ineligible columns mix in one call") {
    import spark.implicits._
    val df = Seq((1.25, 0.333), (2.50, 0.667), (4.75, 1.0)).toDF("ok", "bad3dp")
    val r = Exact.quantilesMultiCentsHistogram(df, Seq("ok", "bad3dp"), Seq(0.5))
    assert(r("bad3dp").quantiles.isEmpty)
    assert(r("ok").quantiles.contains(Seq(2.50)))
    assert(r("ok").nUnique.contains(3L))
  }

  test("all-null column yields NaN markers; absent from histogram entirely") {
    import spark.implicits._
    val df = Seq((1.0, Option.empty[Double]), (2.0, None)).toDF("a", "allnull")
    val r = Exact.quantilesMultiCentsHistogram(df, Seq("a", "allnull"), Seq(0.5))
    assert(r("a").quantiles.contains(Seq(1.5)))
    assert(r("allnull").quantiles.get.forall(_.isNaN))
    assert(r("allnull").nUnique.contains(0L))
    val s = Exact.quantilesViaDriverSortMulti(df, Seq("a", "allnull"), Seq(0.5))
    assert(s("allnull").quantiles.get.forall(_.isNaN))
    assert(s("allnull").nUnique.contains(0L))
  }

  test("NaN values mark a column ineligible on BOTH paths (falls back, never silently drops)") {
    import spark.implicits._
    val df = Seq(1.0, Double.NaN, 3.0).toDF("x")
    val r = Exact.quantilesMultiCentsHistogram(df, Seq("x"), Seq(0.5))
    assert(r("x").quantiles.isEmpty && r("x").nUnique.isEmpty)
    val s = Exact.quantilesViaDriverSortMulti(df, Seq("x"), Seq(0.5))
    assert(s("x").quantiles.isEmpty && s("x").nUnique.isEmpty,
      "driver path must not silently drop non-finite values")
  }
}
