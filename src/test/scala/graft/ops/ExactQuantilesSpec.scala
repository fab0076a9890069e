package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The two sides of profile's quantile auto-dispatch must agree exactly:
  * the fused driver-sort path (small data) and the bucketed cents-histogram
  * path (100 TB side — no longer exercised through `profile` at test scale,
  * so it is pinned here directly). */
class ExactQuantilesSpec extends SparkSpec {

  private val probs = Seq(0.25, 0.5, 0.75)

  test("histogram path == driver-sort path on all lineitem numeric columns") {
    val li = Tables.lineitem(spark, Sf)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val hist = Exact.quantilesMultiCentsHistogram(li, cols, probs)
    val sort = Exact.quantilesViaDriverSortMulti(li, cols, probs)
    cols.foreach { c =>
      assert(hist(c).isDefined, s"$c should be cents-eligible")
      // bit-exact: same h = p·(n−1) ranks, same interp formula, exact cents
      assert(hist(c).get == sort(c).get, s"$c: ${hist(c).get} vs ${sort(c).get}")
    }
  }

  test("histogram path with few buckets exercises cross-bucket offsets") {
    import spark.implicits._
    // 100 distinct values, 2 buckets → quantile ranks cross bucket borders
    val df = (1 to 100).map(i => i.toDouble / 2).toDF("v")
    val r = Exact.quantilesMultiCentsHistogram(df, Seq("v"), Seq(0.0, 0.33, 0.5, 0.99, 1.0), buckets = 2)
    val expect = Exact.quantilesViaDriverSortMulti(df, Seq("v"), Seq(0.0, 0.33, 0.5, 0.99, 1.0))
    assert(r("v").get == expect("v").get)
  }

  test("non-cents-eligible column (3 decimals) reports None for fallback") {
    import spark.implicits._
    val df = Seq(1.001, 2.5, 3.0).toDF("x").withColumn("y", col("x") * 2)
    val r = Exact.quantilesMultiCentsHistogram(df, Seq("x", "y"), probs)
    assert(r("x").isEmpty, "1.001 does not survive the DECIMAL(18,2) roundtrip")
  }

  test("eligible and ineligible columns mix in one call") {
    import spark.implicits._
    val df = Seq((1.25, 0.333), (2.50, 0.667), (4.75, 1.0)).toDF("ok", "bad3dp")
    val r = Exact.quantilesMultiCentsHistogram(df, Seq("ok", "bad3dp"), Seq(0.5))
    assert(r("bad3dp").isEmpty)
    assert(r("ok").contains(Seq(2.50)))
  }

  test("all-null column yields NaN markers; absent from histogram entirely") {
    import spark.implicits._
    val df = Seq((1.0, Option.empty[Double]), (2.0, None)).toDF("a", "allnull")
    val r = Exact.quantilesMultiCentsHistogram(df, Seq("a", "allnull"), Seq(0.5))
    assert(r("a").contains(Seq(1.5)))
    assert(r("allnull").get.forall(_.isNaN))
    val s = Exact.quantilesViaDriverSortMulti(df, Seq("a", "allnull"), Seq(0.5))
    assert(s("allnull").get.forall(_.isNaN))
  }

  test("NaN values mark a column ineligible (falls back, never silently drops)") {
    import spark.implicits._
    val df = Seq(1.0, Double.NaN, 3.0).toDF("x")
    val r = Exact.quantilesMultiCentsHistogram(df, Seq("x"), Seq(0.5))
    assert(r("x").isEmpty)
  }
}
