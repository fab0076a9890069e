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

  test("histogram NumFit == driver-sort NumFit on all lineitem numeric columns (r12 moments)") {
    // the r12 at-scale fit: moments/min/max/count ride the histogram's
    // bucket aggregate and must finalize bit-identically to the driver
    // replica (which is itself pinned against the in-agg wide forms)
    val li = Tables.lineitem(spark, Sf)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val hist = Exact.numProfileViaCentsHistogram(li, cols, probs, hiLo = true)
    val sort = Exact.numProfileViaDriverSort(li, cols, probs)
    cols.foreach { c =>
      val (h, s) = (hist(c), sort(c))
      assert(h.eligible && s.eligible, c)
      assert(h.n == s.n, s"$c n: ${h.n} vs ${s.n}")
      assert(h.quantiles.get == s.quantiles.get, s"$c quantiles")
      assert(h.nUnique == s.nUnique, s"$c nUnique")
      assert(h.mean.get == s.mean.get, s"$c mean: ${h.mean} vs ${s.mean}")
      assert(h.std.get == s.std.get, s"$c std: ${h.std} vs ${s.std}")
      assert(h.minV.get == s.minV.get, s"$c min")
      assert(h.maxV.get == s.maxV.get, s"$c max")
    }
  }

  test("histogram NumFit moments: negatives, ties, nulls, big-cents side-sums, all-decimal regime") {
    import spark.implicits._
    // -40.25 repeats (weighted bins), a null, and values past the
    // long-safe cents bound (4e9 cents) driving the decimal side-sums
    val vals = Seq(Some(-40.25), Some(-40.25), Some(0.0), Some(12.5),
      None, Some(4.0e9), Some(-4.0e9), Some(12.5))
    val df = vals.toDF("v")
    val byHist = Exact.numProfileViaCentsHistogram(df, Seq("v"), probs, hiLo = true)("v")
    val byHistDec = Exact.numProfileViaCentsHistogram(df, Seq("v"), probs, hiLo = false)("v")
    val bySort = Exact.numProfileViaDriverSort(df, Seq("v"), probs)("v")
    Seq(byHist, byHistDec).foreach { h =>
      assert(h.n == bySort.n && h.nUnique == bySort.nUnique)
      assert(h.quantiles.get == bySort.quantiles.get)
      assert(h.mean.get == bySort.mean.get, s"mean ${h.mean} vs ${bySort.mean}")
      assert(h.std.get == bySort.std.get, s"std ${h.std} vs ${bySort.std}")
      assert(h.minV.get == bySort.minV.get && h.maxV.get == bySort.maxV.get)
    }
    // all-null and ineligible columns keep their contracts with moments on
    val df2 = Seq((Option.empty[Double], 1.001), (None, 2.5)).toDF("allnull", "bad3dp")
    val r2 = Exact.numProfileViaCentsHistogram(df2, Seq("allnull", "bad3dp"), probs, hiLo = true)
    assert(r2("allnull").eligible && r2("allnull").n == 0 && r2("allnull").mean.isEmpty)
    assert(r2("allnull").quantiles.get.forall(_.isNaN))
    assert(!r2("bad3dp").eligible)
  }
}
