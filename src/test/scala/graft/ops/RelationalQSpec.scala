package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Execution invariants for the TPC-H-style catalog queries added in r7
  * (q10/q14/q18/q19 + the stream-static enrichment twin). Exact value
  * parity is gated by the DuckDB oracle; these pin the structural
  * contracts the oracle's hash can't articulate when it fails. */
class RelationalQSpec extends SparkSpec {

  test("q10: at most 20 rows, sorted by revenue desc with custkey tiebreak") {
    val rows = Relational.q10ReturnedItems(spark, Sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val rev = rows.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("q14: one row, promo share strictly inside (0, 100)") {
    val rows = Relational.q14PromoRevenue(spark, Sf).collect()
    assert(rows.length == 1)
    val pct = rows.head.getAs[Double]("promo_revenue_pct")
    assert(pct > 0.0 && pct < 100.0, s"promo pct out of range: $pct")
  }

  test("q18: every surviving order's quantity sum exceeds the threshold") {
    val rows = Relational.q18LargeOrders(spark, Sf, minQty = 250).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 250.0))
    // survivor set must agree with an independent recount
    val expect = Tables.lineitem(spark, Sf)
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("s"))
      .filter(col("s") > 250.0).count()
    assert(rows.length == math.min(expect, 100L))
  }

  test("q19: single aggregate row; n counts exactly the bracketed lines") {
    val rows = Relational.q19BracketRevenue(spark, Sf).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n") > 0)
    assert(rows.head.getAs[Double]("revenue") > 0.0)
  }

  test("q_enrich: per-(segment,type) counts cover exactly the joinable events") {
    val out = Relational.qEnrichEvents(spark, Sf)
    val total = out.agg(sum(col("n"))).collect().head.getLong(0)
    val joinable = Tables.events(spark, Sf)
      .join(Tables.customer(spark, Sf),
        col("user_id") === col("c_custkey"), "left_semi").count()
    assert(total == joinable, s"enriched count $total != joinable $joinable")
  }
}
