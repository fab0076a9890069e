package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofRangeSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest right at-or-before left, per key, left-outer") {
    val left = Seq(
      (1L, 10L, "l-a"), // key 1 @10 → right @10 (inclusive)
      (1L, 15L, "l-b"), // key 1 @15 → right @10
      (1L, 25L, "l-c"), // key 1 @25 → right @20
      (2L, 5L, "l-d"),  // key 2 @5  → no prior right → null
      (3L, 9L, "l-e")   // key 3 has no right rows at all
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100.0),
      (1L, 20L, 200.0),
      (2L, 7L, 700.0)
    ).toDF("k", "t", "rv")
      .select(col("k"), col("t").as("rt"), col("rv"))
    val out = Relational.asofJoin(left, right, "k", "k", "t", "rt", Seq("rt", "rv"))
      .orderBy(col("k"), col("t"))
      .collect()
    val byTag = out.map(r => r.getString(2) -> (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(byTag("l-a").contains(100.0))
    assert(byTag("l-b").contains(100.0))
    assert(byTag("l-c").contains(200.0))
    assert(byTag("l-d").isEmpty)
    assert(byTag("l-e").isEmpty)
  }

  test("asofJoin plan: single shuffle on the key, no nested-loop join") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "rt", "rv")
    val plan = Relational.asofJoin(left, right, "k", "k", "t", "rt", Seq("rv"))
      .queryExecution.executedPlan
    val joins = plan.collect {
      case j if j.nodeName.toLowerCase.contains("loopjoin") => j
    }
    assert(joins.isEmpty, "as-of must not fall back to a nested-loop inequality join")
  }

  test("qRangeJoin bands partition all quantities exactly once") {
    val out = Relational.qRangeJoin(spark, Sf).collect()
    val total = out.map(_.getLong(1)).sum
    val liRows = graft.Tables.lineitem(spark, Sf).count()
    assert(total == liRows) // bands cover [1, 51) and quantities are 1..50
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("nearest-event: bidirectional closest wins; one row per matched click") {
    val out = Relational.qNearestEvent(spark, Sf).collect()
    assert(out.map(_.getLong(0)).distinct.length == out.length,
      "exactly one nearest purchase per click")
    // every delta within the band, non-negative
    assert(out.forall(r => r.getLong(4) >= 0 && r.getLong(4) <= 1800000000L))
    // cross-check a click against a brute-force nearest on the same data
    val e = graft.Tables.events(spark, Sf)
    val first = out.head
    def us(t: java.sql.Timestamp) = (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    val clickUs = us(first.getTimestamp(2))
    val cands = e.filter(col("event_type") === "purchase" &&
        col("user_id") === first.getLong(1)).collect()
      .map(r => (math.abs(us(r.getTimestamp(1)) - clickUs), r.getLong(0)))
      .filter(_._1 <= 1800000000L)
    assert(cands.nonEmpty && cands.min == (first.getLong(4), first.getLong(3)))
  }
}
