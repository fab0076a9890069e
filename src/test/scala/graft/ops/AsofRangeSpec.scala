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
}
