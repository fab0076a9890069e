package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("CappedDistinct: exact below cap, cap+1 once saturated, nulls excluded") {
    val capped = udaf(new CappedDistinct(10))
    val df = (1 to 100).map(i => ("small", s"v${i % 5}")) ++
      (1 to 100).map(i => ("big", s"v$i")) ++
      Seq(("nulls", null), ("nulls", "x"))
    val out = df.toDF("g", "v").groupBy("g").agg(capped(col("v")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("small") == 5L)
    assert(out("big") == 11L) // saturated: reported as cap+1
    assert(out("nulls") == 1L)
  }

  test("MinKIds: k smallest per group, exact across partitions, duplicates kept") {
    val mink = udaf(new MinKIds(3))
    // 8 partitions force map-side partials + a merge path
    val out = spark.range(0, 1000, 1, 8)
      .select((col("id") % 4).as("g"), (lit(999) - col("id")).as("v")) // descending arrival
      .groupBy("g").agg(mink(col("v")).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (g <- 0L to 3L) {
      val expect = (0 to 999).map(i => 999L - i).filter(v => (999 - v) % 4 == g)
        .sorted.take(3)
      assert(out(g) == expect, s"group $g: ${out(g)} vs $expect")
    }
    // duplicates are rows, not distinct values: 5 copies of 1 cap at k
    val dup = Seq(1L, 1L, 1L, 1L, 1L, 0L).toDF("v")
      .agg(mink(col("v")).as("kept")).collect()(0).getSeq[Long](0)
    assert(dup == Seq(0L, 1L, 1L))
    // fewer rows than k: all kept
    val few = Seq(7L, 3L).toDF("v")
      .agg(mink(col("v")).as("kept")).collect()(0).getSeq[Long](0)
    assert(few == Seq(3L, 7L))
  }

  test("CappedDistinctLong: threshold decisions exact across partitions") {
    val capped = udaf(new CappedDistinctLong(10))
    val out = spark.range(0, 1000, 1, 8)
      .select((col("id") % 7).as("seven"), col("id").as("all"))
      .agg(capped(col("seven")).as("s"), capped(col("all")).as("a"))
      .collect()(0)
    assert(out.getLong(0) == 7L)
    assert(out.getLong(1) == 11L)
  }
}
