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
