package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregate equals the direct aggregate on skewed data") {
    // one hot key (90% of rows) + a long tail
    val rows = Seq.tabulate(10000) { i =>
      val k = if (i % 10 != 0) "hot" else s"tail_${i / 10}"
      (k, (i % 100) / 100.0 * 7)
    }
    val df = rows.toDF("k", "v")
      .withColumn("v", round(col("v"), 2)) // keep 2-decimal for cents policy
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(Exact.cents(col("v"))).cast("double").as("sum_cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Salting.saltedCountSum(df, "k", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == direct)
    assert(direct("hot")._1 == 9000L)
  }
}
