package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (builder scale brief: "salting
  * for skew"). AQE's skew-join split covers joins at runtime; this covers
  * skewed AGGREGATIONS, where one hot key would otherwise serialize into
  * a single reducer.
  *
  * Two-phase form: partial aggregate on (key, salt) spreads a hot key
  * over `saltBuckets` reducers, final aggregate on (key) merges the
  * partials. Correct for any algebraic aggregate expressed as
  * (partialExpr, mergeExpr) pairs — counts and decimal/long sums here.
  */
object Salting {

  /** count + exact cents sum per key, skew-spread over `saltBuckets`. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(Exact.cents(col(valueCol))).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").cast("double").as("sum_cents"))
  }
}
