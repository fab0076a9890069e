package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — the co-located-join strategy for repeated
  * large joins at scale (SURVEY.md §1.5 / builder scale brief).
  *
  * Writing both fact tables bucketed by the join key means every
  * subsequent join on that key is planned WITHOUT a shuffle on either
  * side (SortMergeJoin over pre-bucketed scans; `BucketingSpec` asserts
  * no Exchange in the physical plan). At 100 TB this converts the
  * dominant repeated cost — re-shuffling the fact table per query — into
  * a one-time write-side cost.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * merge joins skip the sort as well). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * bucket counts match. */
  def bucketJoin(spark: SparkSession, left: String, right: String,
                 leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
