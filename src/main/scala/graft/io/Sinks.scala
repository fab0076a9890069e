package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Output sinks beyond the reference's CSV download (S2): partitioned
  * parquet layout — the storage pattern that makes 100 TB readable.
  * Writing `partitionBy(k)` turns equality/IN predicates on `k` into
  * PARTITION PRUNING at read time: the scan's `PartitionFilters` skip
  * whole directories before any file IO, so a one-partition query touches
  * 1/|partitions| of the data regardless of table size.
  */
object Sinks {

  /** Write `df` as parquet partitioned by `partitionCols` (hive-style
    * `k=v` directories). `maxRecordsPerFile` caps file size so a skewed
    * partition key cannot produce one giant file. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Read a partitioned layout back; predicates on the partition columns
    * prune directories (visible as `PartitionFilters` in the plan). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
