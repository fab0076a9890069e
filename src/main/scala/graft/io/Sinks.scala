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

  /** Write `df` range-clustered on `sortCols`: `repartitionByRange` makes
    * files own DISJOINT key ranges, and the within-partition sort keeps
    * each row group's min/max stats tight — so range/equality predicates
    * on the sort key skip whole FILES and row groups at scan time
    * (`PushedFilters` + parquet stats), the single-dimension analogue of
    * z-ordering. The pattern that keeps a 100 TB time-keyed or
    * source-keyed table scannable: pruning works on any prefix of
    * `sortCols`. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  numFiles: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, cols: _*)
      else df.repartitionByRange(cols: _*)
    ranged.sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }
}
