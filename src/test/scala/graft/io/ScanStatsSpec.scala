package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScanStatsSpec extends SparkSpec {
  import spark.implicits._

  test("parquetScanRowCount: exact for scans and pruning projections, None otherwise") {
    val li = graft.Tables.lineitem(spark, Sf)
    val expected = li.count()
    assert(ScanStats.parquetScanRowCount(li).contains(expected))
    // column pruning / renaming is row-preserving → still answerable
    assert(ScanStats.parquetScanRowCount(
      li.select(col("l_quantity").as("q"))).contains(expected))
    // any row-changing operator must refuse (filter, aggregate, limit)
    assert(ScanStats.parquetScanRowCount(li.filter(col("l_quantity") > 10)).isEmpty)
    assert(ScanStats.parquetScanRowCount(li.groupBy("l_returnflag").count()).isEmpty)
    assert(ScanStats.parquetScanRowCount(li.limit(5)).isEmpty)
    // non-file sources must refuse
    assert(ScanStats.parquetScanRowCount(
      Seq((1, "a"), (2, "b")).toDF("id", "s")).isEmpty)
    // multi-file scans sum footers across files
    val dir = java.nio.file.Files.createTempDirectory("scanstats").toString
    spark.range(1000).repartition(4).write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(ScanStats.parquetScanRowCount(
      spark.read.parquet(s"$dir/t.parquet")).contains(1000L))
  }
}
