package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  test("partitioned sink round-trips and prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val events = graft.Tables.events(spark, Sf)
    Sinks.writePartitioned(events, dir, Seq("event_type"))

    // hive-style directories exist
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("event_type=")))

    val back = Sinks.readPartitioned(spark, dir)
    assert(back.count() == events.count())

    // equality predicate on the partition column → PartitionFilters in the
    // scan, zero data filters — directories are skipped before any IO
    val pruned = back.filter(col("event_type") === "click")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition pruning in scan: $scan")
    assert(pruned.count() ==
      events.filter(col("event_type") === "click").count())
  }
}
