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

  test("schema evolution: mergeSchema unions shard schemas, missing cols null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "text").write.parquet(s"$dir/s1")
    Seq((2L, "en", 0.9)).toDF("id", "lang", "quality").write.parquet(s"$dir/s2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/s1", s"$dir/s2")
    assert(merged.columns.sorted.toSeq == Seq("id", "lang", "quality", "text"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[String]("text") == "a" && byId(1L).isNullAt(merged.columns.indexOf("lang")))
    assert(byId(2L).getAs[String]("lang") == "en" && byId(2L).isNullAt(merged.columns.indexOf("text")))
  }

  test("sorted sink: files own disjoint key ranges; point reads touch one file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    val li = graft.Tables.lineitem(spark, Sf)
    Sinks.writeSorted(li, dir, Seq("l_orderkey"), numFiles = 4)

    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 4, s"expected 4 range files, got ${files.length}")
    // per-file key ranges must be pairwise disjoint (range clustering)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"overlapping file ranges: $hiA vs $loB")
      case _ =>
    }
    // round trip is lossless
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    // a point predicate is pushed to the scan, where the disjoint
    // min/max file stats let parquet skip the other files' row groups
    val point = back.filter(col("l_orderkey") === ranges.head._1)
    val scan = point.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey"),
      s"predicate not pushed: $scan")
  }
}
