package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OrcSpec extends SparkSpec {

  test("orc round-trip preserves rows and schema; filters push into the stripe reader") {
    val docs = graft.Tables.documents(spark, Sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    try {
      Orc.write(docs, s"$dir/docs")
      val back = Orc.read(spark, s"$dir/docs")
      assert(back.schema == docs.schema)
      assert(back.count() == docs.count())
      val a = docs.orderBy("doc_id").collect()
      val b = back.orderBy("doc_id").collect()
      assert(a.sameElements(b), "orc round-trip must be lossless")
      val plan = back.filter(col("doc_id") < 10).select("doc_id")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)"),
        s"expected ORC predicate pushdown:\n$plan")
      assert(plan.linesIterator.find(_.contains("ReadSchema")).exists(!_.contains("text")),
        "projection must prune unread ORC columns")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("orc hive-partitioned write prunes partitions at read time") {
    val docs = graft.Tables.documents(spark, Sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-orc-part").toString
    try {
      Orc.write(docs, s"$dir/bylang", partitionCols = Seq("lang"))
      val back = Orc.read(spark, s"$dir/bylang").filter(col("lang") === "en")
      val plan = back.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        s"expected lang partition pruning:\n$plan")
      val expected = docs.filter(col("lang") === "en").count()
      assert(back.count() == expected)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
