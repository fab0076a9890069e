package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonSpec extends SparkSpec {

  test("json round-trip preserves rows and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val docs = graft.Tables.documents(spark, Sf)
    Json.write(docs, dir)
    val back = Json.read(spark, dir)
    assert(back.count() == docs.count())
    val a = docs.agg(sum(length(col("text")))).head().getLong(0)
    val b = back.agg(sum(length(col("text")))).head().getLong(0)
    assert(a == b)
  }

  test("pinned schema captures corrupt records instead of dropping them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_bad").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part.json"),
      """{"doc_id": 1, "text": "ok"}
        |this is not json
        |{"doc_id": 2, "text": "also ok"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val back = Json.readWithSchema(spark, dir, schema).cache()
    assert(back.count() == 3)
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(back.filter(col("doc_id").isNotNull).count() == 2)
  }
}
