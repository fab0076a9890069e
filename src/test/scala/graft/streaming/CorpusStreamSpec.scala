package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Doc(doc_id: Long, text: String, ingest_ts: Timestamp)

class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  // 20 tokens, 17 stopwords → quality ≈ 0.66; en markers dominate
  private val goodEn =
    "the a fast slow small the a of and to in is on for with the a of and to"
  private val goodEn2 = // different tail token → different fingerprint
    "the a fast slow small the a of and to in is on for with the a of and is"
  private val germanish =
    "der die das und nicht der die das und nicht der die das und nicht der die das und"

  test("corpus ingest: quality floor, language filter, first-seen dedup across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = CorpusStream.ingest(mem.toDF())
      .writeStream.format("memory").queryName("corpus_out")
      .outputMode("append").start()

    mem.addData(
      Doc(1, goodEn, t("10:00")),
      Doc(2, goodEn, t("10:01")),     // same content → dedup keeps first-seen
      Doc(3, "short text", t("10:01")), // fails the quality floor
      Doc(4, germanish, t("10:02")))  // fails the language filter
    q.processAllAvailable()
    mem.addData(
      Doc(5, goodEn, t("10:05")),     // still within watermark → dropped
      Doc(6, goodEn2, t("10:05")))    // new content → survives
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("corpus_out").collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 6L), rows.mkString(", "))
    // the survivors carry the SAME quality score the batch op computes
    rows.foreach(r => assert(r.getDouble(2) >= 0.5))
  }

  test("corpus ingest survivors agree with batch corpusClean on the same static data") {
    val docs = Seq(
      (1L, goodEn), (2L, goodEn), (3L, "short text"), (4L, germanish), (6L, goodEn2))
      .toDF("doc_id", "text")
    val batch = graft.ext.TextStats.corpusClean(docs, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    // batch keeps min(doc_id) per text: {1, 6} — same survivor set the
    // stream produced under first-seen order
    assert(batch == Set(1L, 6L))
  }

  test("ingestIncremental: corpus accumulates only genuinely new docs across batches") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val corpus = s"$dir/corpus"
    val mem = MemoryStream[Doc]
    val q = CorpusStream.ingestIncremental(
      mem.toDF().select($"doc_id", $"text"), corpus, s"$dir/ckpt")
    try {
      mem.addData(Doc(1, "alpha beta gamma", t("10:00")),
        Doc(2, "delta epsilon zeta", t("10:00")))
      q.processAllAvailable()
      mem.addData(
        Doc(3, "ALPHA  beta gamma", t("10:05")), // normalized dup of 1 → dropped
        Doc(4, "eta theta iota", t("10:05")),    // new
        Doc(5, "eta  THETA iota", t("10:05")))   // batch-internal dup of 4 → dropped
      q.processAllAvailable()
      // a later batch replaying already-corpus content appends nothing —
      // the same anti-join that dedups is the exactly-once guard
      mem.addData(Doc(6, "delta epsilon zeta", t("10:10")))
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(corpus).collect()
        .map(r => r.getLong(0)).toSet
      assert(got == Set(1L, 2L, 4L))
    } finally {
      try q.stop() catch { case _: Throwable => () }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
