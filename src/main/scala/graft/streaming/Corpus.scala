package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.TextStats

/** Continuous corpus ingestion — the Structured Streaming twin of
  * [[graft.ext.TextStats.corpusClean]]: documents arrive as a stream and
  * are quality-floored, language-filtered, and content-deduped online,
  * so a training corpus stays clean as it grows instead of being
  * re-cleaned from scratch per snapshot.
  *
  * Semantics vs the batch form: the batch dedup keeps `min(doc_id)` per
  * text (a global choice no stream can make); the stream keeps the
  * FIRST-SEEN document per content fingerprint within the watermark —
  * the standard online policy. Quality/language are the same shared
  * expressions, so a doc filtered here is exactly the doc
  * `corpusClean` would drop.
  *
  * Scale shape: the quality/language predicates and the fingerprint are
  * stateless codegen'd projections (they cut state BEFORE it exists);
  * dedup state is one fingerprint per surviving doc, expiring with the
  * watermark — at any corpus rate the state bounds to one
  * watermark-window of survivors, never the corpus.
  */
object CorpusStream {

  def ingest(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id", tsCol: String = "ingest_ts",
             watermark: String = "10 minutes",
             minQuality: Double = 0.5, lang: String = "en"): DataFrame =
    docs
      .withColumn("quality_score", TextStats.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextStats.langPred(col(textCol)))
      .filter(col("quality_score") >= minQuality && col("lang_pred") === lang)
      .withColumn("fp", TextStats.fingerprintExpr(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col(idCol), col(tsCol), col("quality_score"))

  /** Incremental corpus ACCUMULATION — the `foreachBatch` completion of
    * the story: every micro-batch is deduped against the corpus built so
    * far ([[graft.ext.Dedup.dedupDelta]] — batch-internal first
    * occurrences, then a left-anti join on the normalized text) and only
    * the genuinely NEW documents append to the corpus directory.
    *
    * Idempotent by construction, not by bookkeeping: if a failed batch
    * replays, its documents are ALREADY in the corpus, so the anti-join
    * drops every one of them and the re-run appends nothing — the dedup
    * semantics are exactly the exactly-once guard. State is the corpus
    * itself; nothing lives in the streaming state store, so the operator
    * scales with the batch (not the history) and the corpus side can be
    * bucketed for a co-located anti-join at 100 TB.
    *
    * Returns the started query; the caller owns `awaitTermination`. */
  def ingestIncremental(docs: DataFrame, corpusDir: String,
                        checkpointDir: String, textCol: String = "text",
                        idCol: String = "doc_id"): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existing: DataFrame =
          if (new java.io.File(corpusDir).exists())
            spark.read.parquet(corpusDir).select(col(idCol), col(textCol))
          else batch.sparkSession.emptyDataFrame
            .select() // schema-free sentinel, replaced below
        val base =
          if (existing.columns.isEmpty)
            batch.select(col(idCol), col(textCol)).limit(0)
          else existing
        val fresh = graft.ext.Dedup.dedupDelta(base, batch, textCol, idCol)
        val accepted = batch.select(col(idCol), col(textCol))
          .join(fresh.select(col("doc_id").as(idCol)), Seq(idCol), "left_semi")
        accepted.write.mode("append").parquet(corpusDir)
        ()
      }
      .start()
}
