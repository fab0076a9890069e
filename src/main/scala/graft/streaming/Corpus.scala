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
}
