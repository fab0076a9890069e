package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json extension scope): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode/feature steps as batched partition-local
  * functions (`mapPartitions` over a typed Dataset — the Scala analogue of
  * an arrow-batched Python UDF: one iterator per partition, no per-row
  * driver involvement, schema declared up front).
  *
  * The actual media decode is a STUB (image/audio libraries are not in
  * this environment): [[FakeDecoded]] derives deterministic pseudo-dims
  * from the byte length. The Spark-side contract — binary column, batch
  * iteration, typed output schema, partition parallelism — is real and
  * tested, and a real decoder drops in by replacing [[decodeBytes]] only.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class FakeDecoded(doc_id: Long, byte_len: Int,
                               width: Int, height: Int, n_frames: Int)

  /** Attach a binary payload column. In the harness the payload is the
    * UTF-8 encoding of the text (a stand-in for real media bytes). */
  def attachBinary(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake dimensions from the byte length.
    * Replace with a real image/audio decode when the libraries exist;
    * everything around it (batching, schema, partitioning) is unchanged. */
  def decodeBytes(payload: Array[Byte]): (Int, Int, Int) = {
    val len = payload.length
    (1 + len % 64, 1 + len % 48, 1 + len % 10)
  }

  /** Batched decode via mapPartitions: the hot path iterates a partition's
    * rows in one JVM call, exactly how a real decoder would amortize
    * per-batch setup (model load, codec init). */
  def decode(df: DataFrame): Dataset[FakeDecoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup would go here (codec/model init)
        rows.map { r =>
          val (w, h, f) = decodeBytes(r.payload)
          FakeDecoded(r.doc_id, r.payload.length, w, h, f)
        }
      }
  }

  /** Frame sampling: slice `frames` fixed-width byte windows out of the
    * payload (expression-only — no decode needed for windowing). */
  def frameSample(df: DataFrame, frames: Int, frameBytes: Int): DataFrame =
    df.select(col("doc_id"), explode(array((0 until frames).map { i =>
      struct(lit(i).as("frame_idx"),
        substring(col("payload"), i * frameBytes + 1, frameBytes).as("frame"))
    }: _*)).as("f"))
      .select(col("doc_id"), col("f.frame_idx"), length(col("f.frame")).as("frame_len"))
      .filter(col("frame_len") > 0)
      .orderBy(col("doc_id"), col("frame_idx"))
}
