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

  final case class FakeThumb(doc_id: Long, src_w: Int, src_h: Int,
                             thumb_w: Int, thumb_h: Int, thumb_bytes: Int,
                             checksum: Long)

  /** STUB resize/thumbnail: aspect-preserving integer target dims from
    * the fake decode (`max(1, w·maxSide/max(w,h))` floor arithmetic —
    * the real formula a resizer uses) and a deterministic byte-slice
    * "thumbnail" whose checksum is a rolling polynomial over the sampled
    * bytes. Same batched `mapPartitions` contract as [[decode]]: a real
    * scaler replaces the body of the row map only. Every output is a
    * pure integer function of the payload, so the operator is
    * oracle-gateable despite the stubbed codec. */
  def thumbnail(df: DataFrame, maxSide: Int = 16): Dataset[FakeThumb] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, _) = decodeBytes(r.payload)
          val long = math.max(w, h)
          val tw = math.max(1, w * maxSide / long)
          val th = math.max(1, h * maxSide / long)
          val n = math.min(r.payload.length, tw * th)
          var sum = 0L
          var i = 0
          while (i < n) { sum = (sum * 31 + (r.payload(i) & 0xff)) % 1000000007L; i += 1 }
          FakeThumb(r.doc_id, w, h, tw, th, n, sum)
        }
      }
  }

  final case class AudioWin(doc_id: Long, window_idx: Int, n_samples: Int,
                            energy: Long, zero_crossings: Long)

  /** STUB audio feature extraction — the windowed energy + zero-crossing
    * pass every audio pipeline starts with (VAD, silence trimming,
    * segment boundaries): payload bytes read as 8-bit PCM samples
    * centered at 64 (so text stand-in payloads produce a sign-varying
    * waveform), `win` samples per window, per window the exact integer
    * energy Σs² and the sign-change count. Same batched `mapPartitions`
    * contract as [[decode]] — a real codec/resampler replaces the sample
    * extraction only; windowing, schema, and partition parallelism are
    * the production shape. Pure integer function of the payload →
    * oracle-gateable despite the stub. */
  def audioFeatures(df: DataFrame, win: Int = 64): Dataset[AudioWin] = {
    require(win > 0, "window must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[MediaRow]
      .flatMap { r =>
        val bytes = r.payload
        (0 until (bytes.length + win - 1) / win).iterator.map { w =>
          val start = w * win
          val end = math.min(start + win, bytes.length)
          var energy = 0L
          var zc = 0L
          var prevNeg = false
          var first = true
          var i = start
          while (i < end) {
            val s = (bytes(i) & 0xff) - 64
            energy += s.toLong * s
            val neg = s < 0
            if (!first && neg != prevNeg) zc += 1
            prevNeg = neg
            first = false
            i += 1
          }
          AudioWin(r.doc_id, w, end - start, energy, zc)
        }
      }
  }

  final case class SceneCut(doc_id: Long, frame_idx: Int, diff: Long,
                            is_cut: Boolean)

  /** STUB scene-cut detection — the shot-boundary pass of a video
    * pipeline: consecutive fixed-width "frames" (byte windows) compared
    * by mean absolute per-position difference; a frame whose difference
    * from its predecessor exceeds `threshold` (scaled by the compared
    * width) marks a cut. Emits one row per frame TRANSITION (frame 1
    * onward). A real decoder swaps byte windows for pixel buffers; the
    * windowing, pairwise-comparison shape, and threshold contract are
    * the production form. Short trailing frames compare over the
    * overlapping prefix only. Pure integers → oracle-EXACT. */
  def sceneCuts(df: DataFrame, frameBytes: Int = 64,
                threshold: Long = 32L): Dataset[SceneCut] = {
    require(frameBytes > 0, "frameBytes must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[MediaRow]
      .flatMap { r =>
        val bytes = r.payload
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (1 until nFrames).iterator.map { f =>
          val aStart = (f - 1) * frameBytes
          val bStart = f * frameBytes
          val width = math.min(frameBytes, bytes.length - bStart)
          var sum = 0L
          var i = 0
          while (i < width) {
            sum += math.abs((bytes(aStart + i) & 0xff) - (bytes(bStart + i) & 0xff))
            i += 1
          }
          SceneCut(r.doc_id, f, sum, sum > threshold * width)
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
