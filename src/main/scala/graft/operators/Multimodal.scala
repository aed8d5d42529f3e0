package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media as opaque `binary` payloads with a
  * typed metadata struct, plus decode / feature-extract / frame-sample
  * stages.
  *
  * Spark-side plumbing is real: explicit schemas, typed Dataset rows, a
  * per-partition batch iterator (the shape a native decoder wants —
  * amortize model/codec init per PARTITION, not per row), and narrow
  * plans (no shuffle introduced by decode). The actual byte decoding is a
  * STUB — this container has no image/audio codecs — implemented as a
  * deterministic digest-based fake so tests and the DuckDB oracle can
  * verify the plumbing end to end. Swap [[StubDecoder.decode]] for a real
  * codec and nothing else changes.
  *
  * Scale notes: payloads ride the executors as column values; feature
  * extraction is mapPartitions (one decoder init per partition, streaming
  * iterator — no materialized batch). Frame sampling is a lateral explode
  * bounded by `maxFrames`, so output cardinality is controlled.
  */
object Multimodal {

  /** One media item: payload + metadata the lake would store alongside. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (deterministic stub of a decoder's output). */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      content_md5: String,
      fake_width: Long,
      fake_height: Long,
      n_frames: Long)

  /** Deterministic stand-in for a codec: digest-derived pseudo-features.
    * Everything here is reproducible from the bytes alone, in any engine.
    */
  object StubDecoder {
    def decode(payload: Array[Byte], mediaType: String): (String, Long, Long, Long) = {
      val md5hex = MessageDigest.getInstance("MD5").digest(payload)
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md5hex.substring(0, 15), 16)
      val w = 64L + h % 1857L // [64, 1920]
      val ht = 64L + (h / 1857L) % 1017L // [64, 1080]
      val frames = 1L + h % 7L // [1, 7]
      (md5hex, w, ht, frames)
    }
  }

  /** Wrap a text corpus as media rows: utf-8 payload bytes + a
    * deterministic media_type. Stands in for reading a binary column off
    * the lake.
    */
  def asMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Per-partition feature extraction: decoder initialized once per
    * partition, rows streamed through it.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // Real codecs hook in here: per-partition init happens at this
      // point, before the row loop.
      rows.map { r =>
        val (md5hex, w, h, frames) = StubDecoder.decode(r.payload, r.media_type)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          md5hex, w, h, frames)
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame,
    * bounded by the decoded frame count. Narrow generate — no shuffle.
    */
  def sampleFrames(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_key", concat_ws(":", col("doc_id"), col("frame_idx")))
}
