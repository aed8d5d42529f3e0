package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media as opaque `binary` payloads with a
  * typed metadata struct, plus decode / feature-extract / frame-sample
  * stages.
  *
  * Spark-side plumbing is real: explicit schemas, typed Dataset rows, a
  * per-partition batch iterator (the shape a native decoder wants —
  * amortize codec init per PARTITION, not per row), and narrow plans (no
  * shuffle introduced by decode). Image rows carry REAL PNG payloads and
  * are decoded by the in-JDK `javax.imageio` reader ([[ImageIoDecoder]] —
  * header-only dimension read, no full pixel decode); corrupt payloads
  * surface as a None/`decode_ok=false` row instead of failing the job.
  * Audio/video byte decoding stays a deterministic digest-based stub
  * ([[StubDecoder]]) — this container has no audio/video codecs — so
  * tests and the DuckDB oracle can verify that plumbing end to end. Swap
  * [[StubDecoder.decode]] for a real codec and nothing else changes.
  *
  * Scale notes: payloads ride the executors as column values; feature
  * extraction is mapPartitions (one decoder init per partition, streaming
  * iterator — no materialized batch). Frame sampling is a lateral explode
  * bounded by the decoded frame count, so output cardinality is
  * controlled.
  */
object Multimodal {

  /** One media item: payload + metadata the lake would store alongside. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features; `width`/`height` are None when the payload did
    * not decode (`decode_ok=false`).
    */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      width: Option[Long],
      height: Option[Long],
      n_frames: Long,
      decode_ok: Boolean)

  /** Deterministic stand-in for an audio/video codec: digest-derived
    * pseudo-features, reproducible from the bytes alone in any engine.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Long, Long, Long) = {
      val md5hex = MessageDigest.getInstance("MD5").digest(payload)
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md5hex.substring(0, 15), 16)
      val w = 64L + h % 1857L // [64, 1920]
      val ht = 64L + (h / 1857L) % 1017L // [64, 1080]
      val frames = 1L + h % 7L // [1, 7]
      (w, ht, frames)
    }
  }

  /** Real image decode via the in-JDK `javax.imageio` PNG reader. Reads
    * dimensions and frame count from the image HEADER (`reader.getWidth`
    * never decodes pixel data) — at corpus scale that is the difference
    * between scanning bytes and decompressing every image. Any
    * malformed/truncated payload yields None; a decoder must never fail
    * the task over one bad row.
    */
  object ImageIoDecoder {
    def decode(payload: Array[Byte]): Option[(Long, Long, Long)] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
              val w = reader.getWidth(0).toLong
              val h = reader.getHeight(0).toLong
              val frames = reader.getNumImages(/*allowSearch=*/ true).toLong
              // a truncated stream can still present a parseable header;
              // force the first frame so corruption actually surfaces
              reader.read(0)
              Some((w, h, frames))
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
  }

  /** Deterministic PNG fixture: dims + pixels are pure functions of the
    * seed, encoded with the JDK PNG writer — so the round-trip through
    * [[ImageIoDecoder]] tests a REAL encoder/decoder pair while the
    * expected dimensions stay arithmetic any engine (and the SQL oracle)
    * can re-derive.
    */
  private[graft] def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((x * 31 + y) * 131 + seed) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image dims as pure functions of the id — the contract the oracle
    * checks the decoded values against.
    */
  private[graft] def imgWidth(id: Long): Int = (16 + id % 32).toInt
  private[graft] def imgHeight(id: Long): Int = (8 + (id / 7) % 24).toInt
  /** Every 51st doc (co-prime with the %3 media split) ships a truncated
    * payload to exercise the corrupt-row path.
    */
  private[graft] def isCorrupt(id: Long): Boolean = id % 51 == 0

  /** Wrap a text corpus as media rows: image rows get a real generated
    * PNG payload (deterministic dims; every 51st truncated), audio/video
    * keep utf-8 payload bytes for the stub codec. Stands in for reading a
    * binary column off the lake; typed map, partition-parallel, no
    * shuffle.
    */
  def asMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val mediaType =
          if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        val payload =
          if (mediaType == "image") {
            val png = pngBytes(imgWidth(id), imgHeight(id), seed = id)
            if (isCorrupt(id)) png.take(png.length / 2) else png
          } else text.getBytes("UTF-8")
        MediaRow(id, mediaType, payload)
      }
    }
  }

  /** Per-partition feature extraction: decoder initialized once per
    * partition, rows streamed through it; bad payloads become
    * `decode_ok=false` rows, never task failures.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // Per-partition codec init happens here, before the row loop (for
      // ImageIO: drop the disk-backed stream cache — payloads are
      // in-memory byte arrays).
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        if (r.media_type == "image")
          ImageIoDecoder.decode(r.payload) match {
            case Some((w, h, frames)) =>
              MediaFeatures(r.doc_id, r.media_type, Some(w), Some(h), frames, decode_ok = true)
            case None =>
              MediaFeatures(r.doc_id, r.media_type, None, None, 0L, decode_ok = false)
          }
        else {
          val (w, h, frames) = StubDecoder.decode(r.payload)
          MediaFeatures(r.doc_id, r.media_type, Some(w), Some(h), frames, decode_ok = true)
        }
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
