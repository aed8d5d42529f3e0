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
  * header-only dimension read, no full pixel decode); audio rows carry
  * REAL PCM WAV payloads decoded by the in-JDK `javax.sound.sampled`
  * reader ([[WavDecoder]]). Corrupt payloads of either kind surface as a
  * None/`decode_ok=false` row instead of failing the job. Only VIDEO byte
  * decoding stays a deterministic digest-based stub ([[StubDecoder]]) —
  * this container has no video codecs; swap [[StubDecoder.decode]] for a
  * real codec and nothing else changes. [[resizeTo]] runs the full
  * decode → pixel transform → re-encode loop (aspect-fit nearest-neighbor
  * into a bounding box), the CPU shape of real image preprocessing.
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
    * not decode (`decode_ok=false`). The triple is media-generic: for
    * audio rows it carries (sample_rate, channels, n_frames) — one typed
    * feature row per media item regardless of modality, the union schema
    * a multimodal lake table wants.
    */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      width: Option[Long],
      height: Option[Long],
      n_frames: Long,
      decode_ok: Boolean)

  /** Output of [[audioStats]]; None stats when the payload did not
    * decode or drain fully.
    */
  case class AudioStats(
      doc_id: Long,
      n_samples: Option[Long],
      sum_abs: Option[Long],
      max_abs: Option[Long],
      energy: Option[Long],
      decode_ok: Boolean)

  /** Output of [[resizeTo]]; None dims when the source did not decode. */
  case class ResizedImage(
      doc_id: Long,
      orig_w: Option[Long],
      orig_h: Option[Long],
      new_w: Option[Long],
      new_h: Option[Long],
      resize_ok: Boolean)

  /** Output of [[phashImages]]; None hash when the payload did not
    * decode.
    */
  case class ImageHash(doc_id: Long, phash: Option[Long], decode_ok: Boolean)

  /** Perceptual 64-bit image hash (pHash): full pixel decode →
    * grayscale 32×32 block-average downscale (integer sums — no
    * float resampling ambiguity) → 2-D DCT-II → the 8×8 low-frequency
    * block thresholded at its own median. Content-level identity: two
    * PNGs of the SAME pixels under DIFFERENT encodings (filter choice,
    * compression level, re-encode round-trips) hash identically where
    * byte-level md5 ([[graft.operators.Dedup.exactByContent]]) sees two
    * distinct documents — the image twin of text near-dup, and small
    * pixel perturbations move few bits (Hamming-near), so the d11
    * pigeonhole machinery applies unchanged to image corpora. All math
    * is fixed-sequence IEEE doubles over deterministic integers —
    * bit-reproducible across runs and executors.
    */
  object PHash {
    private val N = 32
    private val cosTable: Array[Array[Double]] = Array.tabulate(N, N) {
      (u, x) => math.cos((2 * x + 1) * u * math.Pi / (2.0 * N))
    }

    def hash(payload: Array[Byte]): Option[Long] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) None else Some(hashImage(img))
      } catch { case _: Exception => None }

    private[graft] def hashImage(img: java.awt.image.BufferedImage): Long = {
      // grayscale 32×32 by integer block averaging over the source grid
      val (w, h) = (img.getWidth, img.getHeight)
      val gray = Array.ofDim[Double](N, N)
      var gy = 0
      while (gy < N) {
        val y0 = gy * h / N; val y1 = math.max(y0 + 1, (gy + 1) * h / N)
        var gx = 0
        while (gx < N) {
          val x0 = gx * w / N; val x1 = math.max(x0 + 1, (gx + 1) * w / N)
          var sum = 0L; var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              // integer luma (BT.601 weights scaled by 1000)
              sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)) / 1000L
              x += 1
            }
            y += 1
          }
          gray(gy)(gx) = sum.toDouble / ((y1 - y0).toLong * (x1 - x0))
          gx += 1
        }
        gy += 1
      }
      // 2-D DCT-II, rows then columns (separable; fixed op order)
      val tmp = Array.ofDim[Double](N, N)
      var u = 0
      while (u < N) {
        var v = 0
        while (v < N) {
          var s = 0.0; var x = 0
          while (x < N) { s += gray(u)(x) * cosTable(v)(x); x += 1 }
          tmp(u)(v) = s; v += 1
        }
        u += 1
      }
      val dct = Array.ofDim[Double](8, 8)
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0; var y = 0
          while (y < N) { s += tmp(y)(v) * cosTable(u)(y); y += 1 }
          dct(u)(v) = s; v += 1
        }
        u += 1
      }
      // median threshold over the 64 low-frequency coefficients,
      // EXCLUDING the DC term from the median (classic pHash: DC is
      // overall brightness and would bias the cut)
      val coeffs = for { i <- 0 until 8; j <- 0 until 8 if i != 0 || j != 0 }
        yield dct(i)(j)
      val sorted = coeffs.sorted
      val median = sorted(sorted.size / 2)
      var bits = 0L; var k = 0
      var i = 0
      while (i < 8) {
        var j = 0
        while (j < 8) {
          if (dct(i)(j) > median) bits |= (1L << k)
          k += 1; j += 1
        }
        i += 1
      }
      bits
    }

    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
  }

  /** Per-partition perceptual hashing of image rows ([[PHash]]); bad
    * payloads become `decode_ok=false` rows, never task failures.
    * Narrow plan — no shuffle.
    */
  def phashImages(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "image").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        PHash.hash(r.payload) match {
          case Some(h) => ImageHash(r.doc_id, Some(h), decode_ok = true)
          case None => ImageHash(r.doc_id, None, decode_ok = false)
        }
      }
    }
  }

  /** Deterministic stand-in for a video codec: digest-derived
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

  /** Real audio decode via the in-JDK `javax.sound.sampled` WAV reader:
    * sample rate / channels from the format header, duration from the
    * frame count. The stream is drained so TRUNCATED payloads (header
    * promises more frames than the bytes carry) surface as None rather
    * than a silently short decode — a decoder must never fail the task
    * over one bad row, and must never mistake a bad row for a good one.
    */
  object WavDecoder {
    /** (sample_rate, channels, n_frames), or None on malformed payloads. */
    def decode(payload: Array[Byte]): Option[(Long, Long, Long)] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val expectBytes = frames * fmt.getFrameSize
          var seen = 0L
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { seen += n; n = in.read(buf) }
          if (seen == expectBytes)
            Some((fmt.getSampleRate.toLong, fmt.getChannels.toLong, frames))
          else None
        } finally in.close()
      } catch { case _: Exception => None }
  }

  /** Real PCM sample statistics (m4): unlike [[WavDecoder]]'s
    * header-level features, this DRAINS THE SAMPLES — 16-bit mono LE
    * frames decoded to ints in one streamed pass, accumulating count,
    * sum|s|, max|s| and the exact integer energy Σs² (bounded by
    * 2³⁰·nSamples, far inside a Long). Sample pairing carries a byte
    * across read boundaries, so odd-sized reads can't shear the frames.
    * Returns None for malformed, truncated, or non-16-bit-mono payloads
    * (a stats row computed over sheared frames would be silently wrong —
    * the same never-mistake-bad-for-good rule the decoders follow).
    */
  object WavSampleStats {
    /** (n_samples, sum_abs, max_abs, energy), or None. */
    def decode(payload: Array[Byte]): Option[(Long, Long, Long, Long)] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.isBigEndian || fmt.getFrameSize != 2) None
          else {
            val frames = in.getFrameLength
            var seen = 0L; var sumAbs = 0L; var maxAbs = 0L; var energy = 0L
            var lo = -1 // pending low byte when a read ends mid-frame
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) {
              var i = 0
              while (i < n) {
                if (lo < 0) { lo = buf(i) & 0xff }
                else {
                  val s = ((buf(i) << 8) | lo).toShort.toLong
                  val a = math.abs(s)
                  sumAbs += a; energy += s * s
                  if (a > maxAbs) maxAbs = a
                  lo = -1
                }
                i += 1
              }
              seen += n
              n = in.read(buf)
            }
            if (lo < 0 && seen == frames * 2L)
              Some((frames, sumAbs, maxAbs, energy))
            else None // truncated or sheared: never report partial stats
          }
        } finally in.close()
      } catch { case _: Exception => None }
  }

  /** Output of [[fingerprintAudio]]; None hash when the payload did not
    * decode (or is too short to segment).
    */
  case class AudioHash(doc_id: Long, ahash: Option[Long], decode_ok: Boolean)

  /** 60-bit acoustic fingerprint (m6): the Haitsma-Kalker energy-delta
    * construction reduced to its time axis — the sample stream is cut
    * into 61 contiguous segments (integer boundaries `i·61 div n`), each
    * segment's EXACT integer energy Σs² accumulated in one streamed
    * pass, and bit k−1 records whether segment k's energy rose against
    * segment k−1. Deltas, not absolute energies, so the hash is
    * invariant under uniform gain (scaling every sample scales every
    * segment energy alike, preserving each comparison) and
    * Hamming-near under local edits (one corrupted window flips only
    * the two bits whose comparisons straddle it) — which is exactly
    * what [[Dedup.hammingPairs]] needs to block audio corpora the same
    * way it blocks SimHash text (d11) and pHash images (d16). 60 bits,
    * not 64, keeps the value in BIGINT-positive range so the SQL oracle
    * can rebuild it bit-for-bit from the fixture's sample recurrence —
    * unlike m5's pixel hashes this fingerprint is integer-exact
    * end-to-end. Payloads shorter than 61 samples cannot be segmented
    * and report None (never a hash over empty segments).
    */
  object AudioEnergyHash {
    private[graft] val Segments = 61

    def decode(payload: Array[Byte]): Option[Long] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.isBigEndian || fmt.getFrameSize != 2) None
          else {
            val frames = in.getFrameLength
            if (frames < Segments) None
            else {
              val energy = new Array[Long](Segments)
              var idx = 0L; var seen = 0L; var lo = -1
              val buf = new Array[Byte](8192)
              var n = in.read(buf)
              while (n >= 0) {
                var i = 0
                while (i < n) {
                  if (lo < 0) { lo = buf(i) & 0xff }
                  else {
                    val s = ((buf(i) << 8) | lo).toShort.toLong
                    energy((idx * Segments / frames).toInt) += s * s
                    idx += 1; lo = -1
                  }
                  i += 1
                }
                seen += n
                n = in.read(buf)
              }
              if (lo < 0 && seen == frames * 2L) {
                var bits = 0L; var k = 1
                while (k < Segments) {
                  if (energy(k) > energy(k - 1)) bits |= (1L << (k - 1))
                  k += 1
                }
                Some(bits)
              } else None // truncated/sheared: same rule as WavSampleStats
            }
          }
        } finally in.close()
      } catch { case _: Exception => None }
  }

  /** Per-partition acoustic fingerprinting of the media table's AUDIO
    * rows ([[AudioEnergyHash]]); bad payloads become `decode_ok=false`
    * rows, never task failures. Narrow typed map, no shuffle.
    */
  def fingerprintAudio(media: Dataset[MediaRow]): Dataset[AudioHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "audio").mapPartitions { rows =>
      rows.map { r =>
        AudioEnergyHash.decode(r.payload) match {
          case Some(h) => AudioHash(r.doc_id, Some(h), decode_ok = true)
          case None => AudioHash(r.doc_id, None, decode_ok = false)
        }
      }
    }
  }

  /** Per-partition audio statistics over the media table's AUDIO rows
    * (m4): real decode doing strictly more work than the oracle's
    * arithmetic re-derivation. Narrow typed map, no shuffle.
    */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "audio").mapPartitions { rows =>
      rows.map { r =>
        WavSampleStats.decode(r.payload) match {
          case Some((n, sumAbs, maxAbs, energy)) =>
            AudioStats(r.doc_id, Some(n), Some(sumAbs), Some(maxAbs), Some(energy),
              decode_ok = true)
          case None =>
            AudioStats(r.doc_id, None, None, None, None, decode_ok = false)
        }
      }
    }
  }

  /** Deterministic PCM WAV fixture (16-bit mono RIFF): rate/length are
    * pure functions of the seed, samples a fixed integer recurrence — the
    * audio twin of [[pngBytes]]: a REAL encoder/decoder round-trip whose
    * expected features stay arithmetic for the SQL oracle.
    */
  private[graft] def wavBytes(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort(((((i * 2654435761L + seed) % 65536L) - 32768L)).toShort)
      i += 1
    }
    bb.array()
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
  /** Every 51st doc (51 = 3·17 → always an image row under the %3 split)
    * ships a truncated payload to exercise the corrupt-image path.
    */
  private[graft] def isCorrupt(id: Long): Boolean = id % 51 == 0

  /** Audio params as pure functions of the id (same contract as the
    * image dims); 34 = 2·17 intersects the audio residue class (id≡1
    * mod 3) so some audio rows are truncated mid-data — the header
    * parses but the drain check in [[WavDecoder]] must reject them.
    */
  private[graft] def wavRate(id: Long): Int = (8000 + (id % 5) * 2000).toInt
  private[graft] def wavSamples(id: Long): Int = (256 + id % 1000).toInt
  private[graft] def isCorruptAudio(id: Long): Boolean = id % 34 == 0

  /** Wrap a text corpus as media rows: image rows get a real generated
    * PNG payload (deterministic dims; every 51st truncated), audio rows
    * a real PCM WAV payload (deterministic rate/length; truncated when
    * id%34=0), video rows keep utf-8 payload bytes for the stub codec.
    * Stands in for reading a binary column off the lake; typed map,
    * partition-parallel, no shuffle.
    */
  def asMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    // widen BEFORE the decode map: payload synthesis + every downstream
    // codec pass is the expensive per-row step, and a single-row-group
    // input would otherwise run it as ONE task (graft.core.Tables.widened
    // — a no-op branch once input splits ≥ cores)
    graft.core.Tables.widened(df.select(col("doc_id"), col("text")))
      .as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val mediaType =
          if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        val payload = mediaType match {
          case "image" =>
            val png = pngBytes(imgWidth(id), imgHeight(id), seed = id)
            if (isCorrupt(id)) png.take(png.length / 2) else png
          case "audio" =>
            val wav = wavBytes(wavRate(id), wavSamples(id), seed = id)
            // cut mid-data: the 44-byte header stays intact and claims
            // the full frame count
            if (isCorruptAudio(id)) wav.take(44 + wavSamples(id)) else wav
          case _ => text.getBytes("UTF-8")
        }
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
        r.media_type match {
          case "image" =>
            ImageIoDecoder.decode(r.payload) match {
              case Some((w, h, frames)) =>
                MediaFeatures(r.doc_id, r.media_type, Some(w), Some(h), frames, decode_ok = true)
              case None =>
                MediaFeatures(r.doc_id, r.media_type, None, None, 0L, decode_ok = false)
            }
          case "audio" =>
            WavDecoder.decode(r.payload) match {
              case Some((rate, channels, frames)) =>
                MediaFeatures(r.doc_id, r.media_type, Some(rate), Some(channels), frames,
                  decode_ok = true)
              case None =>
                MediaFeatures(r.doc_id, r.media_type, None, None, 0L, decode_ok = false)
            }
          case _ =>
            val (w, h, frames) = StubDecoder.decode(r.payload)
            MediaFeatures(r.doc_id, r.media_type, Some(w), Some(h), frames, decode_ok = true)
        }
      }
    }
  }

  /** Real image preprocessing: full pixel decode → aspect-fit
    * nearest-neighbor resize into a `box`×`box` bounding box → PNG
    * re-encode, per partition, streaming. Target dims use integer
    * arithmetic (`max(1, d·box / max(w,h))`) so the oracle re-derives
    * them; `resize_ok` additionally requires the re-encoded frame to
    * decode back to exactly the target dims — the transform is verified
    * on-row, not assumed. Corrupt sources become `resize_ok=false` rows,
    * never task failures. Narrow plan: no shuffle introduced.
    */
  def resizeTo(media: Dataset[MediaRow], box: Int): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "image").as[MediaRow].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          if (img == null) ResizedImage(r.doc_id, None, None, None, None, resize_ok = false)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val side = math.max(w, h)
            val nw = math.max(1, w * box / side)
            val nh = math.max(1, h * box / side)
            val out = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(img, 0, 0, nw, nh, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            val ok = ImageIoDecoder.decode(bos.toByteArray)
              .exists { case (dw, dh, _) => dw == nw && dh == nh }
            ResizedImage(r.doc_id, Some(w.toLong), Some(h.toLong),
              Some(nw.toLong), Some(nh.toLong), resize_ok = ok)
          }
        } catch {
          case _: Exception =>
            ResizedImage(r.doc_id, None, None, None, None, resize_ok = false)
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
