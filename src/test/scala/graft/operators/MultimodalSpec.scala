package graft.operators

import graft.SparkSpec

/** Real-PNG decode path of [[Multimodal]]: encoder/decoder round-trip,
  * corrupt-bytes → None, and the end-to-end extractFeatures contract
  * (decoded dims equal the fixture arithmetic; corrupt rows surface as
  * decode_ok=false instead of failing the task).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("ImageIoDecoder round-trips the JDK PNG encoder (header dims + 1 frame)") {
    for ((w, h, seed) <- Seq((16, 8, 0L), (47, 31, 5L), (21, 19, 123L))) {
      val bytes = Multimodal.pngBytes(w, h, seed)
      assert(Multimodal.ImageIoDecoder.decode(bytes)
        === Some((w.toLong, h.toLong, 1L)))
    }
  }

  test("ImageIoDecoder returns None for corrupt, garbage, and empty payloads") {
    val png = Multimodal.pngBytes(32, 24, 7L)
    assert(Multimodal.ImageIoDecoder.decode(png.take(png.length / 2)).isEmpty)
    assert(Multimodal.ImageIoDecoder.decode(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(Multimodal.ImageIoDecoder.decode(Array.emptyByteArray).isEmpty)
  }

  test("extractFeatures: decoded dims match fixture arithmetic; corrupt rows flagged") {
    val docs = (0L to 20L).map(id => (id, s"document body $id")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs))
      .collect().map(f => f.doc_id -> f).toMap
    for (id <- 0L to 20L) {
      val f = feats(id)
      if (id % 3 == 0) {
        assert(f.media_type == "image")
        if (Multimodal.isCorrupt(id)) { // id 0 here
          assert(!f.decode_ok && f.width.isEmpty && f.height.isEmpty && f.n_frames == 0L)
        } else {
          assert(f.decode_ok)
          assert(f.width.contains(Multimodal.imgWidth(id).toLong), s"id=$id")
          assert(f.height.contains(Multimodal.imgHeight(id).toLong), s"id=$id")
          assert(f.n_frames == 1L)
        }
      } else if (id % 3 == 1) {
        assert(f.media_type == "audio")
        assert(f.decode_ok)
        assert(f.width.contains(Multimodal.wavRate(id).toLong), s"id=$id")
        assert(f.height.contains(1L))
        assert(f.n_frames == Multimodal.wavSamples(id).toLong, s"id=$id")
      } else {
        assert(f.decode_ok && f.width.nonEmpty && f.height.nonEmpty)
      }
    }
  }

  test("WavDecoder round-trips the PCM fixture and rejects truncated/garbage payloads") {
    for ((rate, n, seed) <- Seq((8000, 256, 0L), (16000, 1255, 9L), (12000, 999, 42L))) {
      val wav = Multimodal.wavBytes(rate, n, seed)
      assert(Multimodal.WavDecoder.decode(wav) === Some((rate.toLong, 1L, n.toLong)))
      // header intact, data cut in half: frame count must NOT be trusted
      assert(Multimodal.WavDecoder.decode(wav.take(44 + n)).isEmpty)
    }
    assert(Multimodal.WavDecoder.decode(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(Multimodal.WavDecoder.decode(Array.emptyByteArray).isEmpty)
  }

  test("corrupt audio row (id%34=0 in the audio residue class) surfaces as decode_ok=false") {
    val docs = Seq((34L, "doc 34"), (37L, "doc 37")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(34L).media_type == "audio" && !feats(34L).decode_ok)
    assert(feats(34L).width.isEmpty && feats(34L).n_frames == 0L)
    assert(feats(37L).media_type == "audio" && feats(37L).decode_ok)
  }

  test("resizeTo: aspect-fit dims verified by re-decode; corrupt source flagged") {
    val docs = Seq(0L, 3L, 6L, 9L, 51L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
    val out = Multimodal.resizeTo(Multimodal.asMedia(docs), box = 64)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.keySet == Set(0L, 3L, 6L, 9L, 51L))
    for (id <- Seq(3L, 6L, 9L)) {
      val r = out(id)
      val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
      val side = math.max(w, h)
      assert(r.resize_ok, s"id=$id")
      assert(r.orig_w.contains(w.toLong) && r.orig_h.contains(h.toLong))
      assert(r.new_w.contains(math.max(1, w * 64 / side).toLong), s"id=$id")
      assert(r.new_h.contains(math.max(1, h * 64 / side).toLong), s"id=$id")
    }
    // 0 and 51 are corrupt image rows (id%51=0): no dims, flagged
    assert(!out(0L).resize_ok && out(0L).new_w.isEmpty)
    assert(!out(51L).resize_ok && out(51L).new_w.isEmpty)
  }
}
