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
      } else {
        assert(f.decode_ok && f.width.nonEmpty && f.height.nonEmpty)
      }
    }
  }
}
