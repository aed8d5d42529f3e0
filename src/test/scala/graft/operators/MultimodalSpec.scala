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

  private def encodeAs(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def paint(w: Int, h: Int)(px: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    img
  }

  test("pHash is content identity: same pixels under different lossless encodings hash equal, md5 does not") {
    for (seed <- Seq(3L, 8L, 21L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.pngBytes(40, 28, seed)))
      val a = encodeAs(img, "png")
      val b = encodeAs(img, "bmp") // same pixels, entirely different byte stream
      assert(!java.util.Arrays.equals(a, b))
      assert(Multimodal.PHash.hash(a).isDefined)
      assert(Multimodal.PHash.hash(a) == Multimodal.PHash.hash(b), s"seed=$seed")
    }
  }

  test("pHash: small pixel perturbation moves few bits; different structure many; brightness shift none") {
    // structured content, not the fixture gradient: pHash deliberately
    // ignores uniform brightness (DC), so "different" must mean
    // different STRUCTURE, and a global +16-on-every-channel shift is
    // asserted hash-IDENTICAL (the invariance that makes it a
    // perceptual hash, not a checksum)
    val grad = paint(40, 28)((x, y) => ((x * 6) << 16) | ((y * 8) << 8) | 0x40)
    val checker = paint(40, 28)((x, y) => if ((x / 4 + y / 4) % 2 == 0) 0xffffff else 0)
    val hGrad = Multimodal.PHash.hash(encodeAs(grad, "png")).get
    val hChecker = Multimodal.PHash.hash(encodeAs(checker, "png")).get
    assert(Multimodal.PHash.hamming(hGrad, hChecker) > 10,
      s"far dist ${Multimodal.PHash.hamming(hGrad, hChecker)}")
    // perturb the TEXTURED image: on a near-flat gradient the AC
    // spectrum is tiny and the median cut degenerate, so single-pixel
    // stability is only promised where there is structure to hold onto
    val nudged = paint(40, 28)((x, y) =>
      if (x == 3 && y == 3) 0x808080
      else if ((x / 4 + y / 4) % 2 == 0) 0xffffff else 0)
    val hNear = Multimodal.PHash.hash(encodeAs(nudged, "png")).get
    assert(Multimodal.PHash.hamming(hChecker, hNear) <= 10,
      s"near dist ${Multimodal.PHash.hamming(hChecker, hNear)}")
    val brighter = paint(40, 28)((x, y) =>
      (((x * 6) + 16) << 16) | (((y * 8) + 16) << 8) | 0x50)
    assert(Multimodal.PHash.hash(encodeAs(brighter, "png")).get == hGrad,
      "brightness shift must not move the hash")
  }

  test("d16 pigeonhole blocking equals brute-force all-pairs at Hamming <= 3") {
    // range includes the known near pairs of the generated corpus
    // (e.g. 303/399, 321/417 at Hamming 2)
    val docs = (0L to 450L).map(id => (id, s"document body $id")).toDF("doc_id", "text")
    val hashed = Multimodal.phashImages(Multimodal.asMedia(docs))
      .filter(_.decode_ok).collect().map(h => h.doc_id -> h.phash.get)
    val brute = (for {
      (ia, ha) <- hashed; (ib, hb) <- hashed
      if ia < ib && Multimodal.PHash.hamming(ha, hb) <= 3
    } yield (ia, ib, Multimodal.PHash.hamming(ha, hb).toLong)).toSet
    assert(brute.nonEmpty, "fixture degenerate: no near pairs to verify recall on")
    val hashesDf = hashed.toSeq.toDF("doc_id", "phash")
    val blocked = Dedup.hammingPairs(hashesDf, "phash", bits = 64, maxHamming = 3, chunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == brute) // pigeonhole recall is EXACT, not approximate
  }

  test("AudioEnergyHash: gain invariance, local-edit proximity, rejects bad payloads") {
    // a structured signal: rising-then-falling envelope over 610 samples
    def wav(samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1); bb.putShort(1)
      bb.putInt(8000); bb.putInt(16000)
      bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
      samples.foreach(s => bb.putShort(s))
      bb.array()
    }
    // even values only, so the half-gain copy below is EXACT scaling
    val base = Array.tabulate[Short](610)(i =>
      ((((i * 37) % 523) - 261 + (if ((i / 61) % 2 == 0) i % 61 else -(i % 61))) * 2).toShort)
    val h = Multimodal.AudioEnergyHash.decode(wav(base)).get
    // uniform gain: halving every sample scales every segment energy
    // alike, preserving each delta comparison -> identical hash
    val half = base.map(s => (s / 2).toShort)
    assert(Multimodal.AudioEnergyHash.decode(wav(half)).get == h,
      "uniform gain must not move the hash")
    // local edit: zeroing one 10-sample window can only flip the bits
    // whose comparisons straddle the touched segment
    val edited = base.clone()
    (300 until 310).foreach(edited(_) = 0)
    val hEdit = Multimodal.AudioEnergyHash.decode(wav(edited)).get
    val dist = java.lang.Long.bitCount(h ^ hEdit)
    assert(dist <= 3, s"local edit moved $dist bits")
    // rejections: truncated, too-short, stereo-shaped garbage
    val full = wav(base)
    assert(Multimodal.AudioEnergyHash.decode(full.take(44 + 610)).isEmpty)
    assert(Multimodal.AudioEnergyHash.decode(
      wav(Array.tabulate[Short](60)(_.toShort))).isEmpty) // < 61 samples
    assert(Multimodal.AudioEnergyHash.decode(Array.fill[Byte](64)(0x41)).isEmpty)
  }

  test("audio near-dup composition: hammingPairs over fingerprints finds the planted pair") {
    // the cross-modal claim on a THIRD modality: any Hamming signature
    // rides d11's blocking unchanged
    // range includes the known near pairs of the generated corpus
    // (355/358 at Hamming 0, 370/373 at Hamming 2)
    val docs = (0L to 400L).map(id => (id, s"document body $id")).toDF("doc_id", "text")
    val hashed = Multimodal.fingerprintAudio(Multimodal.asMedia(docs))
      .filter(_.decode_ok).collect().map(h => h.doc_id -> h.ahash.get)
    val brute = (for {
      (ia, ha) <- hashed; (ib, hb) <- hashed
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
    assert(brute.nonEmpty, "fixture degenerate: no near pairs to verify recall on")
    val hashesDf = hashed.toSeq.toDF("doc_id", "ahash")
    val blocked = Dedup.hammingPairs(hashesDf, "ahash", bits = 60, maxHamming = 3, chunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == brute) // exact recall, same machinery as d11/d16
  }

  test("pHash golden fixtures: committed PNGs hash to independently computed constants") {
    // m5/d16 are `no_oracle` forever (DuckDB cannot decode PNG), so this
    // is their strongest local pin — the m6 discipline applied to m5:
    // committed PNG bytes asserted bit-exact against 64-bit hashes that
    // were computed ONCE by an independent pure-python implementation
    // (pixel grids regenerated from the fixtures' formulas — never
    // through the JDK decoder — then the same integer-luma block
    // average, double DCT-II, and DC-excluded median cut). Both
    // implementations agreeing on all six values pins the whole path:
    // PNG encode → decode → downscale → DCT → threshold.
    val golden = Seq(
      "grad_32x32_1.png" -> 7798996064741726257L,
      "grad_40x28_3.png" -> -5909190748943605407L,
      "grad_47x31_5.png" -> 909365326941612481L,
      "grad_21x19_123.png" -> 4763351525700250697L,
      "grad_64x48_77.png" -> 7823828783566004805L,
      "checker_40x28.png" -> 67176770266901227L)
    for ((name, expected) <- golden) {
      val in = getClass.getResourceAsStream(s"/phash-golden/$name")
      assert(in != null, s"missing committed fixture $name")
      val bytes = try in.readAllBytes() finally in.close()
      assert(Multimodal.PHash.hash(bytes).contains(expected), name)
    }
    // and the committed gradient bytes still decode to the same pixels
    // pngBytes generates today (fixture ↔ generator coherence)
    val regen = Multimodal.pngBytes(40, 28, 3L)
    assert(Multimodal.PHash.hash(regen).contains(-5909190748943605407L))
  }

  test("phashImages: corrupt payloads flagged, hashes deterministic across runs") {
    val docs = (0L to 20L).map(id => (id, s"document body $id")).toDF("doc_id", "text")
    def run() = Multimodal.phashImages(Multimodal.asMedia(docs))
      .collect().map(h => h.doc_id -> h).toMap
    val out = run()
    assert(out.keySet == (0L to 20L).filter(_ % 3 == 0).toSet) // images only
    assert(!out(0L).decode_ok && out(0L).phash.isEmpty) // corrupt (0 % 51 == 0)
    assert(out(3L).decode_ok && out(3L).phash.isDefined)
    assert(run().view.mapValues(_.phash).toMap == out.view.mapValues(_.phash).toMap)
  }
}
