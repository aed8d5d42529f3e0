package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{AnnIndexZone, Dedup, SignatureZone}

/** Gate semantics of the three-gate semantic admission (c12/st24) at
  * fixture level: each gate must fire on exactly the duplication class
  * it exists for, with the documented precedence (quality, then exact,
  * then text near-dup, then semantic) and `dup_of` pointing at the
  * oldest equivalent document. The load-bearing case is the PARAPHRASE:
  * no shared shingles (invisible to the text gates by construction)
  * but a cosine-close vector — only the ANN-zone gate can catch it,
  * which is the reason the gate exists.
  */
class AdmissionSpec extends SparkSpec {

  // ~115 chars, stopword-rich (x3 score comfortably positive)
  private val base = "the quick brown fox jumps over the lazy dog and " +
    "runs to the old mill in the quiet town where it is safe and warm"
  // one trailing token changed: 3-shingle jaccard ≈ 21/23 = 0.91 ≥ 0.8
  private val nearVariant = base.dropRight(4) + "cold"
  // textually disjoint from base (no 3-shingle reaches 0.8 jaccard)
  private val paraphrase = "a calm river flows past the green hills and " +
    "the small boats drift in the morning light to the far shore of the bay"
  private val unique = "many bright students read the long books of the " +
    "great library and they learn the deep ideas in the winter nights"
  private val junk = "12345!!! ??? 999 $$$ 000"

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(64)(i => ((i * 31 + seed * 7) % 13 - 6) / 6.0f)

  test("each gate fires on its duplication class; paraphrases reach semantic_dup") {
    import spark.implicits._
    val hist = Seq((0L, base)).toDF("doc_id", "text")
    val delta = Seq(
      (10L, base),         // exact copy of history      -> exact_dup
      (11L, nearVariant),  // high shingle overlap       -> near_dup
      (12L, paraphrase),   // no shingles, same vector   -> semantic_dup
      (13L, unique),       // unique text, far vector    -> kept
      (14L, junk)          // fails the quality gate     -> low_quality
    ).toDF("doc_id", "text")
    val docs = hist.union(delta)
    // the paraphrase's vector is IDENTICAL to history's (same SRP
    // bucket by construction, cosine 1.0); the unique doc's is the
    // NEGATION (opposite side of every hyperplane, cosine -1.0)
    val e0 = vec(1)
    val emb = Seq(
      (0L, e0), (10L, vec(2)), (11L, vec(3)),
      (12L, e0), (13L, e0.map(-_)), (14L, vec(4))
    ).toDF("vec_id", "embedding")

    val z = tmpDir("admission")
    Dedup.md5ZoneAppend(hist, col("text"), col("doc_id"), s"$z/md5")
    SignatureZone.build(spark, hist, s"$z/sig",
      TrainingData.shingleN, TrainingData.minhashK, TrainingData.minhashBands)
    AnnIndexZone.create(spark, s"$z/ann", expectedCount = 6L): Unit
    AnnIndexZone.appendIndex(emb.filter(col("vec_id") < 10L), s"$z/ann")

    val got = TrainingData
      .semanticAdmissionDecisions(spark, docs, emb, delta,
        s"$z/md5", s"$z/sig", s"$z/ann")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap

    assert(got(10L) == ("exact_dup", 0L), got)
    assert(got(11L) == ("near_dup", 0L), got)
    assert(got(12L) == ("semantic_dup", 0L), got)
    assert(got(13L) == ("kept", -1L), got)
    assert(got(14L)._1 == "low_quality", got)
  }

  test("precedence: an exact dup with a cosine-close vector never reaches the vector gate") {
    import spark.implicits._
    // doc 10 is BOTH an exact copy and vector-identical to history —
    // the fate must be exact_dup (the cheaper gate decides first), and
    // the vector gate must not even see it (it only probes kept docs)
    val hist = Seq((0L, base)).toDF("doc_id", "text")
    val delta = Seq((10L, base)).toDF("doc_id", "text")
    val e0 = vec(1)
    val emb = Seq((0L, e0), (10L, e0)).toDF("vec_id", "embedding")
    val z = tmpDir("admission2")
    Dedup.md5ZoneAppend(hist, col("text"), col("doc_id"), s"$z/md5")
    SignatureZone.build(spark, hist, s"$z/sig",
      TrainingData.shingleN, TrainingData.minhashK, TrainingData.minhashBands)
    AnnIndexZone.create(spark, s"$z/ann", expectedCount = 2L): Unit
    AnnIndexZone.appendIndex(emb.filter(col("vec_id") < 10L), s"$z/ann")
    val got = TrainingData
      .semanticAdmissionDecisions(spark, hist.union(delta), emb, delta,
        s"$z/md5", s"$z/sig", s"$z/ann")
      .collect()
    assert(got.length == 1 && got(0).getString(1) == "exact_dup" &&
      got(0).getLong(2) == 0L, got.mkString(";"))
  }

  test("media gate (c17) is a monotone refinement of c12: only kept docs become media_dup") {
    // The fourth dedup modality must change NOTHING upstream: every
    // doc's c17 fate equals its c12 fate except kept → media_dup
    // rewrites (with dup_of = the media component minimum, an id
    // strictly below the doc's). And the gate must BIND on the
    // fixture: at least one survivor is media-deduped, proving the
    // Hamming-zone probe is live, not a vacuous pass-through.
    val dir = "/root/testdata/sf0.001"
    def fates(f: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame) =
      f(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val c12 = fates(TrainingData.c12AdmissionSemantic _)
    val c17 = fates(TrainingData.c17AdmissionMedia _)
    assert(c12.keySet == c17.keySet)
    var rewrites = 0
    c12.foreach { case (id, (f12, d12)) =>
      val (f17, d17x) = c17(id)
      if (f17 == "media_dup") {
        assert(f12 == "kept", s"doc $id: media_dup must rewrite a kept fate, was $f12")
        assert(d17x >= 0 && d17x < id, s"doc $id: media dup_of $d17x must be an older id")
        rewrites += 1
      } else assert((f12, d12) == (f17, d17x),
        s"doc $id: c17 changed a non-media fate $f12/$d12 -> $f17/$d17x")
    }
    assert(rewrites > 0, "fixture lost its media-dup signal — the gate never fired")
    graft.core.Caches.release()
  }

  test("calibrated gate (c13) equalizes admission across disjoint-score-band sources") {
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // Two sources with DISJOINT raw-score bands — the systematic-bias
    // trap x23's scaladoc describes: every "gen" doc outscores every
    // "strict" doc, so the raw global threshold admits all of gen and
    // cuts through the middle of strict. Texts interleave stopwords
    // with per-doc-unique fillers so no 3-shingle is ever shared (the
    // dedup gates stay silent and the test isolates the quality gate);
    // "strict" docs carry a long digit run (digit-ratio penalty) and
    // exceed the 400-char bonus band.
    val stops = Seq("the", "and", "of", "to", "in", "is")
    // digit-free fillers (ids letter-encoded): a digit inside a filler
    // token would feed the digit-ratio penalty and skew scores BETWEEN
    // history and delta (their ids differ in digit count)
    def enc(n: Long): String = n.toString.map(c => ('a' + (c - '0')).toChar)
    def mk(src: String, id: Long, nStop: Int, digits: Int): (Long, String, String) = {
      val toks = (0 until 12).flatMap(i =>
        (if (i < nStop) Seq(stops(i % 6)) else Nil) :+ s"x$src${enc(id)}v${enc(i.toLong)}")
      (id, src, toks.mkString(" ") + (if (digits > 0) " " + "7" * digits else ""))
    }
    val hist = ((0 until 10).map(i => mk("gen", i.toLong, 3 + i, 0)) ++
      (0 until 10).map(i => mk("strict", 10L + i, i, 300)))
      .toDF("doc_id", "source", "text")
    val delta = ((0 until 10).map(i => mk("gen", 100L + i, 3 + i, 0)) ++
      (0 until 10).map(i => mk("strict", 110L + i, i, 300)))
      .toDF("doc_id", "source", "text")
    val docs = hist.union(delta).select(col("doc_id"), col("text"))
    val z = tmpDir("calib")
    graft.operators.Dedup.md5ZoneAppend(hist, col("text"), col("doc_id"), s"$z/md5")
    graft.operators.SignatureZone.build(spark,
      hist.select(col("doc_id"), col("text")), s"$z/sig",
      TrainingData.shingleN, TrainingData.minhashK, TrainingData.minhashBands)
    def admittedPerSource(cal: Option[DataFrame]): Map[String, Long] =
      TrainingData.admissionDecisions(spark, docs, delta,
          s"$z/md5", s"$z/sig", cal)
        .filter(col("fate") === "kept")
        .join(delta.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val raw = admittedPerSource(None)
    val cal = admittedPerSource(
      Some(TrainingData.calibrationThresholds(hist)))
    graft.core.Caches.release()
    // raw global threshold: the generous-scale source dominates
    assert(raw.getOrElse("gen", 0L) == 10L, s"raw=$raw")
    assert(raw.getOrElse("strict", 0L) <= 6L, s"raw=$raw")
    // calibrated: each source clears its OWN history median — admission
    // pressure equalizes (6 = docs at/above the lower median of 10)
    assert(cal.get("gen") == cal.get("strict"), s"cal=$cal")
    assert(cal.getOrElse("gen", 0L) == 6L, s"cal=$cal")
  }
}
