package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted MinHash signature zone: storage-posture invariance
  * (history zone ≡ full-corpus zone ≡ replay-appended zone), semantics
  * vs the in-session banding operators, degraded-input paths, and the
  * geometry guards.
  */
class SignatureZoneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("incrementalPairs: zone postures are invisible; semantics match the in-session operators") {
    val d = docs
    val cut = d.count() * 4L / 5L
    val hist = d.filter(col("doc_id") < cut)
    val delta = d.filter(col("doc_id") >= cut)

    def got(zone: String) = SignatureZone
      .incrementalPairs(d, delta, zone, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(p => (p._1, p._2))

    // posture 1: batch-built history zone (d22's shape)
    val z1 = tmpDir("sigzone1") + "/z"
    SignatureZone.build(spark, hist, z1)
    val expected = got(z1)

    // reference semantics: the in-session LSH candidates over the FULL
    // corpus (uncapped, d3's operators), restricted to delta-member
    // pairs, verified by the exact all-pairs Jaccard (uncapped d2 mode)
    val sig = Dedup.minhash(Dedup.shingles(d, col("doc_id"), col("text"), 3), 16)
    val cand = Dedup.lshCandidatePairs(sig, 16, 4).filter(col("doc_b") >= cut)
    val sh = Dedup.shingles(d, col("doc_id"), col("text"), 3)
    val ref = cand.join(Dedup.jaccardPairs(sh, 0.8, maxDocFreq = None),
        Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(p => (p._1, p._2))
    assert(expected.nonEmpty, "degenerate fixture: no verified pairs at all")
    assert(expected == ref, "zone-served pairs diverge from the in-session operators")

    // posture 2: a zone that already holds the delta (a maintainer that
    // appended before querying) — the cross leg subsumes the internal
    // leg, DISTINCT absorbs it, result identical
    val z2 = tmpDir("sigzone2") + "/z"
    SignatureZone.build(spark, d, z2)
    assert(got(z2) == expected, "full-corpus zone diverged")

    // posture 3: replayed appends (duplicate band rows) are structurally
    // invisible
    SignatureZone.append(hist, z2)
    assert(got(z2) == expected, "replayed append changed the result")

    // posture 4: created-but-never-appended zone degrades to
    // delta-internal pairs only (here: the expected pairs whose BOTH
    // members are delta docs), not a crash
    val z3 = tmpDir("sigzone3") + "/z"
    SignatureZone.create(spark, z3)
    assert(got(z3) == expected.filter(_._1 >= cut), "empty zone != internal-only pairs")
  }

  test("c9 loop invariant: slice-wise appends leave the zones batch-built-equivalent after every round") {
    // the multi-delta admission loop's zone contract: after appending
    // slices 0..k, (a) the band table equals SignatureZone.build over
    // corpus-through-k (append is associative over slices — band rows
    // are a per-document pure function of the fixed geometry), and
    // (b) the min-aggregated md5 zone equals exactByContent over
    // corpus-through-k (min is a semilattice over per-slice minima).
    val d = docs
    val n = d.count()
    val bounds = (0 to 5).map(k => n * k / 5L)
    val root = tmpDir("c9zoneinv")
    val sig = s"$root/sig"
    val md5Zone = s"$root/md5"
    SignatureZone.create(spark, sig)
    for (k <- 0 until 5) {
      val slice = d.filter(col("doc_id") >= bounds(k) &&
        col("doc_id") < bounds(k + 1))
      SignatureZone.append(slice, sig)
      Dedup.exactByContent(slice, col("text"), col("doc_id"))
        .select(col("text_md5"), col("keeper_id"))
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(md5Zone)
      val through = d.filter(col("doc_id") < bounds(k + 1))
      // (a) band-table equivalence vs a fresh batch build through k
      val batchZone = tmpDir(s"c9zoneinv-batch$k") + "/z"
      SignatureZone.build(spark, through, batchZone)
      val looped = spark.read.parquet(s"$sig/bands")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSeq.sorted
      val batch = spark.read.parquet(s"$batchZone/bands")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSeq.sorted
      assert(looped == batch, s"band table diverged from batch build after round $k")
      // (b) md5-zone min-agg equivalence vs exactByContent through k
      val loopedMd5 = spark.read.parquet(md5Zone)
        .groupBy(col("text_md5")).agg(min(col("keeper_id")).as("keeper_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      val batchMd5 = Dedup.exactByContent(through, col("text"), col("doc_id"))
        .select(col("text_md5"), col("keeper_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      assert(loopedMd5 == batchMd5, s"md5 zone diverged from batch dedup after round $k")
    }
  }

  test("geometry guards: populated zones refuse re-create, re-build, and corrupt meta") {
    val z = tmpDir("sigzone4") + "/z"
    SignatureZone.build(spark, docs.limit(10), z)
    // same-geometry re-create is idempotent
    SignatureZone.create(spark, z)
    // geometry change on a populated zone must refuse
    val e1 = intercept[IllegalArgumentException] {
      SignatureZone.create(spark, z, shingleN = 2) }
    assert(e1.getMessage.contains("orphan"), e1.getMessage)
    // repeated build would double the band table — must refuse
    val e2 = intercept[IllegalArgumentException] {
      SignatureZone.build(spark, docs.limit(10), z) }
    assert(e2.getMessage.contains("append"), e2.getMessage)
    // band rows with no meta = corrupt zone — create must not stamp
    // fresh geometry over rows of unknown geometry
    graft.core.Fs.deleteRecursively(spark, s"$z/meta")
    val e3 = intercept[IllegalArgumentException] { SignatureZone.create(spark, z) }
    assert(e3.getMessage.contains("corrupt"), e3.getMessage)
  }
}
