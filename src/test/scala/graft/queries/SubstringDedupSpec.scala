package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** d33's exact-substring span semantics on constructed corpora where
  * the expected maximal spans are enumerable by hand: a shared passage
  * at DIFFERENT alignments (what d17's fixed tiling misses), maximal
  * merging of overlapping windows, within-doc repetition, and the
  * sub-window floor.
  */
class SubstringDedupSpec extends SparkSpec {

  private val w = 5 // test window: small enough to hand-enumerate

  private def spans(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TrainingData.substringDedupSpans(rows.toDF("doc_id", "text"), w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a shared passage is found at ANY alignment and merges to one maximal span per doc") {
    // doc 1 carries the 8-token passage at tokens 4..11; doc 2 carries
    // it at 1..8 — shifted alignment, every fixed tiling splits it
    val passage = words("dup", 8)
    val out = spans(Seq(
      1L -> s"${words("ua", 3)} $passage ${words("ub", 4)}",
      2L -> s"$passage ${words("uc", 7)}"))
    // 8-token passage, w=5 → windows at relative offsets 0..3 merge
    // into exactly the passage's extent
    assert(out == Seq((1L, 4L, 11L, 4L), (2L, 1L, 8L, 4L)), out.toString)
  }

  test("within-doc repetition is duplication; disjoint islands stay separate rows") {
    val p = words("rep", 5)
    // one doc, passage at 1..5 and again at 9..13 (3 unique between)
    val out = spans(Seq(1L -> s"$p ${words("mid", 3)} $p"))
    assert(out == Seq((1L, 1L, 5L, 1L), (1L, 9L, 13L, 1L)), out.toString)
  }

  test("abutting duplicated spans merge; docs shorter than the window never match") {
    val a = words("pa", 5)
    val b = words("pb", 5)
    // doc 1 = A B back-to-back; docs 2/3 plant A and B separately, so
    // A's island [1,5] and B's island [6,10] abut in doc 1 → one span.
    // doc 4 is shorter than w and shares tokens with A — ignored.
    val out = spans(Seq(
      1L -> s"$a $b",
      2L -> s"$a ${words("ux", 6)}",
      3L -> s"${words("uy", 6)} $b",
      4L -> words("pa", 4)))
    // only the A-aligned (pos 1) and B-aligned (pos 6) windows repeat
    // corpus-wide — the straddling windows are unique to doc 1 — and
    // their spans [1,5] and [6,10] abut, so they merge into one row
    assert(out.filter(_._1 == 1L) == Seq((1L, 1L, 10L, 2L)), out.toString)
    assert(!out.exists(_._1 == 4L), out.toString)
    // the planted copies themselves are reported too
    assert(out.filter(_._1 == 2L) == Seq((2L, 1L, 5L, 1L)))
    assert(out.filter(_._1 == 3L) == Seq((3L, 7L, 11L, 1L)))
  }

  test("a corpus with no repeated window emits nothing") {
    assert(spans(Seq(1L -> words("qa", 30), 2L -> words("qb", 30))).isEmpty)
  }

  test("incremental spans from the window zone equal the batch recompute restricted to the delta") {
    import spark.implicits._
    import graft.operators.WindowZone
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cut = docs.count() * 4L / 5L
    val zone = tmpDir("winzone") + "/z"
    val wBig = 20 // the d33/d34 production width on real data
    WindowZone.create(spark, zone, wBig)
    WindowZone.append(docs.filter(col("doc_id") < cut), zone, batchId = 0L)
    val delta = docs.filter(col("doc_id") >= cut)
    val incr = WindowZone.incrementalSpans(delta, zone)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val batch = TrainingData.substringDedupSpans(docs, wBig)
      .filter(col("doc_id") >= cut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(incr == batch,
      s"incremental (${incr.size} spans) diverged from the batch recompute (${batch.size})")
    assert(incr.nonEmpty, "fixture lost its delta-crossing duplication signal")
    // replayed batch append (same batch id, byte-identical rows) is
    // absorbed by the reader's DISTINCT
    WindowZone.append(docs.filter(col("doc_id") < cut), zone, batchId = 0L)
    assert(WindowZone.incrementalSpans(delta, zone)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq == incr,
      "replayed zone batch changed the incremental spans")
    // width is geometry: same-width re-create is a no-op, change refused
    val fp = graft.core.Fs.fingerprint(spark, s"$zone/meta")
    WindowZone.create(spark, zone, wBig)
    assert(graft.core.Fs.fingerprint(spark, s"$zone/meta") == fp)
    val e = intercept[IllegalArgumentException] { WindowZone.create(spark, zone, 10) }
    assert(e.getMessage.contains("incompatible"))
    graft.core.Caches.release()
  }

  test("clean: spans are cut, untouched docs pass verbatim, fully-duplicated docs drop out") {
    import spark.implicits._
    val passage = words("dup", 8)
    val clean = TrainingData.substringClean(Seq(
        1L -> s"${words("ua", 3)} $passage ${words("ub", 4)}",
        2L -> passage, // nothing but the shared passage → dropped
        3L -> words("uz", 12)) // untouched → verbatim
      .toDF("doc_id", "text"), w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // doc 1 keeps its unique flanks; positions 4..11 are cut
    assert(clean == Seq(
      (1L, 7L, s"${words("ua", 3)} ${words("ub", 4)}"),
      (3L, 12L, words("uz", 12))), clean.toString)
  }
}
