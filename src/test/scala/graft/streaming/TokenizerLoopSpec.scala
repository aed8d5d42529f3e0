package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Bpe, Dedup, ZoneRebuild}
import graft.queries.TrainingData

/** st32's tokenizer-refresh invariants (round-3 ≡ refreshed-table
  * pricing is the driver oracle's job):
  *
  *   1. the refresh lands BETWEEN rounds, atomically: rounds 1-2 of
  *      the refreshed loop price identically to the unrefreshed
  *      posture (nothing retroactive), and round 3 DIFFERS (the
  *      re-fit table binds — a vacuous refresh would prove nothing);
  *   2. pricing is identical at the swap instant: a second
  *      `ZoneRebuild.rebuild` re-fit over UNCHANGED live history
  *      publishes a byte-identical merge table, so the cutover itself
  *      can never move a token count — only corpus growth can;
  *   3. the refreshing trigger is crash-replay sound: re-running
  *      batch 3's refresh + encode against the crash-point zone state
  *      (batch 3's own md5 appends landed) reproduces round 3's
  *      recorded priced rows exactly, because the re-fit self-excludes
  *      at the delta's minimum id.
  */
class TokenizerLoopSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tokenizer refresh lands between rounds, binds at round 3, and swaps/replays deterministically") {
    val rootU = java.nio.file.Files.createTempDirectory("st32specU")
    val un = EventStream.runTokenizerLoop(spark, dir, rootU)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    graft.core.Caches.release()
    val root = java.nio.file.Files.createTempDirectory("st32spec")
    val re = EventStream.runTokenizerLoop(spark, dir, root,
        refreshAtBatch = Some(3L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    graft.core.Caches.release()
    assert(un.keySet == re.keySet)
    // (1a) rounds 1-2 identical: the batch-3 refresh is not retroactive
    un.filter(_._2._1 <= 2).foreach { case (id, v) =>
      assert(re(id) == v,
        s"doc $id: a round-${v._1} token count moved under a batch-3 refresh")
    }
    // (1b) the refresh BINDS at the state level: the published zone
    // table is the re-fit, not the slice-0 fit. (The COUNT-level bind
    // is SF-dependent — at sf0.001 the two fits learn the same merge
    // SET in a different order, so per-doc token counts coincide; at
    // the driver's sf0.01 and at sf0.1 the sets genuinely diverge
    // ("lu" vs "al" enters the top-8) and the slice-routed oracle
    // proves round 3 priced under the re-fit, token count for token
    // count.)
    assert(Bpe.loadMerges(spark, rootU.resolve("bpe").toString) !=
        Bpe.loadMerges(spark, root.resolve("bpe").toString),
      "the re-fit published a table identical to the slice-0 fit — the refresh is vacuous")

    // (2) swap-instant invariance: the zone at spec time covers batch
    // 3's feedback — exactly the crash-point state a replayed batch-3
    // trigger sees. Re-fit under the production self-exclusion rule
    // (live keeper ids below the delta's minimum id) and swap again:
    // the published table must be byte-identical.
    val bpeZone = root.resolve("bpe").toString
    val before = Bpe.loadMerges(spark, bpeZone)
    val e = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ins3 = docs.filter(col("doc_id") >= e * 3L / 4L && col("doc_id") < e)
      .select(col("doc_id"), col("text"))
    val minIns = ins3.agg(min(col("doc_id"))).head.getLong(0)
    def liveBelowDelta() = Dedup.md5ZoneRead(spark,
        root.resolve("md5").toString)
      .select(col("keeper_id").as("doc_id")).distinct()
      .filter(col("doc_id") < minIns)
    def refit(): Unit =
      ZoneRebuild.rebuild(spark, bpeZone) { staging =>
        Bpe.saveMerges(spark, Bpe.train(
          docs.join(liveBelowDelta(), Seq("doc_id"), "left_semi"),
          col("text"), TrainingData.bpeVocabTop, TrainingData.bpeMerges),
          staging)
      }
    refit()
    assert(Bpe.loadMerges(spark, bpeZone) == before,
      "same-history re-fit changed the published merge table — the swap instant is not pricing-invariant")

    // (3) REPLAY: the whole batch-3 trigger — refresh + encode —
    // against the crash-point zone (the refit above IS the replayed
    // refresh) must reproduce round 3's recorded priced rows exactly.
    val replayed = TrainingData.bpeEncoded(ins3, Bpe.loadMerges(spark, bpeZone))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
      .toSet
    val recorded = spark.read.parquet(
        root.resolve("priced").toString + "/round=3")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
      .toSet
    assert(replayed == recorded,
      "replayed batch-3 refresh+encode diverged from the recorded round-3 priced rows")
    graft.core.Caches.release()
    graft.core.Fs.deleteRecursively(spark, rootU.toString)
    graft.core.Fs.deleteRecursively(spark, root.toString)
  }
}
