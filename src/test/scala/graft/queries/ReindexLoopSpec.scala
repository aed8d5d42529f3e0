package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{IvfIndexZone, ZoneRebuild}

/** c16's engine-side invariants (phase-for-phase answer equivalence
  * against both replayed fits is the driver oracle's job):
  *
  *   1. the reindex BINDS: the stale and re-fitted IVF rankings
  *      diverge — round 2 provably probes the re-fitted index, so the
  *      entry cannot be vacuous;
  *   2. the rebuilt zone IS the batch-built zone: the post-reindex
  *      phases equal d28's and d30's staged-zone answers row for row
  *      (retrain-and-re-encode ≡ build-from-scratch);
  *   3. swap-instant no-op: a SAME-corpus rebuild through the
  *      fingerprint-guarded cutover changes no answer — only corpus
  *      growth can move a ranking, never the swap itself.
  */
class ReindexLoopSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("reindex binds; rebuilt zones equal batch-built twins; same-corpus swap is a no-op") {
    val root = tmpDir("c16spec")
    val out = TrainingData.reindexLoop(spark, dir, root)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def phase(p: String) =
      out.filter(_._1 == p).map(t => (t._2, t._3, t._4)).toSet
    val stale = phase("ivf_stale")
    val reindexed = phase("ivf_reindexed")
    val pqReindexed = phase("pq_reindexed")
    assert(stale.nonEmpty && reindexed.nonEmpty && pqReindexed.nonEmpty)

    // (1) the reindex binds: the re-fitted quantizer routes/ranks
    // differently somewhere
    assert(stale != reindexed,
      "stale and re-fitted IVF rankings are identical — the reindex is vacuous")

    // (2) rebuilt ≡ batch-built: the swapped-in zones answer exactly
    // like d28's/d30's session-staged full-corpus zones
    val d28 = TrainingData.d28IvfTopk(spark, dir)
      .select(col("q_id"), col("vec_id"), col("nn_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(reindexed == d28,
      "post-reindex IVF answers diverged from the batch-built twin (d28)")
    val d30 = TrainingData.d30PqTopk(spark, dir)
      .select(col("q_id"), col("vec_id"), col("nn_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pqReindexed == d30,
      "post-reindex PQ answers diverged from the batch-built twin (d30)")

    // (3) swap-instant invariance: re-fit over the UNCHANGED corpus
    // and cut over again — the answers must not move
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def answers() = IvfIndexZone.topK(emb,
        TrainingData.ivfQueries(spark, dir), s"$root/ivf", k = 10, nprobe = 2)
      .select(col("q_id"), col("vec_id"), col("nn_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = answers()
    ZoneRebuild.rebuild(spark, s"$root/ivf") { staging =>
      IvfIndexZone.build(spark, emb, staging,
        k = TrainingData.ivfKmeansK, iters = 3): Unit
    }
    assert(answers() == before,
      "same-corpus rebuild changed an answer — the swap instant is not decision-invariant")
    graft.core.Caches.release()
  }
}
