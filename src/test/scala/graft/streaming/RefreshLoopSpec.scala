package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Similarity, ZoneRebuild}

/** st30's refresh-discipline invariants (round-3 ≡ refreshed-batch
  * semantics is the driver oracle's job):
  *
  *   1. the refresh lands BETWEEN rounds, atomically: rounds 1-2 of
  *      the refreshed loop are fate-identical to st29's (nothing
  *      retroactive), and round 3 DIFFERS (the refresh binds — a
  *      no-op re-fit would make the whole entry vacuous);
  *   2. decisions are identical at the swap instant: a second
  *      `ZoneRebuild.rebuild` re-fit over UNCHANGED live history swaps
  *      in byte-identical threshold rows, so the cutover itself can
  *      never flip a fate — only corpus growth can;
  *   3. the refreshing trigger is crash-replay sound: re-running
  *      batch 3's refresh + decide against zones that already hold
  *      batch 3's own feedback appends (the crash-point state)
  *      reproduces round 3's recorded fates exactly, because the
  *      re-fit self-excludes at the delta's minimum id.
  */
class RefreshLoopSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("refresh lands between rounds and binds; same-history re-fit is decision-invariant") {
    // the unrefreshed (st29-posture) baseline is the shared
    // LoopFixtures staging — one 4-batch loop per JVM, not per suite
    val unrefreshed = LoopFixtures.unrefreshed(spark, dir)._2
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val root30 = java.nio.file.Files.createTempDirectory("st30spec")
    val refreshed = EventStream.runProductionPipeline(spark, dir, root30,
        refreshAtBatch = Some(3L))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(unrefreshed.keySet == refreshed.keySet)
    // (1a) rounds 1-2 identical: the batch-3 refresh is not retroactive
    val early = unrefreshed.filter(_._2._1 <= 2)
    early.foreach { case (id, v) =>
      assert(refreshed(id) == v, s"doc $id: a round-${v._1} fate moved under a batch-3 refresh")
    }
    // (1b) round 3 differs somewhere: the refreshed thresholds BIND
    val moved = unrefreshed.collect {
      case (id, (3L, f)) if refreshed(id)._2 != f => id
    }
    assert(moved.nonEmpty,
      "round 3 decided identically with and without the refresh — the re-fit is vacuous")

    // (2) swap-instant invariance: re-fit over the UNCHANGED live
    // history (what a replayed batch-3 trigger does) and swap again —
    // the published threshold rows must be byte-identical, so the
    // cutover alone can never change a decision
    val calDir = root30.resolve("cal").toString
    def rows() = spark.read.parquet(calDir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val before = rows()
    // the zone at spec time covers batch 3's feedback — EXACTLY the
    // crash-point state a replayed batch-3 trigger sees. Apply the
    // PRODUCTION self-exclusion rule (live filtered below the delta's
    // minimum id, EventStream.runProductionPipeline's refresh block):
    // the re-fit must land byte-identical thresholds.
    val e = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ins3 = docs.filter(col("doc_id") >= e * 3L / 4L && col("doc_id") < e)
      .select(col("doc_id"), col("source"), col("text"))
    val minIns = ins3.agg(min(col("doc_id"))).head.getLong(0)
    def liveBelowDelta() = graft.operators.Dedup.md5ZoneRead(spark,
        root30.resolve("md5").toString)
      .select(col("keeper_id").as("doc_id")).distinct()
      .filter(col("doc_id") < minIns)
    ZoneRebuild.rebuild(spark, calDir) { staging =>
      graft.queries.TrainingData.calibrationThresholds(
          docs.join(liveBelowDelta(), Seq("doc_id"), "left_semi")
            .select(col("doc_id"), col("source"), col("text")))
        .write.parquet(staging)
    }
    assert(rows() == before,
      "same-history re-fit changed the published thresholds — the swap instant is not decision-invariant")

    // (3) REPLAY: re-run the whole batch-3 trigger — refresh (both
    // outputs) + decide — against the crash-point zones (batch 3's
    // own feedback appends landed; post-stream OPTIMIZE is
    // read-invisible so the post-loop zones ARE that state) and
    // demand round 3's recorded fates, exactly. This is the
    // ProductionPipelineSpec five-gate replay argument extended to
    // the refresh: the self-excluded re-fit sees slices 0-2 only, so
    // the replayed thresholds/centroids equal the clean timeline's
    // and the decide lands identically.
    val centsDir = root30.resolve("cents").toString
    ZoneRebuild.rebuild(spark, centsDir) { staging =>
      Similarity.saveCentroids(spark, Similarity.kmeansFit(
        spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
          .join(liveBelowDelta().select(col("doc_id").as("vec_id")),
            Seq("vec_id"), "left_semi")), staging)
    }
    val replayed = graft.queries.TrainingData.semanticAdmissionDecisions(
        spark,
        graft.core.Tables(spark, dir, "documents"),
        graft.core.Tables(spark, dir, "embeddings"),
        ins3,
        root30.resolve("md5").toString,
        root30.resolve("sig").toString,
        root30.resolve("ann").toString,
        calThresholds = Some(spark.read.parquet(calDir)))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getDouble(3))).toSet
    val recorded = spark.read.parquet(
        root30.resolve("fates").toString + "/round=3")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getDouble(3))).toSet
    assert(replayed == recorded,
      "replayed batch-3 refresh+decide diverged from the recorded round-3 fates")
    graft.core.Caches.release()
    graft.core.Fs.deleteRecursively(spark, root30.toString)
  }
}
