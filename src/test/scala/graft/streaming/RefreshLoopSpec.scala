package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ZoneRebuild

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
  *      never flip a fate — only corpus growth can.
  */
class RefreshLoopSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("refresh lands between rounds and binds; same-history re-fit is decision-invariant") {
    def fates(refresh: Option[Long]) = {
      val root = java.nio.file.Files.createTempDirectory("st30spec")
      val m = EventStream.runProductionPipeline(spark, dir, root, refresh)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      (root, m)
    }
    val (root29, unrefreshed) = fates(None)
    graft.core.Fs.deleteRecursively(spark, root29.toString)
    val (root30, refreshed) = fates(Some(3L))
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
    // the zone at spec time also covers batch 3's feedback; the swap
    // instant saw history BELOW the round-3 slice — restrict to it
    val e = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val live = graft.operators.Dedup.md5ZoneRead(spark,
        root30.resolve("md5").toString)
      .select(col("keeper_id").as("doc_id")).distinct()
      .filter(col("doc_id") < e * 3L / 4L)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    ZoneRebuild.rebuild(spark, calDir) { staging =>
      graft.queries.TrainingData.calibrationThresholds(
          docs.join(live, Seq("doc_id"), "left_semi")
            .select(col("doc_id"), col("source"), col("text")))
        .write.parquet(staging)
    }
    assert(rows() == before,
      "same-history re-fit changed the published thresholds — the swap instant is not decision-invariant")
    graft.core.Caches.release()
    graft.core.Fs.deleteRecursively(spark, root30.toString)
  }
}
