package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** st29's engine-side invariants (fate-for-fate + shard-for-shard
  * answer equivalence against the batch semantics is the driver
  * oracle's job — st29's slice-tagged replay):
  *
  *   1. every per-round SHARD row is a kept doc of that round, and
  *      each round packs from offset 0 with contiguous doc_id-ordered
  *      offsets — rounds are independent shards, not a global stream;
  *   2. the round's shard equals [[graft.queries.TrainingData
  *      .admissionShardTail]] batch-recomputed from the round's OWN
  *      persisted fates and the SAME persisted refresh outputs — the
  *      per-micro-batch emission IS the batch posture (the shared-tail
  *      rule made observable);
  *   3. the calibrated gate BINDS: some doc fated low_quality carries
  *      a raw score > 0 (c8's raw gate would have admitted it), so the
  *      loop demonstrably decides with c13's thresholds, not the raw
  *      rule.
  */
class ProductionPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("per-round shards are kept-only, pack from zero, and equal the batch tail recompute") {
    // the staged run is shared with RefreshLoopSpec (one 4-batch loop
    // per JVM, not one per suite — the suite-budget rule)
    val (root, outRows) = LoopFixtures.unrefreshed(spark, dir)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val e = emb.count()
    assert(outRows.size == e - e / 4,
      "output must cover every decided delta doc across the three rounds")

    val fates = spark.read.parquet(root.resolve("fates").toString)
    val shards = spark.read.parquet(root.resolve("shards").toString)
    assert(shards.select(col("round")).distinct().count() == 3)

    // (1) shard rows ⊆ that round's kept fates; per-round offsets
    // restart at 0 and run contiguously in doc_id order
    val stray = shards.select(col("doc_id"), col("round"))
      .join(fates.filter(col("fate") === "kept")
        .select(col("doc_id"), col("round")), Seq("doc_id", "round"), "left_anti")
    assert(stray.count() == 0, "shard carries a non-kept or wrong-round doc")
    val rounds = shards.select(col("round"), col("doc_id"),
        col("n_tokens"), col("start_off"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(rounds.nonEmpty)
    rounds.foreach { case (rd, rows) =>
      val ordered = rows.sortBy(_._2)
      var off = 0L
      ordered.foreach { case (_, id, n, start) =>
        assert(start == off, s"round $rd doc $id: start_off $start != running $off")
        off += n
      }
    }

    // (2) round 2's shard == the batch tail over round 2's persisted
    // fates with the SAME persisted centroids (refresh outputs are
    // shared state, so the streamed and batch postures cannot drift)
    val cents = Similarity.loadCentroids(spark, root.resolve("cents").toString)
    val kept2 = spark.read.parquet(root.resolve("fates").toString + "/round=2")
      .filter(col("fate") === "kept")
      .select(col("doc_id"), col("quality_score"))
    val cids2 = Similarity.assignToCentroids(
        emb.join(kept2.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
        cents)
      .select(col("vec_id").as("doc_id"), col("cid"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batchTail = graft.queries.TrainingData
      .admissionShardTail(docs, kept2, cids2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val streamed = spark.read.parquet(root.resolve("shards").toString + "/round=2")
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("cid"), col("n_tokens"),
        col("start_off"), col("seq_start"), col("seq_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(batchTail == streamed,
      "round-2 streamed shard diverged from the batch tail recompute")
    assert(streamed.nonEmpty, "fixture lost its round-2 shard signal")

    // (3) the calibrated gate binds: a raw-positive doc was rejected
    val bound = fates.filter(col("fate") === "low_quality" &&
      col("quality_score") > 0.0)
    assert(bound.count() > 0,
      "no raw-positive doc was calibration-rejected — the c13 gate is not binding")
    graft.core.Caches.release()
    // root is the shared LoopFixtures staging — reaped at JVM exit
  }

  test("five-gate decide (st31's core) is replay-sound after its own feedback appends") {
    // The media gate joined the loop, so it must honor the same
    // crash-replay contract as the other four: a replayed batch whose
    // OWN zone rows (including its audio chunk rows) already landed
    // decides identically — the Hamming probe self-excludes at the
    // delta's minimum id. Pins the whole five-gate decide under that
    // replay, the SemanticLoopSpec argument extended to modality four.
    import graft.operators.{AnnIndexZone, Dedup, HammingZone, SignatureZone}
    import graft.queries.TrainingData
    import graft.queries.TrainingData.{minhashBands, minhashK, shingleN}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val e = emb.count()
    val cut = e / 2
    val hist = docs.filter(col("doc_id") < cut)
    val delta = docs.filter(col("doc_id") >= cut && col("doc_id") < e)
    val z = tmpDir("mediareplay")
    SignatureZone.create(spark, s"$z/sig", shingleN, minhashK, minhashBands)
    SignatureZone.append(hist, s"$z/sig")
    Dedup.md5ZoneAppend(hist, col("text"), col("doc_id"), s"$z/md5")
    AnnIndexZone.create(spark, s"$z/ann", expectedCount = e): Unit
    AnnIndexZone.appendIndex(
      emb.join(hist.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
      s"$z/ann")
    HammingZone.build(spark, TrainingData.audioSigs(hist), s"$z/ham",
      TrainingData.audioHammingBits, TrainingData.audioHammingMax,
      TrainingData.audioHammingChunks)
    def decide() = TrainingData.mediaAdmissionDecisions(spark, docs, emb, delta,
        s"$z/md5", s"$z/sig", s"$z/ann", s"$z/ham")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    val clean = decide()
    assert(clean.exists(_._2 == "media_dup"),
      "fixture lost its media-dup signal — the fifth gate never fired")
    // the crash-point state: the batch's own feedback already landed,
    // INCLUDING its audio chunk rows
    SignatureZone.append(delta, s"$z/sig")
    Dedup.md5ZoneAppend(delta, col("text"), col("doc_id"), s"$z/md5")
    AnnIndexZone.appendIndex(
      emb.join(delta.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
      s"$z/ann")
    HammingZone.append(TrainingData.audioSigs(delta), s"$z/ham")
    assert(decide() == clean,
      "replayed five-gate decide diverged after the batch's own zone appends")
    graft.core.Caches.release()
  }
}
