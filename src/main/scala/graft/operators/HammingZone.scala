package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted Hamming-signature zone — the MULTIMODAL member of the
  * incremental-dedup zone family: text has the MinHash band zone
  * ([[SignatureZone]], d22) and vectors the SRP index ([[AnnIndexZone]],
  * d23); any modality that reduces to a ≤64-bit Hamming-space signature
  * (SimHash text, pHash images, the m6 audio energy fingerprint) gets
  * its incremental posture here. The batch operator
  * ([[Dedup.hammingPairs]], the Manku/Jain/Sarma WWW'07 pigeonhole
  * blocking) re-derives every signature per session — which for media
  * means RE-DECODING the entire history per delta; a deployment instead
  * stores each ingested item's signature chunks once and dedups each
  * delta against all of history by probing the stored chunks, never
  * touching history bytes again.
  *
  * Zone layout:
  *
  *   - `zoneDir/meta`: one row `(bits, max_hamming, chunks)` — the
  *     pigeonhole geometry is a PROPERTY of the zone, fixed at creation
  *     (chunk boundaries of stored and probing rows must align forever;
  *     the [[SignatureZone]] geometry argument). `chunks > max_hamming`
  *     keeps recall EXACT, not probabilistic: two signatures within
  *     max_hamming bits differ in at most max_hamming chunks, so they
  *     MUST agree exactly on at least one chunk.
  *   - `zoneDir/rows`: `(doc_id, c, v, sig)` — one row per chunk, the
  *     full signature carried alongside (8 bytes) so VERIFICATION never
  *     re-decodes history media: the exact Hamming distance is one
  *     xor+popcount over stored longs.
  *
  * Maintenance is DELTA-ONLY (each batch appends its own chunk rows —
  * `EventStream.streamHammingZone` maintains the zone from a
  * checkpointed stream); replay idempotency is STRUCTURAL (the read
  * side DISTINCTs candidates and the signature lookup, so duplicate
  * rows from a replayed batch change nothing). Deletes are tombstones
  * ([[delete]]), folded for good by [[optimize]] with the
  * snapshot-scoped clear (a tombstone appended during compaction
  * survives to the next pass).
  *
  * Scale shape of [[incrementalPairs]]: chunking the delta is a narrow
  * codegen'd projection; the zone probe is one (c, v)-keyed shuffled
  * hash join (both sides scale with data — the DELTA side builds, the
  * zone streams; bucket sizes are corpus/2^bitsPerChunk per chunk);
  * verification touches stored signatures for CANDIDATE docs only
  * (semi-join). Per-delta cost ∝ delta + chunk-bucket collisions,
  * never history size — and never a second decode of history bytes.
  */
object HammingZone {

  /** Create an empty zone with fixed pigeonhole geometry. Idempotent
    * for an empty or same-geometry zone; refuses to change geometry
    * under stored rows (chunk boundaries of stored rows would no longer
    * align with probes — the silent-miss path every zone guard closes).
    */
  def create(spark: SparkSession, zoneDir: String,
      bits: Int = 60, maxHamming: Int = 5, chunks: Int = 6): Unit = {
    require(chunks > maxHamming, "pigeonhole guarantee needs chunks > maxHamming")
    require(bits % chunks == 0, s"chunks must divide the $bits-bit signature")
    val hasMeta = graft.core.Fs.exists(spark, s"$zoneDir/meta")
    if (graft.core.Fs.exists(spark, s"$zoneDir/rows")) {
      require(hasMeta,
        s"HammingZone $zoneDir holds rows but no meta (corrupt zone — " +
          "likely an interrupted meta write); drop the zone and re-index")
      val (ob, oh, oc) = meta(spark, zoneDir)
      require(ob == bits && oh == maxHamming && oc == chunks,
        s"HammingZone $zoneDir already holds rows under bits=$ob " +
          s"max_hamming=$oh chunks=$oc; re-creating with bits=$bits " +
          s"max_hamming=$maxHamming chunks=$chunks would orphan every " +
          "stored chunk — drop the zone and re-index to change geometry")
    }
    // Same-geometry re-create of an existing zone is a NO-OP, not a
    // rewrite: overwriting meta (delete-then-write) opens a crash
    // window in which a populated zone holds rows-without-meta — the
    // exact state the corrupt-zone guard above then refuses as
    // unrecoverable. Write meta only when it is absent (or when an
    // EMPTY zone legitimately changes geometry).
    if (hasMeta && meta(spark, zoneDir) == ((bits, maxHamming, chunks))) return
    import spark.implicits._
    Seq((bits, maxHamming, chunks)).toDF("bits", "max_hamming", "chunks")
      .write.mode(SaveMode.Overwrite).parquet(s"$zoneDir/meta")
  }

  /** Zone meta — a driver-side 1-row read (the watermark altitude),
    * served from the fingerprint-guarded cache
    * ([[graft.core.MetaReads]] — geometry is fixed at creation).
    */
  def meta(spark: SparkSession, zoneDir: String): (Int, Int, Int) = {
    val r = graft.core.MetaReads.row(spark, s"$zoneDir/meta")
    (r.getAs[Int]("bits"), r.getAs[Int]("max_hamming"), r.getAs[Int]("chunks"))
  }

  /** One frame's chunk rows under a fixed geometry: (doc_id, c, v, sig)
    * — a narrow codegen'd projection ([[Dedup.hammingPairs]]'s chunk
    * derivation, unsigned shifts so a negative full-width hash cannot
    * smear its sign bit). `sigs` must expose `doc_id` and `sig`.
    */
  private def chunkRows(sigs: DataFrame, bits: Int, chunks: Int): DataFrame = {
    val bitsPer = bits / chunks
    val mask = if (bitsPer == 64) -1L else (1L << bitsPer) - 1
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("c"),
        expr(s"shiftrightunsigned(sig, ${c * bitsPer}) & $mask").as("v"))
    }
    sigs.select(col("doc_id"), col("sig"), explode(array(chunkCols: _*)).as("ch"))
      .select(col("doc_id"), col("ch.c").as("c"), col("ch.v").as("v"), col("sig"))
  }

  /** Append one delta's chunk rows — the per-batch maintenance step
    * (delta-only work; the caller derives `sig` from the batch's media,
    * history is never re-decoded).
    */
  def append(sigs: DataFrame, zoneDir: String): Unit = {
    val spark = sigs.sparkSession
    val (bits, _, chunks) = meta(spark, zoneDir)
    chunkRows(sigs.select(col("doc_id"), col("sig")), bits, chunks)
      .write.mode(SaveMode.Append).parquet(s"$zoneDir/rows")
  }

  /** Create + index an existing corpus in one call (the batch-backfill
    * path). Refuses a populated zone — create is idempotent, append is
    * not (the [[SignatureZone.build]] contract).
    */
  def build(spark: SparkSession, sigs: DataFrame, zoneDir: String,
      bits: Int = 60, maxHamming: Int = 5, chunks: Int = 6): Unit = {
    require(!graft.core.Fs.exists(spark, s"$zoneDir/rows"),
      s"HammingZone $zoneDir already holds rows; build() would re-append " +
        "the entire corpus — use append for deltas, or drop the zone first")
    create(spark, zoneDir, bits, maxHamming, chunks)
    append(sigs, zoneDir)
  }

  /** Record document deletions: tombstone rows, honored by
    * [[incrementalPairs]] and folded for good by [[optimize]].
    * Append-only, replay-stable. `ids` must expose `doc_id`.
    */
  def delete(ids: DataFrame, zoneDir: String): Unit =
    ids.select(col("doc_id")).write
      .mode(SaveMode.Append).parquet(s"$zoneDir/tombstones")

  private def liveRows(spark: SparkSession, zoneDir: String,
      rows: DataFrame): DataFrame =
    if (!graft.core.Fs.hasParquetFiles(spark, s"$zoneDir/tombstones")) rows
    else rows.join(
      spark.read.parquet(s"$zoneDir/tombstones")
        .select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** OPTIMIZE: fold replayed duplicate chunk rows (DISTINCT) and
    * pending tombstones (snapshot-scoped clear — a tombstone appended
    * during compaction survives to the next pass), rewritten
    * chunk-value-clustered via [[ShardedWriter.compactParquet]]'s
    * crash-safe rename publish. Result-invisible: the read side
    * DISTINCTs and anti-joins already. Returns (filesBefore,
    * filesAfter).
    */
  def optimize(spark: SparkSession, zoneDir: String,
      targetRowsPerFile: Long = 4 << 20): (Int, Int) = {
    if (!graft.core.Fs.exists(spark, s"$zoneDir/rows")) return (0, 0)
    val snap = graft.core.Fs.listFilePaths(spark, s"$zoneDir/tombstones")
    val res = ShardedWriter.compactParquet(spark, s"$zoneDir/rows", col("v"),
      targetRowsPerFile,
      transform = r => liveRows(spark, zoneDir, r).distinct())
    graft.core.Fs.deleteFilesThenDirIfEmpty(spark, s"$zoneDir/tombstones", snap)
    res
  }

  /** Verified near-dup pairs of a DELTA against the stored zone AND
    * within itself — [[Dedup.hammingPairs]]'s incremental posture:
    *
    *   1. delta chunk rows under the zone's geometry (delta-only,
    *      narrow);
    *   2. candidates = (stored chunks ⋈ delta chunks on (c, v)) ∪
    *      (delta self-join), oriented (least, greatest), DISTINCT-ed —
    *      replayed rows and a zone already holding the delta are both
    *      absorbed (the [[SignatureZone.incrementalPairs]] structural-
    *      idempotency argument);
    *   3. exact Hamming verification from STORED signatures — history
    *      media is never re-decoded; candidate docs' sigs arrive via
    *      semi-join (candidate-sized, never history-sized).
    *
    * Recall is pigeonhole-EXACT for pairs within max_hamming (the
    * geometry guarantees a shared chunk), so the result equals the
    * all-pairs filter — what the d26 oracle replays. An empty zone
    * degrades to delta-internal pairs. `delta` must expose `doc_id`
    * and `sig`. Output: (doc_a, doc_b, hamming), hamming ≤ the zone's
    * max_hamming, at least one delta member per pair.
    *
    * `maxZoneDocId`: the admission layer's SELF-EXCLUSION threshold
    * (the [[SignatureZone.incrementalPairs]] contract verbatim) —
    * stored rows at or above it are ignored, so a checkpoint-replayed
    * batch whose own chunk rows already landed decides as if they had
    * not. A pushed-down scalar filter on the zone scan; a no-op on
    * zones covering strictly smaller ids.
    */
  def incrementalPairs(delta: DataFrame, zoneDir: String,
      maxZoneDocId: Option[Long] = None): DataFrame = {
    val spark = delta.sparkSession
    val (bits, maxH, chunks) = meta(spark, zoneDir)
    // delta chunks feed the zone probe AND both internal self-join
    // sides; tracked persist so the chunk projection runs once
    val dc = graft.core.Caches.persistTracked(
      chunkRows(delta.select(col("doc_id"), col("sig")), bits, chunks))
    val internal = dc.as("a")
      .hint("shuffle_hash")
      .join(dc.as("b"), col("a.c") === col("b.c") &&
        col("a.v") === col("b.v") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val zoneLive =
      if (graft.core.Fs.exists(spark, s"$zoneDir/rows"))
        Some(maxZoneDocId.fold(
          liveRows(spark, zoneDir, spark.read.parquet(s"$zoneDir/rows")))(m =>
          liveRows(spark, zoneDir, spark.read.parquet(s"$zoneDir/rows"))
            .filter(col("doc_id") < m)))
      else None
    val cand = graft.core.Caches.persistTracked(
      zoneLive.fold(internal) { zc =>
        // both sides scale with data: shuffled hash, the DELTA side
        // builds (per-batch-sized hash map, never a history-sized one)
        val cross = zc.as("z")
          .join(dc.as("d").hint("shuffle_hash"),
            col("z.c") === col("d.c") && col("z.v") === col("d.v") &&
            col("z.doc_id") =!= col("d.doc_id"))
          .select(least(col("z.doc_id"), col("d.doc_id")).as("doc_a"),
            greatest(col("z.doc_id"), col("d.doc_id")).as("doc_b"))
        cross.union(internal)
      }.distinct())
    val candIds = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    // verification signatures: the delta's own plus the ZONE's stored
    // ones for candidate docs only — DISTINCT absorbs both the 1-row-
    // per-chunk duplication and replayed appends
    val sigs = graft.core.Caches.persistTracked(
      zoneLive.fold(delta.select(col("doc_id"), col("sig")))(zc =>
          delta.select(col("doc_id"), col("sig"))
            .union(zc.select(col("doc_id"), col("sig"))))
        .join(candIds, Seq("doc_id"), "left_semi")
        .distinct())
    cand
      .hint("shuffle_hash")
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .hint("shuffle_hash")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sig_a ^ sig_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxH)
  }
}
