package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band-signature zone — the STORAGE side of the
  * near-dup dedup family, completing the zone ladder (sketch / stats /
  * bloom / ANN index) for text dedup. [[Dedup.lshVerifiedPairs]] derives
  * signatures per session, which at 100 TB means re-shingling the ENTIRE
  * corpus every time a new crawl slice arrives; a deployment instead
  * keeps the band rows on disk and dedups each DELTA against all of
  * history by probing the stored bands (Broder's MinHash and the
  * banding construction are published algorithms — Broder 1997;
  * Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3).
  *
  * Zone layout:
  *
  *   - `zoneDir/meta`: one row `(shingle_n, k, bands)` — the signature
  *     geometry is a PROPERTY of the zone, fixed at creation (delta
  *     probes and stored bands must hash identically forever; the
  *     [[AnnIndexZone]] plane-count reasoning verbatim). The hash family
  *     itself is constant ([[Dedup.minhash]]'s universal family over
  *     md5), so the three integers alone reconstruct it on any engine.
  *   - `zoneDir/bands`: `(doc_id, band, bh)` rows, append-only — k/bands
  *     rows per document (brief strings), metadata-sized next to text.
  *
  * Maintenance is DELTA-ONLY: each ingest batch appends its own band
  * rows (shingle → minhash → band over the batch — nothing rescans;
  * `EventStream.streamSignatureZone` maintains the zone from a
  * checkpointed stream). Replay idempotency is STRUCTURAL: the read
  * side ([[incrementalPairs]]) generates candidates through a
  * DISTINCT-ed pair join, so duplicate band rows from a replayed batch
  * cannot change any result.
  *
  * Scale shape of [[incrementalPairs]]: band derivation touches only
  * the delta; the zone probe is one band-keyed shuffled hash join
  * (delta bands vs stored bands — the small side is the delta, but both
  * scale with data, so `shuffle_hash`, never a corpus broadcast);
  * verification re-reads text for CANDIDATE documents only (a doc_id
  * semi-join against the corpus — point lookups once the documents
  * table carries zone-map stats), so the history cost is proportional
  * to band-bucket collisions, never to history size. At deployment
  * scale the zone is additionally OPTIMIZEd ([[optimize]] — replay
  * duplicates folded, the per-batch file storm compacted, crash-safe)
  * and its bands staged DISK-BUCKETED on (band, bh)
  * ([[bucketedBandsTable]], the q64/d20 layout move), so the probe
  * join consumes the bucketed scan with zero zone-side Exchange — the
  * d25 posture, staleness-guarded against post-staging appends.
  */
object SignatureZone {

  /** Create an empty zone with fixed signature geometry. Idempotent
    * overwrite for an EMPTY or same-geometry zone; refuses to change
    * the geometry of a zone that already holds band rows — re-stamping
    * `(shingle_n, k, bands)` under stored rows would make every future
    * probe hash differently from the stored bands and silently miss
    * near-dups. A geometry change on a populated zone is a rebuild:
    * drop the zone and re-index.
    */
  def create(spark: SparkSession, zoneDir: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      capDf: Option[(Long, String)] = None): Unit = {
    require(k % bands == 0, "k must divide into equal bands")
    val hasMeta = graft.core.Fs.exists(spark, s"$zoneDir/meta")
    if (graft.core.Fs.exists(spark, s"$zoneDir/bands")) {
      // band rows with NO meta is a corrupt zone (a crash inside meta's
      // delete-then-write overwrite): stamping fresh geometry onto rows
      // hashed with an unknown one is the silent-miss path this guard
      // closes — fail as loudly as a geometry change
      require(graft.core.Fs.exists(spark, s"$zoneDir/meta"),
        s"SignatureZone $zoneDir holds band rows but no meta (corrupt " +
          "zone — likely an interrupted meta write); drop the zone and " +
          "re-index rather than re-creating over rows of unknown geometry")
      val (on, ok, ob) = meta(spark, zoneDir)
      require(on == shingleN && ok == k && ob == bands,
        s"SignatureZone $zoneDir already holds band rows under " +
          s"shingle_n=$on k=$ok bands=$ob; re-creating with " +
          s"shingle_n=$shingleN k=$k bands=$bands would orphan every " +
          "stored band — drop the zone and re-index to change its geometry")
      // the cap is geometry too: bands of capped and uncapped shingle
      // sets hash differently, so flipping cappedness, the cap value,
      // OR the bound df zone under stored rows is the same silent-miss
      // path — a different ShingleDfZone with the same cap drops a
      // DIFFERENT hot-shingle set than the stored bands were hashed
      // with, so the guard compares the full (cap, df_dir) binding
      require(capInfo(spark, zoneDir) == capDf,
        s"SignatureZone $zoneDir already holds band rows under df-cap " +
          s"binding ${capInfo(spark, zoneDir)}; re-creating with binding " +
          s"$capDf would orphan every stored band — drop the zone and " +
          "re-index to change its cap or its df zone")
    }
    // Same-geometry re-create is a NO-OP: overwriting meta
    // (delete-then-write) opens a crash window leaving a populated
    // zone rows-without-meta — the state the corrupt-zone guard above
    // refuses as unrecoverable. Write only when meta is absent (or an
    // EMPTY zone changes geometry).
    if (hasMeta && meta(spark, zoneDir) == ((shingleN, k, bands))
        && capInfo(spark, zoneDir) == capDf) return
    import spark.implicits._
    Seq((shingleN, k, bands,
        capDf.map(_._1), capDf.map(_._2)))
      .toDF("shingle_n", "k", "bands", "cap", "df_dir")
      .write.mode(SaveMode.Overwrite).parquet(s"$zoneDir/meta")
  }

  /** Zone meta — a driver-side 1-row read (the watermark altitude),
    * served from the fingerprint-guarded cache (geometry is fixed at
    * creation, so per-batch re-reads in the loops are pure overhead —
    * [[graft.core.MetaReads]]).
    */
  def meta(spark: SparkSession, zoneDir: String): (Int, Int, Int) = {
    val r = graft.core.MetaReads.row(spark, s"$zoneDir/meta")
    (r.getAs[Int]("shingle_n"), r.getAs[Int]("k"), r.getAs[Int]("bands"))
  }

  /** The zone's df-cap binding, if it is a CAPPED zone: (cap, df zone
    * dir). Tolerates pre-cap meta files (3-column schema) — those zones
    * are uncapped by construction.
    */
  def capInfo(spark: SparkSession, zoneDir: String): Option[(Long, String)] = {
    val r = graft.core.MetaReads.row(spark, s"$zoneDir/meta")
    if (!r.schema.fieldNames.contains("cap")) None
    else if (r.isNullAt(r.fieldIndex("cap"))) None
    else Some((r.getAs[Long]("cap"), r.getAs[String]("df_dir")))
  }

  /** The hot-shingle drop frame for a capped zone (None ⇒ uncapped).
    * Read per call — the df zone is itself append-only, so the list a
    * probe sees is the df state as of the probe (c9's ordering appends
    * a delta's own df only AFTER its decisions materialize, so the cap
    * set stays the HISTORY df — the stop-list-refresh posture: a
    * shingle that only becomes hot inside one delta still probes,
    * bounded by that delta's own band buckets, and the next rebuild or
    * compaction refreshes the snapshot).
    */
  private def dropList(spark: SparkSession, zoneDir: String): Option[DataFrame] =
    capInfo(spark, zoneDir).map { case (cap, dfDir) =>
      ShingleDfZone.hot(spark, dfDir, cap)
    }

  /** Apply a drop list to a shingle frame. The hot list is the SMALL
    * residue (df > cap), but it still scales with the corpus — a
    * shuffled hash anti-join, never an assumed broadcast (AQE upgrades
    * it when a run's list happens to be tiny).
    */
  private def dropHot(sh: DataFrame, drop: Option[DataFrame]): DataFrame =
    // hint the RIGHT side: a left-anti join builds on the right, and
    // the hot list is the side that should build (small residue)
    drop.fold(sh)(d =>
      sh.join(d.hint("shuffle_hash"), Seq("shingle"), "left_anti"))

  /** One delta's band rows under the zone's fixed geometry: shingle →
    * (optional hot-shingle drop) → minhash → band, touching only the
    * delta. `delta` must expose `doc_id` and `text`.
    */
  private def deltaBandRows(delta: DataFrame, shingleN: Int, k: Int,
      bands: Int, drop: Option[DataFrame]): DataFrame =
    Dedup.bandRows(
      Dedup.minhash(
        dropHot(
          Dedup.shingles(delta, col("doc_id"), col("text"), shingleN),
          drop), k),
      k, bands)

  /** Append one delta's band rows — the per-batch maintenance step.
    * A capped zone caps the batch's shingles against its df zone first
    * (signatures must hash over the same universe as every stored
    * band).
    */
  def append(delta: DataFrame, zoneDir: String): Unit = {
    val spark = delta.sparkSession
    val (n, k, b) = meta(spark, zoneDir)
    deltaBandRows(delta, n, k, b, dropList(spark, zoneDir))
      .write.mode(SaveMode.Append).parquet(s"$zoneDir/bands")
  }

  /** Create + index an existing corpus in one call (the batch-backfill
    * path). Refuses a zone that already holds band rows — create is
    * idempotent but append is not, so a repeated build would double the
    * band table (the [[AnnIndexZone.build]] contract).
    */
  def build(spark: SparkSession, docs: DataFrame, zoneDir: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4): Unit = {
    require(!graft.core.Fs.exists(spark, s"$zoneDir/bands"),
      s"SignatureZone $zoneDir already holds band rows; build() would " +
        "re-append the entire corpus on top of them — use append for " +
        "deltas, or drop the zone first for a full rebuild")
    create(spark, zoneDir, shingleN, k, bands)
    append(docs, zoneDir)
  }

  /** [[build]] with a df-cap binding: the zone is CREATED bound to a
    * [[ShingleDfZone]] and a cap, and every band row — this backfill's
    * and every later [[append]]'s — is derived from shingles with the
    * hot list (df > cap) dropped, restoring [[Dedup.capShingles]]'s
    * stop-shingle discipline in the incremental posture. The df zone
    * must already cover the same corpus `docs` covers (the calibration
    * pass runs before indexing); the binding is part of the zone's
    * geometry — see [[create]]'s guard.
    */
  def buildCapped(spark: SparkSession, docs: DataFrame, zoneDir: String,
      dfZoneDir: String, cap: Long,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4): Unit = {
    require(!graft.core.Fs.exists(spark, s"$zoneDir/bands"),
      s"SignatureZone $zoneDir already holds band rows; buildCapped() " +
        "would re-append the entire corpus on top of them — use append " +
        "for deltas, or drop the zone first for a full rebuild")
    create(spark, zoneDir, shingleN, k, bands, Some((cap, dfZoneDir)))
    append(docs, zoneDir)
  }

  /** Record document deletions against the zone: tombstone rows under
    * `zoneDir/tombstones`, honored by [[incrementalPairs]] (a deleted
    * doc's stored bands can no longer produce candidates — so
    * re-ingesting its content is admitted instead of blocked on a dead
    * keeper) and folded in for good by [[optimize]]. A delete is
    * itself just an ingest event: append-only, replay-stable
    * (duplicate tombstone rows change nothing — the reader anti-joins).
    * `ids` must expose `doc_id`.
    */
  def delete(ids: DataFrame, zoneDir: String): Unit =
    ids.select(col("doc_id")).write
      .mode(SaveMode.Append).parquet(s"$zoneDir/tombstones")

  /** Drop tombstoned docs' rows from a bands frame. The tombstone list
    * is deletes-sized (small next to the zone; Catalyst broadcasts it
    * when stats allow) and compaction folds it to zero.
    */
  private def liveBands(spark: SparkSession, zoneDir: String,
      bands: DataFrame): DataFrame =
    if (!graft.core.Fs.hasParquetFiles(spark, s"$zoneDir/tombstones")) bands
    else bands.join(
      spark.read.parquet(s"$zoneDir/tombstones")
        .select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** OPTIMIZE the band zone: rewrite the append-only bands table with
    * replay duplicates DISTINCTed away, pending TOMBSTONES folded in
    * for good (keyed deletes at compaction — the tombstone list is
    * then cleared; a crash between publish and clear re-applies the
    * same tombstones, idempotent), and the per-batch file storm folded
    * into balanced bh-clustered shards
    * ([[ShardedWriter.compactParquet]]'s crash-safe rename publish) —
    * the maintenance pass a deployment schedules exactly like c3's
    * lake OPTIMIZE and d21's index OPTIMIZE. Result-invisible by
    * construction: the read side DISTINCTs candidates and already
    * subtracts tombstones (SignatureZoneSpec pins the hash).
    * Returns (filesBefore, filesAfter).
    */
  def optimize(spark: SparkSession, zoneDir: String,
      targetRowsPerFile: Long = 4 << 20): (Int, Int) = {
    if (!graft.core.Fs.exists(spark, s"$zoneDir/bands")) return (0, 0)
    // snapshot the tombstone LISTING before the compaction reads it:
    // the fold consumes whatever is live at read time, but the clear
    // afterwards removes ONLY the snapshotted files — a tombstone
    // appended concurrently by the ingest path (st23's stream) lands in
    // files outside the snapshot and survives to the next OPTIMIZE,
    // instead of being silently discarded (which would resurrect the
    // deleted doc in every later probe)
    val snap = graft.core.Fs.listFilePaths(spark, s"$zoneDir/tombstones")
    val res = ShardedWriter.compactParquet(spark, s"$zoneDir/bands", col("bh"),
      targetRowsPerFile,
      transform = b => liveBands(spark, zoneDir, b).distinct())
    graft.core.Fs.deleteFilesThenDirIfEmpty(spark, s"$zoneDir/tombstones", snap)
    res
  }

  // session-scoped staleness ledger for bucketed band tables: table
  // name -> the bands dir's listing fingerprint at staging time. Lives
  // exactly as long as the tables themselves (scratch warehouse), so a
  // fresh session can never see a stale entry.
  private val stagedTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Stage the zone's DISTINCT band rows as a DISK-BUCKETED table on
    * (band, bh) — the q64/d20 layout move applied to the probe join:
    * the bucketed scan IS the hash partitioning the join requires, so
    * the zone side joins with ZERO Exchange and only the delta's bands
    * move ([[incrementalPairs]]'s `bandsTable` option consumes it;
    * PlanShapeSpec pins the plan property). The table records the
    * bands dir's listing fingerprint; a probe against a table staged
    * before later appends fails LOUDLY (the d21 staleness discipline —
    * never a silent partial read). Returns the table name.
    */
  def bucketedBandsTable(spark: SparkSession, zoneDir: String,
      buckets: Int = 8): String = {
    val t = "sigzone_bands_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    // fingerprint BEFORE reading the dir for staging: an append landing
    // DURING the staging read may or may not make it into the table, so
    // recording the post-read fingerprint would bless a genuinely stale
    // table (TOCTOU); with the pre-read fingerprint such an append makes
    // the staleness guard fail loudly instead — the safe direction
    val fp = graft.core.Fs.fingerprint(spark, s"$zoneDir/bands")
    spark.read.parquet(s"$zoneDir/bands").distinct()
      .write.format("parquet").bucketBy(buckets, "band", "bh").saveAsTable(t)
    stagedTables.put(t, (zoneDir, fp)): Unit
    t
  }

  private def freshBandsTable(spark: SparkSession, zoneDir: String,
      table: String): DataFrame = {
    val staged = stagedTables.get(table)
    require(staged != null,
      s"bands table $table was not staged by bucketedBandsTable in this " +
        "session — a table of unknown provenance cannot be trusted to " +
        "mirror the zone")
    val (dir, fp) = staged
    require(dir == zoneDir,
      s"bands table $table was staged from zone $dir, not $zoneDir")
    val now = graft.core.Fs.fingerprint(spark, s"$zoneDir/bands")
    require(now == fp,
      s"bands table $table is STALE: the zone's bands dir changed since " +
        "staging (appends or an optimize ran) — re-stage with " +
        "bucketedBandsTable before probing, or probe the dir directly")
    spark.table(table)
  }

  /** Verified near-dup pairs of a DELTA against the stored zone AND
    * within itself — the incremental posture of
    * [[Dedup.lshVerifiedPairs]]: history is never re-shingled; its band
    * rows come from the zone, and its text is touched only for
    * candidate documents.
    *
    *   1. delta band rows (delta-only work, the zone's geometry);
    *   2. candidates = (stored bands ⋈ delta bands on (band, bh)) ∪
    *      (delta self-join), pairs oriented (least, greatest) and
    *      DISTINCT-ed — which also absorbs replayed duplicate band rows
    *      (structural idempotency) and makes the result identical
    *      whether the zone holds history only or already includes the
    *      delta (both cross-leg shapes produce the same pair set, so a
    *      maintainer that appended the delta before querying gets the
    *      same answer);
    *   3. exact-Jaccard verification over the candidate documents'
    *      shingles only (`corpus` supplies text by doc_id semi-join —
    *      candidate-sized, not history-sized).
    *
    * Signatures follow the ZONE's cap posture: an uncapped zone runs
    * the d3 discipline (band-bucket sizes bound the candidate join); a
    * CAPPED zone (built via [[buildCapped]] against a
    * [[ShingleDfZone]]) drops hot shingles (df > cap) from the delta's
    * band derivation AND from the verification shingle sets — the
    * stop-shingle df cap without recomputing corpus-wide frequencies
    * (the df zone is maintained incrementally; the drop list is one
    * zone read). Verification and banding share ONE cap set, so the
    * result equals the capped BATCH pipeline (d8's discipline) run
    * over the same pre-capped universe — the equivalence
    * SignatureZoneSpec pins. An empty zone (created, never appended)
    * degrades to delta-internal pairs only — the read side tolerates
    * the missing bands dir.
    *
    * Output: (doc_a, doc_b, n_common, jaccard) for verified pairs with
    * at least one delta member, `jaccard >= minJaccard`.
    */
  def incrementalPairs(corpus: DataFrame, delta: DataFrame, zoneDir: String,
      minJaccard: Double, bandsTable: Option[String] = None,
      maxZoneDocId: Option[Long] = None): DataFrame = {
    // maxZoneDocId: the admission layer's SELF-EXCLUSION threshold —
    // under the admission-timeline contract the zone covers strictly
    // smaller ids than the delta, so any stored band row at or above
    // the delta's minimum id is a replayed copy of the CURRENT batch
    // (foreachBatch is at-least-once: a crash after the feedback
    // appends replays the decide) and must not generate candidates
    // against it. A pushed-down scalar filter on the zone scan — zero
    // new exchanges, and a no-op on a clean (history-only) zone.
    // Direct probes (d22/st20's full-corpus postures) pass None and
    // keep their zone-may-hold-the-delta invariance semantics.
    val spark = corpus.sparkSession
    val (n, k, b) = meta(spark, zoneDir)
    val drop = dropList(spark, zoneDir)
    // the delta bands feed the zone probe AND the internal self-join's
    // two sides; tracked persist so shingle+minhash derivation runs once
    val db = graft.core.Caches.persistTracked(deltaBandRows(delta, n, k, b, drop))
    val internal = db.as("a")
      .hint("shuffle_hash")
      .join(db.as("b"), col("a.band") === col("b.band") &&
        col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    // two consumers (the candidate-id semi-join and the verify join)
    // would each re-run the zone probe — persist the DISTINCT-ed pair
    // set once (candidate-pair-sized, bounded by band collisions)
    val cand = graft.core.Caches.persistTracked(
      (if (bandsTable.isDefined ||
          graft.core.Fs.exists(spark, s"$zoneDir/bands")) {
        // a staged bucketed table serves the probe with zero zone-side
        // Exchange (freshness-guarded); otherwise the parquet dir.
        // Tombstones are subtracted LIVE on either path (the tombstone
        // dir is outside the bands fingerprint, so deletes never
        // invalidate a staged table — they are honored on read)
        val zb0 = liveBands(spark, zoneDir,
          bandsTable.fold(spark.read.parquet(s"$zoneDir/bands"))(
            freshBandsTable(spark, zoneDir, _)))
        val zb = maxZoneDocId.fold(zb0)(m => zb0.filter(col("doc_id") < m))
        // both sides scale with data (the zone with history, the delta
        // with the batch): shuffled hash join, never a broadcast. The
        // hint sits on the DELTA side so IT builds (per-batch-sized
        // hash map, never a history-sized one) and the zone side
        // streams — on a bucketed bands table the zone scan then joins
        // with zero Exchange (its bucketing IS the required hash
        // partitioning)
        val cross = zb.as("z")
          .join(db.as("d").hint("shuffle_hash"),
            col("z.band") === col("d.band") &&
            col("z.bh") === col("d.bh") && col("z.doc_id") =!= col("d.doc_id"))
          .select(least(col("z.doc_id"), col("d.doc_id")).as("doc_a"),
            greatest(col("z.doc_id"), col("d.doc_id")).as("doc_b"))
        cross.union(internal)
      } else internal).distinct())
    // verification reads text for candidate documents ONLY — the pair
    // ids are the access pattern, never the history table
    val candIds = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    // a capped zone verifies over the SAME capped universe it banded —
    // jaccard over mixed universes would not match any batch twin
    val sh = graft.core.Caches.persistTracked(dropHot(
      Dedup.shingles(
        corpus.join(candIds, Seq("doc_id"), "left_semi"),
        col("doc_id"), col("text"), n), drop))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = cand
      .hint("shuffle_hash")
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .hint("shuffle_hash")
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
  }
}
