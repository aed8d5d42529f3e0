package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Multimodal, Similarity, TextOps}

/** Training-data pipeline operators (dedup / similarity / text analysis)
  * as driver-verifiable queries over the `documents` and `embeddings`
  * tables. Library logic lives in [[graft.operators]]; this file wires it
  * to the star schema and carries the DuckDB oracle twins.
  *
  * Oracle-parity notes: hashes are md5-derived ([[TextOps.h60]]) so
  * DuckDB can re-derive them; float math is restricted to IEEE-exact ops
  * (sequential-fold dot products, division, sqrt — never exp/log whose
  * libm rounding differs across engines); integer math is exact.
  */
object TrainingData {

  // private[graft] (not private): the streamed zone maintainers in
  // graft.streaming.EventStream (st20/st21) must share the EXACT same
  // threshold and signature geometry as the batch twins and the zone
  // builders — a hardcoded copy there would silently desync the streamed
  // path from the oracle the moment a constant here changed.
  private[graft] val jaccardThreshold = 0.8
  private[graft] val shingleN = 3
  private[graft] val minhashK = 16
  private[graft] val minhashBands = 4
  private val ivfCells = 8
  /** d28/d29's fitted-quantizer size (and st27's): k cells from d18's
    * integer Lloyd — shared with the oracle's kmeansCtes k so the two
    * engines fit the same quantizer.
    */
  private[graft] val ivfKmeansK = 8
  /** d30/d31's PQ geometry: 8 subspaces × 8 codes over the 64-dim
    * embeddings (8 dims per codebook, 24-bit codes) — shared with the
    * oracle's per-subspace kmeansCtes chains. Chosen by measurement:
    * on the unit-norm test embeddings m=8 recovers the planted
    * near-dup structure (12/50 exact hits vs 9/50 at m=4); larger k
    * buys nothing (the remaining exact neighbors are noise-level).
    */
  private[graft] val pqSubspaces = 8
  private[graft] val pqCodes = 8
  /** d32's refine width: exact cosine re-ranks only the top-R ADC
    * shortlist per query — the knob that bounds how many raw vectors
    * the refine stage ever touches.
    */
  private[graft] val pqRefineR = 50
  /** d33's exact-substring window: a span counts as duplicated when a
    * run of this many consecutive tokens occurs verbatim elsewhere in
    * the corpus (Lee et al.'s exact-substring rule; 20 tokens ≈ the
    * 50-character scale their 50-token BPE threshold targets on these
    * short synthetic docs).
    */
  private[graft] val ssdedupW = 20
  /** Exact-cosine verification threshold for the embedding-side dedup
    * family (d7/d15/d23/c12) — shared with the oracle builders so the
    * Spark paths and the SQL replay cannot desync.
    */
  private[graft] val semanticCosThreshold = 0.4
  // d26/st26's pigeonhole geometry over m6's 60-bit audio fingerprint:
  // 6 chunks of 10 bits (1024 buckets per chunk — selective blocking)
  // with exact recall for hamming <= 5 (chunks > maxHamming)
  private[graft] val audioHammingBits = 60
  private[graft] val audioHammingMax = 5
  private[graft] val audioHammingChunks = 6

  /** Stop-shingle cap derived from the corpus size (max(50, ceil(√n)) —
    * rationale at [[Dedup.deriveDocFreqCap]]): 50 at sf0.01 (n=500), 71
    * at sf0.1 (n=5000); the oracles re-derive the identical value in
    * SQL. One count per query — a caller that already knows n uses
    * [[Dedup.deriveDocFreqCap]] directly (the knownCount seam, same
    * rule as [[embeddingNeardupPairs]]).
    */
  private def stopShingleDf(docs: DataFrame): Long =
    Dedup.deriveDocFreqCap(docs.count())

  /** Exact content dedup (hash-groupBy; reference Q5 conflict-skip
    * applied to content, SURVEY §2.2 K3).
    */
  def d1DedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactByContent(Tables(spark, dir, "documents"), col("text"), col("doc_id"))
      .orderBy(col("text_md5"))

  /** Trigram-shingle Jaccard near-dup pairs: ALL co-occurring pairs over
    * the stop-shingle-capped universe, exact Jaccard verification — the
    * complete-recall complement of d8 (which restricts verification to
    * LSH candidates) over the SAME capped shingle table, so the two
    * queries' jaccard values agree pair-for-pair. The cap is what makes
    * complete co-occurrence runnable at corpus scale (a df-f shingle
    * contributes f² join rows — see [[Dedup.capShingles]]); the fully
    * uncapped exact mode remains an explicit `maxDocFreq = None` opt-in,
    * pinned at toy scale by DedupClusterSpec.
    */
  def d2NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"), 3)
    Dedup.jaccardPairs(sh, jaccardThreshold, maxDocFreq = Some(stopShingleDf(docs)))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash(16) + LSH(4 bands of 4) candidate pairs. */
  def d3MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(Tables(spark, dir, "documents"), col("doc_id"), col("text"), 3)
    Dedup.lshCandidatePairs(Dedup.minhash(sh, minhashK), minhashK, minhashBands)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 60-bit SimHash per document. */
  def d4Simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(Tables(spark, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))

  /** SimHash near-dup pairs: pigeonhole-chunk candidates + exact Hamming
    * verify (4 chunks, ≤ 3 bits) — see [[Dedup.simhashPairs]].
    */
  def d11SimhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(
        Dedup.simhash(Tables(spark, dir, "documents"), col("doc_id"), col("text")),
        maxHamming = 3, chunks = 4)
      .orderBy(col("doc_a"), col("doc_b"))

  private def queryVec(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))

  /** Brute-force cosine top-10 against the vec_id=0 query vector. */
  def d5CosineTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(Tables(spark, dir, "embeddings"), queryVec(spark, dir), 10)

  /** SRP-LSH-bucketed ANN top-10 (scale path: scan the query's bucket
    * plus its Hamming-1 probes; plane count derived from corpus size —
    * the oracle re-derives both).
    */
  def d6AnnLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(Tables(spark, dir, "embeddings"), queryVec(spark, dir), 10)

  /** Corpus-wide batch ANN: every embedding's 3 nearest neighbors within
    * its SRP bucket or any Hamming-1 neighbor bucket (multi-probe). The
    * plane count is DERIVED from the corpus size (ceil(log2(N/32)),
    * min 4): 4 planes / 16 buckets at sf0.01, 8 planes / 256 buckets at
    * sf0.1 — the oracle re-derives the identical count in SQL. See
    * [[Similarity.batchTopK]] for the scale design — one bucket-keyed
    * join, probe-side log-amplification, two-level top-k riding the
    * join partitioning.
    */
  def d13BatchAnn(spark: SparkSession, dir: String): DataFrame =
    Similarity.batchTopK(Tables(spark, dir, "embeddings"), k = 3)
      .orderBy(col("vec_id"), col("nn_rank"))

  /** The PERSISTED ANN index for this corpus — built once per (session,
    * dir) via [[graft.core.StagedLayouts]] (index construction is
    * setup: a production retrieval deployment backfills its index ahead
    * of queries; `EventStream.streamAnnIndex` is the streamed
    * maintainer of the same zone). Spec seam for SimilaritySpec.
    */
  private[graft] def annIndexZone(spark: SparkSession, dir: String): String =
    graft.core.StagedLayouts.once(spark, s"d19zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d19zone")
      graft.operators.AnnIndexZone.build(
        spark, Tables(spark, dir, "embeddings"), z): Unit
      z
    }

  /** ANN served FROM THE STORED INDEX ZONE (d19): d6's multi-probe
    * top-10 with candidate generation answered by the persisted
    * `(vec_id, bucket)` table instead of an in-session bucket
    * derivation — hash-identical by construction (the zone's plane
    * count derives from the same corpus count), so d19 shares d6's
    * oracle. What the bench then measures is the QUERY cost a
    * deployment pays: index-scan probe + candidate re-rank, with no
    * per-session corpus count() or full-corpus bucket assignment.
    */
  def d19AnnIndexZone(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AnnIndexZone.topK(
      Tables(spark, dir, "embeddings"), queryVec(spark, dir),
      annIndexZone(spark, dir), 10)

  /** A separately staged OPTIMIZEd index zone for d21 (its own copy so
    * d19 keeps measuring the un-optimized scan path): bucket-clustered
    * rewrite + per-file bucket stats, sized to ~8 files so skipping is
    * real at test scale.
    */
  private[graft] def annIndexZoneOptimized(spark: SparkSession, dir: String): String =
    graft.core.StagedLayouts.once(spark, s"d21zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d21zone")
      val emb = Tables(spark, dir, "embeddings")
      val n = emb.count()
      graft.operators.AnnIndexZone.build(spark, emb, z, knownCount = Some(n)): Unit
      graft.operators.AnnIndexZone.optimize(spark, z, math.max(1L, n / 8)): Unit
      z
    }

  /** ANN from the OPTIMIZEd index zone (d21): d19's query after the
    * index maintenance pass — the probe's file subset is planned from
    * the #files-row bucket stats, so the index read opens ~the files
    * whose bucket range can hold a probe instead of the table
    * (SimilaritySpec asserts the skipping and path-equality; same d6
    * oracle — three storage postures, one result).
    */
  def d21AnnIndexOptimized(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AnnIndexZone.topK(
      Tables(spark, dir, "embeddings"), queryVec(spark, dir),
      annIndexZoneOptimized(spark, dir), 10)

  /** The PERSISTED IVF-flat index for this corpus — fitted-quantizer
    * ANN, the trained twin of [[annIndexZone]] (SRP hashes the space
    * blind; IVF's cells are d18's exact integer Lloyd centroids, so
    * they follow the corpus's density). Built once per (session, dir);
    * `EventStream.streamIvfIndex` is the streamed maintainer of the
    * same zone. Spec seam for IvfIndexZoneSpec.
    */
  private[graft] def ivfIndexZone(spark: SparkSession, dir: String): String =
    graft.core.StagedLayouts.once(spark, s"d28zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d28zone")
      graft.operators.IvfIndexZone.build(
        spark, Tables(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding")), z,
        k = ivfKmeansK, iters = 3): Unit
      z
    }

  /** A separately staged OPTIMIZEd IVF zone for d29 (its own copy so
    * d28 keeps measuring the un-optimized scan path — the d19/d21
    * split).
    */
  private[graft] def ivfIndexZoneOptimized(spark: SparkSession, dir: String): String =
    graft.core.StagedLayouts.once(spark, s"d29zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d29zone")
      val emb = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      graft.operators.IvfIndexZone.build(spark, emb, z,
        k = ivfKmeansK, iters = 3): Unit
      graft.operators.IvfIndexZone.optimize(
        spark, z, math.max(1L, emb.count() / 8)): Unit
      z
    }

  /** The d28/d29 query batch: the first five vectors, as a FRAME —
    * multi-query ANN rides one plan (the retrieval-service shape; d5/
    * d6/d19 are the single-query contract).
    */
  private[graft] def ivfQueries(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))

  /** IVF-flat ANN top-10 from the stored zone (d28): five queries each
    * probe their `nprobe = 2` nearest fitted cells (of `ivfKmeansK`),
    * exact cosine re-ranks the probed cells' members. The oracle
    * replays the full chain — d18's integer Lloyd (shared CTEs), the
    * (dist, cid)-tiebroken cell assignment and probe ranking, and the
    * cosine top-k — so unlike sketch-based ANN this approximate
    * structure is HASH-verifiable end-to-end: approximation lives in
    * which candidates are scored, not in any nondeterminism.
    * `nprobe = k` ≡ exact brute force is spec-pinned
    * (IvfIndexZoneSpec), making recall a knob, not a hope.
    */
  def d28IvfTopk(spark: SparkSession, dir: String): DataFrame =
    graft.operators.IvfIndexZone.topK(
        Tables(spark, dir, "embeddings"), ivfQueries(spark, dir),
        ivfIndexZone(spark, dir), k = 10, nprobe = 2)
      .orderBy(col("q_id"), col("nn_rank"))

  /** d28 from the OPTIMIZEd zone (d29): cid-clustered lists +
    * per-file cid stats, so the probe opens ~the files holding probed
    * cells (≤ k distinct cells regardless of query count) instead of
    * the table — same oracle; storage must be invisible
    * (IvfIndexZoneSpec asserts the skipping).
    */
  def d29IvfOptimized(spark: SparkSession, dir: String): DataFrame =
    graft.operators.IvfIndexZone.topK(
        Tables(spark, dir, "embeddings"), ivfQueries(spark, dir),
        ivfIndexZoneOptimized(spark, dir), k = 10, nprobe = 2)
      .orderBy(col("q_id"), col("nn_rank"))

  /** The PERSISTED PQ code zone — the memory side of billion-scale ANN
    * (8 subspaces × 8 codes, integer-Lloyd codebooks; every vector
    * stored as 8 code ids). Built once per (session, dir); spec seam
    * for PqZoneSpec.
    */
  private[graft] def pqZone(spark: SparkSession, dir: String): String =
    graft.core.StagedLayouts.once(spark, s"d30zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d30zone")
      graft.operators.PqZone.build(
        spark, Tables(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding")), z,
        m = pqSubspaces, k = pqCodes, iters = 2): Unit
      z
    }

  /** PQ asymmetric-distance top-10 (d30): each of the five queries
    * builds m·k integer LUTs (expression-only) and every corpus vector
    * is scored as m table lookups over its stored codes — raw
    * embeddings are never read after encoding. Training, encoding,
    * LUTs, and ADC sums are all exact integer arithmetic on the shared
    * quantization grid, so the ENTIRE approximate structure
    * hash-matches the SQL replay (four per-subspace Lloyd chains).
    */
  def d30PqTopk(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PqZone.adcTopK(
        ivfQueries(spark, dir), pqZone(spark, dir), k = 10)
      .orderBy(col("q_id"), col("nn_rank"))

  /** The IVF-PQ composition (d31): d28's trained router bounds the
    * scan to each query's nprobe=2 nearest cells, d30's codes score
    * the survivors by ADC — the full FAISS-style pipeline, with raw
    * embeddings touched by NEITHER stage after training. One oracle
    * replays both trained structures plus the composition.
    */
  def d31IvfPq(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PqZone.ivfAdcTopK(
        ivfQueries(spark, dir), pqZone(spark, dir),
        ivfIndexZone(spark, dir), k = 10, nprobe = 2)
      .orderBy(col("q_id"), col("nn_rank"))

  /** The refined pipeline (d32): d31's routed ADC shortlist (top-50
    * per query), exact cosine over the shortlist ONLY — at 100 TB the
    * refine stage reads nq·50 raw vectors while routing reads cell
    * metadata and scoring reads 8-byte codes. The end state of the
    * retrieval stack: approximate where it is cheap, exact where it
    * decides.
    */
  def d32IvfPqRefined(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PqZone.refinedTopK(
        Tables(spark, dir, "embeddings"), ivfQueries(spark, dir),
        pqZone(spark, dir), ivfIndexZone(spark, dir),
        k = 10, r = pqRefineR, nprobe = 2)
      .orderBy(col("q_id"), col("nn_rank"))

  /** ANN REINDEX loop (c16): the retrain-and-re-encode maintenance op
    * that closes the vector stack's refresh discipline — st30
    * refreshes DECISION state (calibration thresholds, assignment
    * centroids); this entry refreshes INDEX GEOMETRY, the FAISS
    * retrain analog. Round 1: the IVF zone and the PQ zone are built
    * over the HISTORY slice (first 3/4 by vec_id) and the arriving
    * delta appends under that now-STALE geometry (cell assignments /
    * code words against the old fit — the delta-sized move every
    * batch makes, and the recall drift this op exists to repay). The
    * five-query probe answers from the stale zone (`ivf_stale`). Then
    * the scheduled REINDEX: re-fit the coarse quantizer and all m
    * codebooks over the FULL live corpus and re-encode EVERY vector,
    * each zone landing through [[graft.operators.ZoneRebuild]]'s
    * fingerprint-guarded two-rename cutover — readers are served the
    * old geometry until the swap instant, and an append racing the
    * rebuild fails the cutover loudly instead of being dropped. Round
    * 2 probes the re-fitted zones (`ivf_reindexed`, `pq_reindexed`):
    * d28's and d30's query chains served from REBUILT zones.
    *
    * The oracle replays BOTH fits — the history-slice Lloyd chain and
    * the full-corpus one — phase-routed, so a green hash proves which
    * geometry served which round (st30's refresh-binds argument
    * applied to the index). ReindexLoopSpec pins that the phases
    * genuinely diverge on this corpus (round 2 provably probes the
    * re-fitted index) and the swap-instant no-op (a same-corpus
    * rebuild changes no answer; the rebuilt zone answers exactly like
    * d28's batch-built twin).
    *
    * Scale shape: the retrain costs the same as the original backfill
    * build (k·iters narrow corpus passes + one encode pass) but runs
    * BESIDE the serving zone at a staging path, never against it;
    * between reindexes every delta still pays only the zero-shuffle
    * literal-centroid append. At 100 TB the reindex cadence is the
    * recall-decay budget — a scheduled maintenance window, exactly
    * like the zones' OPTIMIZE siblings.
    */
  def c16ReindexLoop(spark: SparkSession, dir: String): DataFrame =
    reindexLoop(spark, dir, graft.core.Scratch.dir("c16zone"))

  /** c16's core against a caller-owned root (ReindexLoopSpec inspects
    * and re-swaps the zones; the public entry hands a session scratch
    * dir whose zones the lazily-read `pq_reindexed` leg needs alive).
    */
  private[graft] def reindexLoop(spark: SparkSession, dir: String,
      root: String): DataFrame = {
    import graft.operators.{IvfIndexZone, PqZone, ZoneRebuild}
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cut = graft.core.Tables.countOf(spark, dir, "embeddings") * 3L / 4L
    val ivfZ = s"$root/ivf"
    val pqZ = s"$root/pq"
    // the IVF and PQ zones are independent structures in disjoint dirs:
    // build+append each concurrently (§2.6) — both fits are
    // driver-sequential Lloyd chains of tiny jobs, so overlapping them
    // roughly halves the (re)train wall without touching either result
    graft.core.Par.run(
      () => {
        IvfIndexZone.build(spark, emb.filter(col("vec_id") < cut), ivfZ,
          k = ivfKmeansK, iters = 3): Unit
        IvfIndexZone.append(emb.filter(col("vec_id") >= cut), ivfZ)
      },
      () => {
        PqZone.build(spark, emb.filter(col("vec_id") < cut), pqZ,
          m = pqSubspaces, k = pqCodes, iters = 2): Unit
        PqZone.append(emb.filter(col("vec_id") >= cut), pqZ)
      })
    val q = ivfQueries(spark, dir)
    def ivfPhase(tag: String) =
      IvfIndexZone.topK(emb, q, ivfZ, k = 10, nprobe = 2)
        .select(lit(tag).as("phase"), col("q_id"), col("vec_id"),
          col("nn_rank"))
        // materialize each phase on ITS side of the swap: the cutover
        // replaces every file under the zone path, so a lazy stale
        // plan would read (or fail on) the re-fitted zone
        .localCheckpoint()
    val stale = ivfPhase("ivf_stale")
    // the scheduled REINDEX: two independent rebuilds in disjoint
    // staging dirs — concurrent (§2.6), same cutover guarantees each
    graft.core.Par.run(
      () => ZoneRebuild.rebuild(spark, ivfZ) { staging =>
        IvfIndexZone.build(spark, emb, staging, k = ivfKmeansK, iters = 3): Unit
      },
      () => ZoneRebuild.rebuild(spark, pqZ) { staging =>
        PqZone.build(spark, emb, staging, m = pqSubspaces, k = pqCodes,
          iters = 2): Unit
      })
    val reindexed = ivfPhase("ivf_reindexed")
    val pqReindexed = PqZone.adcTopK(q, pqZ, k = 10)
      .select(lit("pq_reindexed").as("phase"), col("q_id"), col("vec_id"),
        col("nn_rank"))
    stale.union(reindexed).union(pqReindexed)
      .orderBy(col("phase"), col("q_id"), col("nn_rank"))
  }

  /** The history/delta boundary every incremental query shares: the
    * first 4/5 of the corpus (by id) is HISTORY, the last 1/5 the
    * arriving DELTA — exact integer arithmetic both engines replay
    * (`count * 4 // 5`), never a float fraction whose rounding could
    * drift.
    */
  private def incrementalCut(spark: SparkSession, dir: String): Long =
    graft.core.Tables.countOf(spark, dir, "documents") * 4L / 5L

  /** The persisted MinHash band-signature zone over the HISTORY slice —
    * built once per (session, dir) via [[graft.core.StagedLayouts]]
    * (index construction is setup: a deployment backfills its signature
    * zone ahead of the incremental loop; `EventStream
    * .streamSignatureZone` is the streamed maintainer of the same
    * zone). Spec seam for SignatureZoneSpec.
    */
  private[graft] def signatureZone(spark: SparkSession, dir: String): String =
    graft.core.StagedLayouts.once(spark, s"d22zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d22zone")
      val docs = Tables(spark, dir, "documents")
      graft.operators.SignatureZone.build(spark,
        docs.filter(col("doc_id") < incrementalCut(spark, dir))
          .select(col("doc_id"), col("text")), z,
        shingleN, minhashK, minhashBands)
      z
    }

  /** Incremental near-dup dedup from the persisted signature zone
    * (d22): the arriving delta (last 1/5 of the corpus) is deduped
    * against ALL of history without re-shingling it — delta band rows
    * probe the stored zone for cross candidates, a delta self-join
    * yields internal candidates, and exact Jaccard verifies both over
    * candidate documents only ([[graft.operators.SignatureZone
    * .incrementalPairs]]). At 100 TB this is the posture that replaces
    * d8's full-corpus recompute with per-batch work: band derivation
    * scales with the delta, the zone probe with band collisions, and
    * history text is read per-candidate, never per-document.
    */
  def d22IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val delta = docs.filter(col("doc_id") >= incrementalCut(spark, dir))
      .select(col("doc_id"), col("text"))
    graft.operators.SignatureZone.incrementalPairs(
        docs, delta, signatureZone(spark, dir), jaccardThreshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** d22 served from a zone whose geometry was OUTGROWN and REBUILT
    * (d27): the original k=16/4-band zone is re-indexed side-by-side to
    * k=32/8 bands (the capacity move every zone's creation guard
    * points at — banding selectivity re-planned for a grown corpus;
    * rows-per-band stays 4 so the probe shape is unchanged) and cut
    * over with [[graft.operators.ZoneRebuild]]'s fingerprint-guarded
    * rename publish. The delta then dedups against the REBUILT zone.
    * The oracle is d22's chain under the NEW geometry (32 minhashes,
    * 8 bands) — proving the cutover zone answers exactly like a zone
    * freshly built with that geometry, i.e. the swap lost and invented
    * nothing (ZoneRebuildSpec pins the crash/guard mechanics; this
    * entry puts the end-to-end answer under the driver's hash).
    */
  def d27RebuiltZoneDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val cut = incrementalCut(spark, dir)
    val zones = graft.core.StagedLayouts.once(spark, s"d27zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d27zone")
      val hist = docs.filter(col("doc_id") < cut)
        .select(col("doc_id"), col("text"))
      // the zone as originally capacity-planned...
      graft.operators.SignatureZone.build(spark, hist, s"$z/sig",
        shingleN, minhashK, minhashBands)
      // ...outgrown: rebuild side-by-side at twice the signature width
      // and atomically cut over (the old zone serves until the swap)
      graft.operators.ZoneRebuild.rebuild(spark, s"$z/sig") { staging =>
        graft.operators.SignatureZone.build(spark, hist, staging,
          shingleN, minhashK * 2, minhashBands * 2)
      }
      z
    }
    graft.operators.SignatureZone.incrementalPairs(
        docs, docs.filter(col("doc_id") >= cut)
          .select(col("doc_id"), col("text")),
        s"$zones/sig", jaccardThreshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** d22 served from the OPTIMIZEd, DISK-BUCKETED band zone (d25): the
    * zone is first compacted ([[graft.operators.SignatureZone.optimize]]
    * — replay duplicates folded, per-batch file storm collapsed into
    * bh-clustered shards), then its band rows staged as a table
    * bucketed on (band, bh), so the zone probe consumes the bucketed
    * scan with ZERO zone-side Exchange — the q64/d20 layout move the
    * zone scaladoc promises, executed (PlanShapeSpec pins the plan
    * property; the staleness ledger fails a probe against a table
    * staged before later appends). Same oracle as d22: storage layout
    * must be invisible in the result.
    */
  def d25IncrementalDedupBucketed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val zone = signatureZone(spark, dir)
    val table = graft.core.StagedLayouts.once(spark, s"d25bands|$dir") { () =>
      graft.operators.SignatureZone.optimize(spark, zone): Unit
      graft.operators.SignatureZone.bucketedBandsTable(spark, zone)
    }
    val delta = docs.filter(col("doc_id") >= incrementalCut(spark, dir))
      .select(col("doc_id"), col("text"))
    graft.operators.SignatureZone.incrementalPairs(
        docs, delta, zone, jaccardThreshold, bandsTable = Some(table))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Capped incremental near-dup dedup (d24): d22's posture with the
    * stop-shingle df cap RESTORED — the round-11 seam where
    * `SignatureZone.incrementalPairs` ran uncapped because the cap
    * needs corpus-wide document frequencies an incremental step must
    * not recompute. The frequencies now live in their own incremental
    * zone ([[graft.operators.ShingleDfZone]] — per-batch counts, reader
    * sums), and the signature zone is BUILT bound to it
    * (`buildCapped`): history bands, delta bands, and verification all
    * drop the hot shingles (df > cap over the df zone's coverage =
    * history), so a boilerplate shingle shared by f history docs costs
    * ZERO probe rows instead of f. Cap = max(50, ceil(√n)) over the
    * full corpus (the capacity plan, [[Dedup.deriveDocFreqCap]]).
    *
    * The whole pipeline uses ONE cap set, so the result equals the
    * capped BATCH pipeline run over the same pre-capped universe
    * (SignatureZoneSpec pins that equivalence; the oracle replays the
    * history-df drop rule exactly).
    */
  def d24IncrementalDedupCapped(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val cut = incrementalCut(spark, dir)
    val cap = Dedup.deriveDocFreqCap(graft.core.Tables.countOf(spark, dir, "documents"))
    val zones = graft.core.StagedLayouts.once(spark, s"d24zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d24zone")
      val hist = docs.filter(col("doc_id") < cut)
        .select(col("doc_id"), col("text"))
      // calibration pass first (df zone over history), then the capped
      // signature backfill bound to it
      graft.operators.ShingleDfZone.create(spark, s"$z/df", shingleN)
      graft.operators.ShingleDfZone.append(hist, s"$z/df", batchId = 0L)
      graft.operators.SignatureZone.buildCapped(spark, hist, s"$z/sig",
        s"$z/df", cap, shingleN, minhashK, minhashBands)
      z
    }
    val delta = docs.filter(col("doc_id") >= cut)
      .select(col("doc_id"), col("text"))
    graft.operators.SignatureZone.incrementalPairs(
        docs, delta, s"$zones/sig", jaccardThreshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Hybrid retrieval (c6): the RAG read path composed end-to-end —
    * dense candidate generation then lexical passage re-rank, the
    * two-stage shape every retrieval deployment runs:
    *
    *   1. vector leg: SRP-LSH top-20 candidates for the vec_id=0 query
    *      ([[graft.operators.Similarity.lshTopK]] — d6's operator, k
    *      widened for recall; candidate generation is the cheap,
    *      high-recall stage);
    *   2. lexical leg: the query TERMS are doc 0's top-3 non-stopword
    *      tokens (count desc, token asc — derived from the data, no
    *      magic strings; a 3-row driver read);
    *   3. only the ~k candidate documents are chunked (x18's tiling
    *      behind a broadcast semi-join — the corpus is never chunked
    *      for a query) and each passage scores
    *      `Σ_t occurrences(t, chunk)` — exact integer hits, the
    *      deterministic stand-in for BM25's tf term (idf needs
    *      transcendentals that cannot hash-match across engines);
    *   4. hybrid rank: (hits desc, cos_sim desc, doc, chunk) top-10 —
    *      TakeOrderedAndProject, never a global sort.
    *
    * Scale shape: the candidate set is k rows (broadcast); chunking
    * and scoring are codegen'd projections over k documents; the only
    * corpus-sized work is the LSH leg, whose bucket-probe plan is
    * d6's. At 100 TB the retrieval cost is the candidate scan, not the
    * corpus.
    */
  def c6HybridRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    // round-10: the candidate leg is served from the OPTIMIZED
    // persisted index zone (result-identical to the in-session lshTopK
    // derivation — SimilaritySpec pins both equalities), so the
    // per-query cost drops the corpus count() and full-corpus bucket
    // assignment AND the probe opens only the stats-planned file
    // subset of the index — the full production read posture
    val cand = graft.operators.AnnIndexZone.topK(
      emb, queryVec(spark, dir), annIndexZoneOptimized(spark, dir), 20)
    hybridRetrievalTail(spark, dir, cand)
  }

  /** c6/c15's shared LEXICAL leg + fusion: data-derived query terms,
    * x18's chunk tiling over the candidate documents only (behind a
    * broadcast semi-join), exact integer term hits, hybrid top-10 —
    * the two compositions differ ONLY in which ANN stack supplies
    * `cand (vec_id, cos_sim)`.
    */
  private def hybridRetrievalTail(spark: SparkSession, dir: String,
      cand: DataFrame): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val stopWords = TextOps.langMarkers.head._2
    val terms = docs.filter(col("doc_id") === 0)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(!col("w").isInCollection(stopWords))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(3)
      .select(col("w")).collect().map(_.getString(0)).toSeq
    val candDocs = docs.join(
      broadcast(cand.select(col("vec_id").as("doc_id"))), Seq("doc_id"), "left_semi")
    // reduceOption: a query document that is missing, empty, or all
    // stopwords yields zero terms — every passage then scores 0 hits
    // (the oracle's coalesce(sum(...), 0) over an empty term set), it
    // must not crash the plan build
    val hits = terms.map(t =>
      size(filter(split(col("chunk"), " "), x => x === lit(t))).cast("long"))
      .reduceOption(_ + _).getOrElse(lit(0L))
    chunkTiles(candDocs, 32, 24)
      .join(broadcast(cand.withColumnRenamed("vec_id", "doc_id")), Seq("doc_id"))
      .select(col("doc_id"), col("chunk_idx"), hits.as("hits"), col("cos_sim"))
      .orderBy(col("hits").desc, col("cos_sim").desc, col("doc_id"), col("chunk_idx"))
      .limit(10)
  }

  /** Hybrid retrieval on the TRAINED vector stack (c15): c6's read
    * path with the candidate leg served by the route → ADC-shortlist →
    * exact-refine pipeline (d32, k=20) instead of SRP multi-probe —
    * the RAG posture once a deployment's index outgrows data-blind
    * hashing. Per-query vector cost: cell metadata + probed cells'
    * 8-byte codes + 50 raw vectors; the lexical leg and fusion are
    * c6's verbatim ([[hybridRetrievalTail]]), so the two compositions
    * cannot drift.
    */
  def c15RetrievalRefined(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cand = graft.operators.PqZone.refinedTopK(
        emb, ivfQueries(spark, dir).filter(col("q_id") === 0),
        pqZone(spark, dir), ivfIndexZone(spark, dir),
        k = 20, r = pqRefineR, nprobe = 2)
      .select(col("vec_id"), col("cos_sim"))
    hybridRetrievalTail(spark, dir, cand)
  }

  /** Near-dup cluster resolution: connected components over the verified
    * LSH pairs (d8's output), yielding one canonical keeper per cluster —
    * the step that turns pair lists into actual row drops. See
    * [[Dedup.connectedComponents]].
    */
  def d9DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val pairs = Dedup.lshVerifiedPairs(
      docs, col("doc_id"), col("text"),
      n = 3, k = minhashK, bands = minhashBands,
      minJaccard = jaccardThreshold, maxDocFreq = stopShingleDf(docs))
    Dedup.connectedComponents(docs.select(col("doc_id")), pairs)
      .orderBy(col("doc_id"))
  }

  /** d9's verified near-dup edge list ON DISK, symmetric and bucketed
    * by dst — staged once per (session, source dir) via
    * [[graft.core.StagedLayouts]] (the CREATE TABLE is setup: a
    * production dedup service keeps its candidate graph persisted, not
    * re-mined per resolution run). Spec seam: DedupClusterSpec iterates
    * from this exact table.
    */
  private[graft] def ccEdgeTable(spark: SparkSession, dir: String): String =
    graft.core.StagedLayouts.once(spark, s"d20edges|$dir") { () =>
      val t = "d20_edges_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      val docs = Tables(spark, dir, "documents")
      val pairs = Dedup.lshVerifiedPairs(
        docs, col("doc_id"), col("text"),
        n = 3, k = minhashK, bands = minhashBands,
        minJaccard = jaccardThreshold, maxDocFreq = stopShingleDf(docs))
        .select(col("doc_a"), col("doc_b"))
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .write.format("parquet").bucketBy(8, "dst").saveAsTable(t)
      t
    }

  /** Connected components from the DISK-bucketed edge table (d20) —
    * d9's resolution with the edge layout a 100 TB dedup graph needs:
    * every fixpoint round's dst-keyed join consumes the bucketed scan
    * with zero edge-side Exchange and only the vertex-sized label table
    * moves ([[graft.operators.Dedup.connectedComponentsBucketed]]).
    * Same oracle as d9: the layout change must be invisible.
    */
  def d20CcBucketed(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponentsBucketed(
        Tables(spark, dir, "documents").select(col("doc_id")),
        ccEdgeTable(spark, dir))
      .orderBy(col("doc_id"))

  /** Quality-aware keeper selection — the end-to-end dedup decision a
    * production pipeline actually ships: near-dup clusters (d9's
    * pipeline) joined with per-document quality (x3's score), keeping
    * the HIGHEST-QUALITY document per cluster rather than d9's
    * positional min-id keeper. Ranking is a window partitioned by
    * component (parallel across clusters; cluster sizes are tiny by
    * construction), with the doc id as the deterministic tiebreak —
    * scores are bit-identical across engines (IEEE-exact ops only), so
    * the keep set reproduces exactly.
    */
  def d12QualityKeeper(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val pairs = Dedup.lshVerifiedPairs(
      docs, col("doc_id"), col("text"),
      n = 3, k = minhashK, bands = minhashBands,
      minJaccard = jaccardThreshold, maxDocFreq = stopShingleDf(docs))
    val clusters = Dedup.connectedComponents(docs.select(col("doc_id")), pairs)
    val t = col("text")
    // Same arithmetic SHAPE as x3QualityScore (ratio first, then the
    // weighted sum) so the score is the same bit pattern both compute.
    val quality = docs
      .select(col("doc_id"),
        length(t).cast("long").as("n_chars_len"),
        TextOps.tokenCount(t).cast("long").as("n_tokens"),
        size(regexp_extract_all(t, lit("[.,!?;:]"), lit(0))).cast("long").as("punct_cnt"),
        size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast("long").as("digit_cnt"),
        TextOps.langHits(t, TextOps.langMarkers.head._2).cast("long").as("stop_cnt"))
      .select(col("doc_id"),
        ((col("stop_cnt").cast("double") / col("n_tokens")) * 5.0
          - (col("punct_cnt").cast("double") / col("n_chars_len")) * 3.0
          - (col("digit_cnt").cast("double") / col("n_chars_len")) * 2.0
          + when(col("n_chars_len").between(100, 400), 0.5).otherwise(0.0))
          .as("quality_score"))
    Dedup.qualityKeeper(clusters, quality).orderBy(col("doc_id"))
  }

  /** Deterministic train/val/test split (80/10/10): the assignment is a
    * pure hash of the stable doc id — reproducible across runs, engines
    * and cluster sizes (no RNG state, no sampling drift), which is what a
    * training pipeline needs for leak-free splits. Narrow projection,
    * zero shuffle.
    */
  def x6DeterministicSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = TextOps.h60(concat(lit("split:"), col("doc_id").cast("string"))) % 100
    Tables(spark, dir, "documents")
      .select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  }

  /** Weighted sampling (x21): draw k=100 documents with inclusion bias
    * proportional to a per-row weight (here length — the stand-in for a
    * quality score, the knob data-mixing recipes actually turn). This is
    * priority sampling (Duffield-Lund-Thorup): each row's priority is
    * h/w for a uniform deterministic hash h, and the k SMALLEST
    * priorities are the sample — heavier rows draw smaller priorities
    * proportionally more often, and the whole draw is reproducible from
    * the ids alone (x6's seeded-hash contract; a `rand()`-based sampler
    * can never be oracle-checked or re-run). Integer `div` keeps both
    * engines bit-identical; ties break on doc_id so the k-th slot is
    * total-ordered. Scale shape: one narrow scan + TakeOrderedAndProject
    * (per-partition top-k, k rows per partition into the driver merge —
    * never a global sort), identical at any corpus size.
    */
  def x21WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val h = TextOps.h60(concat(lit("wsample:"), col("doc_id").cast("string")))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), greatest(col("n_chars"), lit(1L)).as("weight"),
        h.as("h"))
      .withColumn("priority", expr("h div weight"))
      .select(col("doc_id"), col("weight"), col("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(100)
  }

  /** Vocabulary building: corpus-wide token frequencies, top-100 with a
    * deterministic tiebreak — the first step of any tokenizer/vocab prep.
    * One partial-aggregated shuffle on the token; top-k is
    * TakeOrderedAndProject (no global sort).
    */
  def x7VocabTopk(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(100)

  /** Heavy hitters via a mergeable frequencies sketch
    * ([[graft.functions.SketchExpressions.freqSketch]], DataSketches
    * Misra-Gries) — [[x7VocabTopk]]'s answer through the BOUNDED-MEMORY
    * path. x7's exact formulation shuffles the full distinct-token
    * universe (billions of keys at 100 TB); the sketch ships one
    * ≤maxMapSize counter map per partial and merges, so the shuffle is
    * O(partitions × map), independent of vocabulary size. At verify
    * scale the 31-token vocabulary fits the map, counts are exact, and
    * the DuckDB oracle hash-matches x7's tail; past capacity the read
    * keeps NO_FALSE_NEGATIVES with per-item error bounds
    * (SketchExpressionsSpec pins both modes).
    */
  def x19HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SketchExpressions.register(spark)
    import graft.functions.{SketchExpressions => SK}
    Tables(spark, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .agg(SK.freqSketch(col("token"), 512).as("sk"))
      .select(explode(SK.freqTopItemsCol(col("sk"))).as("f"))
      .select(col("f.item").as("token"), col("f.est").as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)
  }

  /** Fuzzy near-dup pairs on a short derived title (first three tokens):
    * blocked edit distance — see [[Dedup.fuzzyPairs]]. The title field
    * stands in for the short-string columns (titles, URLs, author
    * names) fuzzy matching targets in a real pipeline; full-document
    * edit distance is never the production shape (that is what the
    * shingle/MinHash family is for).
    */
  def d14FuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val title = array_join(slice(TextOps.tokens(col("text")), 1, 3), " ")
    Dedup.fuzzyPairs(
        Tables(spark, dir, "documents"), col("doc_id"), title,
        maxDist = 3, maxBlock = 500)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Vocabulary coverage / OOV rate: build the corpus top-100 vocabulary
    * (x7's shape), broadcast it back, and score every document by the
    * fraction of its tokens outside the vocabulary — the tokenizer-fit
    * metric a training pipeline tracks per source/snapshot. Scale shape:
    * the vocab is top-K (broadcast-sized BY CONSTRUCTION no matter the
    * corpus), the corpus side is one narrow tokenize pass + one partial-
    * aggregated shuffle on doc_id; the vocab membership probe is a
    * broadcast hash join, so the corpus never shuffles for it.
    *
    * The exploded token frame feeds both the vocab aggregate and the
    * probe, and is DELIBERATELY not persisted (unlike d7/d13's
    * corpus-row-sized projections): it is token-row-sized — an order of
    * magnitude larger than the corpus — so at 100 TB caching it costs
    * more in spill I/O than re-running the codegen'd tokenizer; the
    * second pass recomputes a projection, it does not re-shuffle.
    */
  def x15OovRate(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(100)
      .select(col("token"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Bigram-LM familiarity scoring — the statistical-LM fluency filter
    * (CCNet's KenLM perplexity gate, Gopher's quality heuristics peer):
    * train a pruned bigram model on the corpus, then score every
    * document by its mean add-one-smoothed transition probability. Here
    * train and score corpora coincide (self-scoring flags the corpus's
    * own least-fluent tail); the [[TextOps.lmFamiliarity]] seam takes
    * the model and the scored corpus independently for the production
    * train-on-reference/score-the-crawl shape. All integer math — see
    * the seam's determinism contract (no libm log; DuckDB re-derives
    * the identical scaled rationals). minCount=2 prunes singleton
    * bigrams: the model stays Zipf-head-sized and broadcastable.
    */
  def x16LmFamiliarity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val bi = TextOps.bigrams(docs, col("doc_id"), col("text"))
    TextOps.lmFamiliarity(docs, col("doc_id"), bi,
        TextOps.bigramLm(bi, minCount = 2L))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF keyword extraction: the top-3 most characteristic terms per
    * document — the term-importance signal behind keyword tagging,
    * topic clustering seeds, and per-source vocabulary drift reports.
    * The score is the exact-integer rational `tf * n_docs div df` (the
    * same log-free determinism contract as x16: classic `tf·log(N/df)`
    * needs libm and two engines' doubles never bit-agree; the rational
    * keeps the df-discounting order within a document and both engines
    * re-derive it exactly). Scale shape: tf is ONE partial-aggregated
    * shuffle on (doc_id, token); df rides a token-partitioned window
    * over the already-aggregated tf frame (token-row-sized, an order
    * smaller than the exploded token stream — never re-touches the
    * corpus); n_docs is a 1-row broadcast fed by a column-pruned
    * count-only pass (no text bytes read); the per-doc top-3 is a
    * doc_id-partitioned row_number — every shuffle is on the reduced
    * frame, the raw text is tokenized exactly once.
    */
  def x17TfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = Tables(spark, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .crossJoin(broadcast(nDocs))
      // `div` (truncating) vs the oracle's `//` (flooring) agree here by
      // construction: tf/df/n_docs are occurrence counts >= 1, so the
      // quotient is never negative (the sign-sensitive divergence q41
      // guards with pmod cannot arise from counts)
      .withColumn("score", expr("tf * n_docs div df"))
      .withColumn("kw_rank", row_number().over(byDoc).cast("long"))
      .filter(col("kw_rank") <= 3)
      .select(col("doc_id"), col("kw_rank"), col("token"),
        col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("kw_rank"))
  }

  /** Sliding-window document chunking — the context-length prep step for
    * embedding/RAG pipelines: each document's token stream is cut into
    * fixed-size chunks (32 tokens) with overlap (stride 24, so 8 tokens
    * of context carry across the cut). The dual of x12's packing: x12
    * concatenates short docs up to the context window, chunking splits
    * long docs down to it. Scale shape: a pure MAP-side operator — one
    * corpus scan, tokens computed once, chunk starts generated by
    * `sequence` and expanded by ONE posexplode; zero shuffles except the
    * output-contract sort (plan-pinned). Per-doc fan-out is
    * ceil(n_tokens/stride), bounded by document length, never by corpus
    * size. Token-less docs yield no chunks (the d4 row-set rule).
    */
  def x18ChunkSplit(spark: SparkSession, dir: String): DataFrame =
    chunkSplit(Tables(spark, dir, "documents"))

  /** Library seam for [[x18ChunkSplit]]: chunk a caller-supplied corpus.
    * `chunkLen` is the window, `stride` the hop; `stride < chunkLen`
    * overlaps chunks, `stride == chunkLen` tiles them exactly.
    */
  def chunkSplit(docs: DataFrame, chunkLen: Int = 32, stride: Int = 24): DataFrame =
    chunkTiles(docs, chunkLen, stride).orderBy(col("doc_id"), col("chunk_idx"))

  /** [[chunkSplit]] without the output-contract sort — the composition
    * seam for consumers ([[passageDedup]]) that immediately re-shuffle;
    * keeping the sort out of the middle of their plans is explicit
    * rather than delegated to EliminateSorts.
    */
  private def chunkTiles(docs: DataFrame, chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen > 0 && stride > 0, s"chunkLen/stride must be positive")
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .filter(col("n") > 0)
    toks
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0), col("n") - 1, lit(stride))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        slice(col("toks"), col("col") + 1,
          least(lit(chunkLen), col("n") - col("col"))).as("chunk_toks"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk_toks")).cast("long").as("n_tok"),
        concat_ws(" ", col("chunk_toks")).as("chunk"))
  }

  /** Passage-level exact dedup (d17) — the corpus-hygiene step BETWEEN
    * document-level d1 and substring-level dedup, the
    * MassiveText/Gopher recipe expressed relationally: documents are
    * tiled into fixed 4-token passages ([[chunkTiles]] with
    * stride == length), every passage that repeats ANYWHERE in the
    * corpus keeps only its globally first occurrence
    * (min (doc_id, position)), and survivors are reassembled in
    * position order — so boilerplate repeated across documents
    * (headers, license blocks, navigation chrome) is removed from every
    * copy but the first while each document's unique prose survives.
    *
    * Scale shape: the keeper per passage text is a partial-aggregable
    * min-over-struct, so a boilerplate passage repeated millions of
    * times collapses to one row per map task BEFORE the exchange (the
    * skew-proof formulation; a row_number window PARTITION BY chunk
    * would ship every occurrence of the hot passage into one task).
    * The join back is keyed on the same passage text — two exchanges
    * total plus the per-doc reassembly agg, `shuffle_hash` because the
    * keeper table is corpus-sized (one row per DISTINCT passage), never
    * broadcastable.
    */
  def d17PassageDedup(spark: SparkSession, dir: String): DataFrame =
    passageDedup(Tables(spark, dir, "documents"))

  /** EXACT-SUBSTRING dedup (d33) — the remaining member of the dedup
    * ladder (d1 whole-document, d17 fixed-tile passage, d2/d8 fuzzy
    * document): find every maximal token SPAN that occurs verbatim
    * more than once anywhere in the corpus, at ANY alignment — the
    * Lee et al. "Deduplicating Training Data" rule that catches
    * boilerplate d17's fixed tiling misses when copies shift by a few
    * tokens. Sliding [[ssdedupW]]-token windows are hashed per
    * position; a window duplicated corpus-wide (count ≥ 2 over all
    * (doc, pos) occurrences — within-doc repeats count, as in the
    * paper) marks its span, and overlapping/adjacent marked spans
    * merge into maximal islands (q63's running-max-end rule on token
    * intervals). Output: one row per maximal duplicated span,
    * `(doc_id, span_start, span_end, n_windows)`, 1-based inclusive
    * token positions — the removal list a cleaning pass applies.
    *
    * Scale shape: window hashing is a per-document EXPRESSION (one
    * `transform` over the token array — O(tokens·W) work, no
    * per-position row blowup until the single posexplode); the
    * duplicate test is one hash-keyed partial aggregation (a
    * boilerplate window repeated millions of times collapses map-side
    * — the d17 skew argument) plus a semi-join back on the same key;
    * the island merge is a doc-keyed window over MARKED positions
    * only. Nothing is ever corpus × corpus; suffix arrays (the
    * paper's tool) don't distribute, sliding hashes do.
    */
  def d33SubstringDedup(spark: SparkSession, dir: String): DataFrame =
    substringDedupSpans(Tables(spark, dir, "documents"), ssdedupW)

  /** The cleaning CONSUMER of d33 (x25): reassemble every document
    * minus its duplicated spans — the pass that actually applies the
    * removal list. A document whose every token sits inside a
    * duplicated span drops out entirely (the Gopher-style fate of
    * pure-boilerplate docs); a document with no spans passes through
    * verbatim. Output `(doc_id, n_kept, clean_text)`.
    *
    * Scale shape: d33's span derivation (see there) plus one
    * doc-keyed anti join. The span list is the OUTPUT of a corpus-wide
    * aggregation and grows with the corpus (web-scale boilerplate ⇒
    * billions of span rows at 100 TB), so it must never broadcast —
    * the d17 keeper-table rule applies here too. The join has a
    * `doc_id` equi-component, so a doc_id-keyed shuffled-hash join
    * with the spans side building (spans per doc ≪ tokens per doc) is
    * the scale-safe plan; the range predicate evaluates post-probe.
    * Reassembly is the d17 sort_array/collect_list idiom inside a
    * doc-keyed agg. Plan pinned in PlanShapeSpec ("x25: span removal
    * join never broadcasts the spans side").
    */
  def x25SubstringClean(spark: SparkSession, dir: String): DataFrame =
    substringClean(Tables(spark, dir, "documents"), ssdedupW)

  private[graft] def substringClean(docs: DataFrame, w: Int): DataFrame = {
    val spans = substringDedupSpans(docs, w)
      .select(col("doc_id"), col("span_start"), col("span_end")).as("sp")
    val toks = docs
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("p", "w")))
      .select(col("doc_id"), (col("p") + 1L).as("i"), col("w")).as("tk")
    toks.join(spans.hint("shuffle_hash"),
        col("tk.doc_id") === col("sp.doc_id") &&
          col("i").between(col("span_start"), col("span_end")), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("i"), col("w")))),
          s => s.getField("w"))).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** The persisted window-count zone over the HISTORY slice — d33's
    * incremental posture ([[graft.operators.WindowZone]]); built once
    * per (session, dir). Spec seam for SubstringDedupSpec.
    */
  private[graft] def windowZone(spark: SparkSession, dir: String): String =
    graft.core.StagedLayouts.once(spark, s"d34zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d34zone")
      val docs = Tables(spark, dir, "documents")
      graft.operators.WindowZone.create(spark, z, ssdedupW)
      graft.operators.WindowZone.append(
        docs.filter(col("doc_id") < incrementalCut(spark, dir)), z, batchId = 0L)
      z
    }

  /** Incremental exact-substring dedup (d34): the arriving delta (last
    * 1/5 by id) finds its duplicated spans against history∪delta by
    * probing the STORED window counts — history text is never re-read
    * or re-hashed (d22's posture applied to d33). The incremental rule
    * (stored count + delta count ≥ 2) is exactly d33's corpus-wide
    * rule, so the output provably equals the batch recompute
    * restricted to delta documents — the oracle IS d33's chain with a
    * delta filter, and SubstringDedupSpec pins the equality engine-side.
    */
  def d34IncrementalSubstring(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val delta = docs.filter(col("doc_id") >= incrementalCut(spark, dir))
      .select(col("doc_id"), col("text"))
    graft.operators.WindowZone.incrementalSpans(delta, windowZone(spark, dir))
  }

  /** Library seam for [[d33SubstringDedup]] (spec fixtures). `docs`
    * must expose `doc_id` and `text`.
    */
  private[graft] def substringDedupSpans(docs: DataFrame, w: Int): DataFrame = {
    val winsT = graft.core.Caches.persistTracked(
      graft.operators.Dedup.windowHashes(docs, col("doc_id"), col("text"), w))
    // corpus-wide duplicated window hashes: partial-agg collapses hot
    // boilerplate map-side; the marked-position semi-join is h-keyed
    val dupH = winsT.groupBy(col("h"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select(col("h"))
    // the duplicated-hash set builds (duplication is the exception, so
    // it is orders smaller than the window table, which streams)
    val marked = winsT.join(dupH.hint("shuffle_hash"), Seq("h"))
      .select(col("doc_id"), col("s"))
    graft.operators.Dedup.mergeWindowSpans(marked, w)
  }

  /** Library seam for [[d17PassageDedup]]: passage-dedup a
    * caller-supplied corpus; `passageLen` is the tile width in tokens
    * (production corpora use ~50-token tiles; 4 here so the synthetic
    * corpus actually exhibits cross-document repetition).
    */
  def passageDedup(docs: DataFrame, passageLen: Int = 4): DataFrame = {
    val p = chunkTiles(docs, passageLen, passageLen)
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
    val keepers = p.groupBy(col("chunk"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("keeper"))
    p.hint("shuffle_hash")
      .join(keepers, Seq("chunk"))
      .withColumn("keep", col("keeper.doc_id") === col("doc_id") &&
        col("keeper.chunk_idx") === col("chunk_idx"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_passages"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        concat_ws(" ", transform(
          sort_array(collect_list(when(col("keep"),
            struct(col("chunk_idx"), col("chunk"))))),
          s => s.getField("chunk"))).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination: shingle-overlap of every corpus document
    * against a held-out benchmark set (doc_id ≡ 0 mod 97 stands in for
    * the eval suite). The benchmark's distinct shingles are the small
    * side of a semi-ish join keyed on the shingle; per-doc contamination
    * rate = overlapping / total shingles. At 100 TB the benchmark side
    * stays a broadcast-sized distinct set, the corpus side is one narrow
    * shingle pass — the standard decontamination shape (n would be 8-13
    * in production; 3 here to share the oracle's shingle machinery).
    */
  def x9Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val benchShingles = Dedup
      .shingles(docs.filter(col("doc_id") % 97 === 0), col("doc_id"), col("text"), 3)
      .select(col("shingle")).distinct()
    // Two subtrees consume the corpus shingles (totals + overlap);
    // tracked persist — drivers release after materializing.
    val corpusShingles = graft.core.Caches.persistTracked(Dedup
      .shingles(docs.filter(col("doc_id") % 97 =!= 0), col("doc_id"), col("text"), 3))
    val totals = corpusShingles.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val contaminated = corpusShingles
      .join(broadcast(benchShingles), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    totals.join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_rate",
        col("n_contaminated").cast("double") / col("n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Corpus n-gram novelty: for each document, the fraction of its
    * distinct trigram shingles whose FIRST corpus occurrence (min
    * doc_id, standing in for ingestion order) is that document — the
    * novelty curve data-curation pipelines use to measure how much new
    * content each source/batch actually contributes (a crawl snapshot
    * that re-fetches yesterday's pages scores near zero and gets
    * dropped before any expensive downstream pass). Same first-seen
    * attribution as the reference's `ON CONFLICT DO NOTHING` loader
    * (`src/dao/cardano_block_dao.py:140-148`) — earliest writer owns
    * the key — applied per shingle instead of per PK.
    */
  def x22NgramNovelty(spark: SparkSession, dir: String): DataFrame =
    ngramNovelty(Tables(spark, dir, "documents"))

  /** Library seam for [[x22NgramNovelty]]: novelty-score a
    * caller-supplied corpus (`doc_id`, `text`) at shingle width `n`.
    *
    * Scale shape: first-occurrence per shingle is a partial-aggregable
    * MIN, so a boilerplate shingle repeated in millions of documents
    * collapses map-side BEFORE the exchange (the d17 keeper move at
    * shingle altitude). The join back is keyed on the shingle against
    * ONE keeper row per distinct shingle — a df-f shingle contributes f
    * join rows, linear, so unlike the pairwise d2/d3 family this needs
    * no stop-shingle cap to stay corpus-scale. `shuffle_hash` because
    * the firsts table is corpus-sized (one row per distinct shingle),
    * never broadcastable; two exchanges total (shingle, then doc_id).
    *
    * Documents shorter than `n` tokens produce zero shingles and are
    * OMITTED from the output (no row, rather than a 0/0 novelty_rate) —
    * the same dropped-rows contract as the d2/d3 shingle family. A
    * consumer iterating the novelty curve over a corpus with sub-`n`
    * documents should left-join this result back to the doc table if it
    * needs those ids present (their novelty is undefined, not zero: a
    * document with no shingles contributes nothing old OR new).
    */
  def ngramNovelty(docs: DataFrame, n: Int = 3): DataFrame = {
    // Both the firsts aggregate and the join probe consume the shingle
    // table; tracked persist — drivers release after materializing.
    val sh = graft.core.Caches.persistTracked(
      Dedup.shingles(docs, col("doc_id"), col("text"), n))
    val firsts = sh.groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_doc"))
    sh.hint("shuffle_hash").join(firsts, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_rate",
        col("n_novel").cast("double") / col("n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** PII detection + redaction: emails, IPv4 addresses, and phone-shaped
    * digit runs counted then replaced with typed placeholder tokens — the
    * scrub every training corpus needs before anything else sees it.
    * The corpus text carries no PII, so deterministic synthetic PII is
    * injected first (derived from doc_id) and the scrubber must find
    * exactly it; counts + an md5 of the redacted text keep the checked
    * row narrow. Pure codegen'd projections, zero shuffle; the regexes
    * stay inside the Java-regex/RE2 common subset so both engines agree.
    */
  def x13PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val phoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
    val injected = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
      lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0.1"),
      lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(injected, emailRe, "<EMAIL>"),
        ipRe, "<IP>"),
      phoneRe, "<PHONE>")
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(regexp_extract_all(injected, lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(injected, lit(ipRe), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all(injected, lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        md5(redacted).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  /** BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    * (apostrophe contractions, space-prefixed letter runs, digit runs,
    * punctuation runs) — the unit a byte-pair tokenizer starts from, and
    * a closer proxy for LLM token budgets than word counts. The pattern
    * uses only alternation + character classes, so Java regex (Spark)
    * and RE2 (DuckDB) agree byte-for-byte.
    */
  def x8BpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val pat = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+"
    val t = lower(col("text"))
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(regexp_extract_all(t, lit(pat), lit(0))).cast("long").as("n_bpe_tokens"),
        TextOps.tokenCount(col("text")).cast("long").as("n_word_tokens"))
      .withColumn("bpe_per_word",
        col("n_bpe_tokens").cast("double") / col("n_word_tokens"))
      .orderBy(col("doc_id"))
  }

  /** x31's training-vocabulary cut and merge count — shared with the
    * oracle generator so both engines train the same table, and with
    * c18 so the encode pass applies exactly the trained chain.
    */
  private[graft] val bpeVocabTop = 1024
  private[graft] val bpeMerges = 8

  /** x32's epoch count — one literal feeding BOTH the engine's
    * exploded-epoch array and the oracle's VALUES list (the
    * bpeVocabTop/bpeMerges discipline: co-varying constants live in
    * one val so the two sides cannot drift).
    */
  private[graft] val epochCount = 2

  /** BPE tokenizer TRAINING (x31): learn [[bpeMerges]] merge rules from
    * the corpus word histogram — the missing half of the tokenizer
    * family (x7/x8 count under a FIXED tokenizer; this derives the
    * tokenizer). Output = the learned merge table in order, with pair
    * frequencies: 8 rows, fully deterministic under the
    * (count DESC, lft, rgt) tiebreak.
    *
    * Scale: the corpus is touched ONCE (the word histogram's
    * partial-aggregated shuffle); the merge loop runs on the
    * top-[[bpeVocabTop]] rows — metadata-sized — with one 1-row argmax
    * collect per step (the centroid-load pattern). The DuckDB oracle
    * unrolls the same k stages as CTEs; exact integer counts and ASCII
    * `\w+` words make every stage hash-identical.
    */
  def x31BpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val merges = graft.operators.Bpe.train(
      Tables(spark, dir, "documents"), col("text"), bpeVocabTop, bpeMerges)
    spark.createDataFrame(merges)
      .select(col("step"), col("lft"), col("rgt"), col("merged"),
        col("pairCnt").as("pair_cnt"))
      .orderBy(col("step"))
  }

  /** Corpus encoded with the TRAINED tokenizer (c18): x31's merge table
    * inlined as a literal codegen'd replace chain applied to every
    * word of every document (the c10 literal-centroid pattern applied
    * to tokenizer state — train on the metadata-sized histogram, then
    * ONE corpus projection with zero joins and zero shuffles beyond
    * the output sort). Per doc: word count, initial symbol count
    * (= word chars), BPE token count under the learned merges, and the
    * compression ratio — the number a pretraining pipeline prices its
    * token budget with.
    */
  /** c18's (and the BPE-priced tail's) tokenizer state: x31's training
    * run ONCE per session, persisted as a k-row merge-table zone
    * ([[graft.operators.Bpe.saveMerges]]) and loaded back — the c10
    * literal-centroid discipline applied to the tokenizer (the trained
    * table is REFRESH output, not per-query work; the timed encode
    * measures the corpus projection, and an x31+c18 session pays one
    * histogram pass, not two). `filterTo`: train over a history PREFIX
    * only (the incremental entries' decision-state rule — refresh
    * output is fitted over history, then prices arriving deltas).
    */
  private[graft] def stagedBpeMerges(spark: SparkSession, dir: String,
      filterTo: Option[Long] = None): Seq[graft.operators.Bpe.Merge] = {
    import graft.operators.Bpe
    val key = filterTo.fold(s"bpezone|$dir")(c => s"bpezone|$dir|$c")
    val path = graft.core.StagedLayouts.once(spark, key) { () =>
      val z = graft.core.Scratch.dir("bpezone")
      val corpus = filterTo.foldLeft(Tables(spark, dir, "documents"))(
        (d, c) => d.filter(col("doc_id") < c))
      Bpe.saveMerges(spark,
        Bpe.train(corpus, col("text"), bpeVocabTop, bpeMerges), z)
      z
    }
    Bpe.loadMerges(spark, path)
  }

  /** Per-document BPE token count under a trained merge table — the
    * learned chain inlined as a codegen'd literal replace pipeline
    * summed over the doc's words (zero joins, zero shuffles; shared by
    * c18's encode, c19's priced shard tail, and st32's loop pricer so
    * the pricing formula lives once).
    */
  private[graft] def bpeDocTokens(text: Column,
      merges: Seq[graft.operators.Bpe.Merge]): Column =
    aggregate(
      transform(TextOps.tokens(text),
        w => size(split(graft.operators.Bpe.applyMerges(w, merges), "\t"))
          .cast("long")),
      lit(0L), _ + _)

  def c18BpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncoded(Tables(spark, dir, "documents"), stagedBpeMerges(spark, dir))
      .orderBy(col("doc_id"))

  /** The encode projection shared by c18 (batch) and st32 (per-batch in
    * the streamed loop): per doc — word count, initial symbol count,
    * BPE token count under the learned merges, compression ratio. One
    * narrow codegen'd pass; the merge table rides as literals.
    */
  private[graft] def bpeEncoded(docs: DataFrame,
      merges: Seq[graft.operators.Bpe.Merge]): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nSyms0 = aggregate(
      transform(toks, w => length(w).cast("long")), lit(0L), _ + _)
    // the literal replace-chain encode is the expensive per-row step —
    // widen a narrow input so it parallelizes (no-op at scale; see
    // graft.core.Tables.widened)
    graft.core.Tables.widened(docs.select(col("doc_id"), col("text"))).select(
        col("doc_id"),
        size(toks).cast("long").as("n_words"),
        nSyms0.as("n_syms0"),
        bpeDocTokens(col("text"), merges).as("n_bpe_tokens"))
      .withColumn("compression",
        when(col("n_bpe_tokens") > 0,
          col("n_syms0").cast("double") / col("n_bpe_tokens")))
  }

  /** Deterministic epoch shuffle (x32): the seeded global permutation a
    * pretraining dataloader consumes — every epoch is a reproducible
    * full shuffle of the corpus (position = rank by a seeded
    * cross-engine hash, doc_id tiebreak), and different epochs are
    * DIFFERENT permutations from the same seed family. The naive
    * formulation (`row_number() OVER (ORDER BY hash)`) serializes the
    * corpus through one task — the q20 lesson — so the rank is computed
    * with x12's two-phase scheme: range-partition by the hash (bucket
    * id monotone in hash order), per-bucket row_number under a
    * PARTITIONED window, bucket counts prefix-summed in a √N-sized
    * window, offsets broadcast back. Every corpus-sized step is
    * partition-local.
    */
  def x32EpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val n = graft.core.Tables.countOf(spark, dir, "documents")
    epochShuffle(docs, nEpochs = epochCount, knownCount = n)
      .orderBy(col("epoch"), col("pos"))
  }

  /** All `nEpochs` permutations in ONE corpus pass (the multi-epoch
    * amortization: a dataloader materializing e epochs should scan the
    * corpus once, not e times — epochs ride an exploded array through
    * one range exchange). Within an epoch the range partitioning on
    * (epoch, hk, doc_id) keeps bucket ids monotone in hash order, so
    * per-(bkt, epoch) local ranks plus per-epoch bucket-offset prefix
    * sums (a ≤ e·√N window) reassemble each epoch's exact global rank;
    * a bucket straddling an epoch boundary is handled by the epoch key
    * in both the local window and the offset join.
    * [[epochPermutation]] stays the single-epoch seam; BpeSpec pins
    * fused ≡ per-epoch.
    */
  private[graft] def epochShuffle(docs: DataFrame, nEpochs: Int,
      knownCount: Long): DataFrame = {
    val spark = docs.sparkSession
    val nBuckets = math.min(packBucketCount(knownCount * nEpochs,
      spark.conf.get("spark.sql.shuffle.partitions").toInt),
      Int.MaxValue.toLong).toInt
    val hk = TextOps.h60(concat(lit("epoch"), col("epoch").cast("string"),
      lit(":"), col("doc_id").cast("string")))
    // persistTracked: the local-rank window and the bucket-count
    // aggregate must observe the SAME materialized bucket assignment
    val t = graft.core.Caches.persistTracked(
      docs.select(col("doc_id"))
        .withColumn("epoch",
          explode(array((0 until nEpochs).map(e => lit(e.toLong)): _*)))
        .withColumn("hk", hk)
        .repartitionByRange(nBuckets, col("epoch"), col("hk"), col("doc_id"))
        .withColumn("bkt", spark_partition_id().cast("long")))
    val wLocal = Window.partitionBy(col("bkt"), col("epoch"))
      .orderBy(col("hk"), col("doc_id"))
    val local = t.withColumn("local_rk", row_number().over(wLocal).cast("long"))
    val wBkt = Window.partitionBy(col("epoch")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = t.groupBy(col("bkt"), col("epoch")).agg(count(lit(1)).as("c"))
      .withColumn("bkt_off", coalesce(sum(col("c")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("epoch"), col("bkt_off"))
    local.join(broadcast(off), Seq("bkt", "epoch"))
      .select(col("epoch"), col("doc_id"),
        (col("bkt_off") + col("local_rk")).as("pos"))
  }

  /** One epoch's permutation (library seam for [[x32EpochShuffle]]). */
  private[graft] def epochPermutation(docs: DataFrame, epoch: Int,
      knownCount: Long): DataFrame = {
    val spark = docs.sparkSession
    val nBuckets = math.min(packBucketCount(knownCount,
      spark.conf.get("spark.sql.shuffle.partitions").toInt),
      Int.MaxValue.toLong).toInt
    val hk = TextOps.h60(concat(lit(s"epoch$epoch:"), col("doc_id").cast("string")))
    // persistTracked: the local-rank window and the bucket-count
    // aggregate must observe the SAME materialized bucket assignment
    val t = graft.core.Caches.persistTracked(
      docs.select(col("doc_id")).withColumn("hk", hk)
        .repartitionByRange(nBuckets, col("hk"), col("doc_id"))
        .withColumn("bkt", spark_partition_id().cast("long")))
    val wLocal = Window.partitionBy(col("bkt")).orderBy(col("hk"), col("doc_id"))
    val local = t.withColumn("local_rk", row_number().over(wLocal).cast("long"))
    val wBkt = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = t.groupBy(col("bkt")).agg(count(lit(1)).as("c"))
      .withColumn("bkt_off", coalesce(sum(col("c")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("bkt_off"))
    local.join(broadcast(off), "bkt")
      .select(lit(epoch.toLong).as("epoch"), col("doc_id"),
        (col("bkt_off") + col("local_rk")).as("pos"))
  }

  /** Epoch-ordered sequence packing (c20): x32's permutation FEEDING
    * x12's packing — the dataloader's actual output contract. x32
    * proves the shuffle and x12 proves the packing, but a trainer
    * consumes their COMPOSITION: every epoch's documents laid out in
    * epoch-rank order and concat-chunked into fixed 2048-token rows,
    * so row (epoch, pos) of the shard is byte-deterministic across
    * runs and cluster sizes. Each epoch's token stream restarts at
    * offset 0 (an epoch is one full pass).
    *
    * Scale shape: the rank and the token prefix sum ride ONE corpus
    * exchange — the (epoch, hk, doc_id) range partition that
    * epochShuffle already pays — because position and offset are
    * accumulated by the SAME two-phase scheme: per-(bkt, epoch) local
    * row_number + running token sum under one partitioned window
    * (Spark fuses same-spec frames into one WindowExec), then
    * per-epoch bucket offsets for BOTH accumulators from one ≤ e·√N
    * aggregate, broadcast back. No global window, no second corpus
    * shuffle (the q20 lesson; PlanShapeSpec pins the exchange set).
    */
  def c20EpochPack(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val n = graft.core.Tables.countOf(spark, dir, "documents")
    epochPackedShuffle(docs, nEpochs = epochCount, knownCount = n)
      .orderBy(col("epoch"), col("pos"))
  }

  /** c20's core: [[epochShuffle]] carrying each doc's token count
    * through the range exchange, with the token prefix sum accumulated
    * beside the rank (same windows, same offset join — see c20's
    * scaladoc). `tokensOf` defaults to whitespace pricing; a BPE-priced
    * dataloader swaps in the trained chain (c19's pricer) unchanged.
    */
  private[graft] def epochPackedShuffle(docs: DataFrame, nEpochs: Int,
      knownCount: Long, seqLen: Long = 2048L,
      tokensOf: Column => Column = TextOps.tokenCount(_).cast("long")): DataFrame = {
    val spark = docs.sparkSession
    val nBuckets = math.min(packBucketCount(knownCount * nEpochs,
      spark.conf.get("spark.sql.shuffle.partitions").toInt),
      Int.MaxValue.toLong).toInt
    val hk = TextOps.h60(concat(lit("epoch"), col("epoch").cast("string"),
      lit(":"), col("doc_id").cast("string")))
    // persistTracked: the local windows and the bucket-offset aggregate
    // must observe the SAME materialized bucket assignment (and the
    // tokenizer projection runs once — the frame is 4 longs per doc)
    val t = graft.core.Caches.persistTracked(
      docs.select(col("doc_id"), tokensOf(col("text")).as("n_tokens"))
        .withColumn("epoch",
          explode(array((0 until nEpochs).map(e => lit(e.toLong)): _*)))
        .withColumn("hk", hk)
        .repartitionByRange(nBuckets, col("epoch"), col("hk"), col("doc_id"))
        .withColumn("bkt", spark_partition_id().cast("long")))
    val wOrder = Window.partitionBy(col("bkt"), col("epoch"))
      .orderBy(col("hk"), col("doc_id"))
    val wRun = wOrder.rowsBetween(Window.unboundedPreceding, -1)
    val local = t
      .withColumn("local_rk", row_number().over(wOrder).cast("long"))
      .withColumn("local_off", coalesce(sum(col("n_tokens")).over(wRun), lit(0L)))
    val wBkt = Window.partitionBy(col("epoch")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = t.groupBy(col("bkt"), col("epoch"))
      .agg(count(lit(1)).as("c"), sum(col("n_tokens")).as("btot"))
      .withColumn("bkt_off", coalesce(sum(col("c")).over(wBkt), lit(0L)))
      .withColumn("tok_off", coalesce(sum(col("btot")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("epoch"), col("bkt_off"), col("tok_off"))
    local.join(broadcast(off), Seq("bkt", "epoch"))
      .withColumn("pos", col("bkt_off") + col("local_rk"))
      .withColumn("start_off", col("tok_off") + col("local_off"))
      .withColumn("seq_start", expr(s"start_off div $seqLen"))
      .withColumn("seq_end",
        when(col("n_tokens") === 0, expr(s"start_off div $seqLen"))
          .otherwise(expr(s"(start_off + n_tokens - 1) div $seqLen")))
      .select(col("epoch"), col("doc_id"), col("pos"), col("n_tokens"),
        col("start_off"), col("seq_start"), col("seq_end"))
  }

  /** Token counting (whitespace-word regex; SURVEY north-star text op). */
  def x1TokenStats(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      length(t).cast("long").as("n_chars_len"),
      TextOps.tokenCount(t).cast("long").as("n_tokens"),
      size(array_distinct(TextOps.tokens(t))).cast("long").as("n_uniq_tokens"),
      (length(regexp_replace(t, "\\s", "")).cast("double") / TextOps.tokenCount(t))
        .as("avg_tok_len"))
      .orderBy(col("doc_id"))
  }

  /** Language ID by stopword-marker hits, fixed-tiebreak argmax. */
  def x2LangId(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val hitCols = TextOps.langMarkers.map { case (lang, ms) =>
      TextOps.langHits(t, ms).cast("long").as(s"hits_$lang")
    }
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id") +: col("lang").as("labeled_lang") +: hitCols: _*)
    base.withColumn("predicted_lang", TextOps.predictedLang(l => col(s"hits_$l")))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: length/punct/digit/stopword ratios + linear score
    * (no transcendental functions — cross-engine exact).
    */
  /** THE canonical x3 scoring projection — feature counts + the
    * weighted quality formula, shared by x3 / c5 / c7 / x23 so the
    * bit-identical-doubles guarantee that makes their cross-engine
    * sort orders agree is STRUCTURAL, not enforced by four synchronized
    * comments. `keep` columns pass through alongside doc_id (c5/x23
    * carry source, c7 carries text).
    */
  private def qualityScored(docs: DataFrame, keep: Column*): DataFrame = {
    val t = col("text")
    docs.select(
        (col("doc_id") +: keep) ++ Seq(
          length(t).cast("long").as("n_chars_len"),
          TextOps.tokenCount(t).cast("long").as("n_tokens"),
          size(regexp_extract_all(t, lit("[.,!?;:]"), lit(0))).cast("long").as("punct_cnt"),
          size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast("long").as("digit_cnt"),
          TextOps.langHits(t, TextOps.langMarkers.head._2).cast("long").as("stop_cnt")): _*)
      // term order preserved exactly — the float arithmetic must match
      // the oracle bit-for-bit (ratio-column formulations are the same
      // expression tree after inlining)
      .withColumn("quality_score",
        col("stop_cnt").cast("double") / col("n_tokens") * 5.0
          - col("punct_cnt").cast("double") / col("n_chars_len") * 3.0
          - col("digit_cnt").cast("double") / col("n_chars_len") * 2.0
          + when(col("n_chars_len").between(100, 400), 0.5).otherwise(0.0))
  }

  def x3QualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScored(Tables(spark, dir, "documents"))
      .withColumn("punct_ratio", col("punct_cnt").cast("double") / col("n_chars_len"))
      .withColumn("digit_ratio", col("digit_cnt").cast("double") / col("n_chars_len"))
      .withColumn("stop_ratio", col("stop_cnt").cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))

  /** Document fingerprints: normalized sha256 + position-weighted rolling
    * hash.
    */
  def x4Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      TextOps.fingerprintSha(col("text")).as("fp_sha"),
      TextOps.rollingFingerprint(col("text")).as("fp_roll"))
      .orderBy(col("doc_id"))

  /** Embedding-cosine near-dup pairs (the dedup family's vector member),
    * IVF-style: each vector is assigned to a coarse-quantizer cell
    * (argmax dot against [[Similarity.coarseCell]]'s md5-seeded
    * centroids — a real computed quantizer, narrow projection, no
    * broadcast state), and pairs are generated only WITHIN a cell, then
    * verified with exact cosine. All-pairs across the corpus is quadratic
    * and dies at scale; blocking on the cell key turns it into a
    * hash-partitioned equi-join whose cost is sum(cell²) — the standard
    * IVF trade (boundary pairs split across cells are the recall cost).
    * Norms are precomputed per vector, never per pair.
    */
  def d7EmbeddingNeardup(spark: SparkSession, dir: String): DataFrame =
    embeddingNeardupPairs(spark, dir).orderBy(col("vec_a"), col("vec_b"))

  /** d7's pair generation without the presentation sort — reused by
    * [[d15SemanticDedup]] as the pair source for cluster resolution, and
    * PUBLIC as the library seam (the d12-style rule: a pipeline that
    * already has cosine pairs feeds [[Dedup.connectedComponents]]
    * directly; one that has embeddings starts here — either way the IVF
    * join runs once, never once per consumer).
    *
    * The cell count DERIVES from the corpus size
    * ([[Similarity.deriveCells]]: c ≈ √(n/dims), exact integer search
    * the SQL oracle re-derives) — a fixed count would make the
    * within-cell join quadratic at corpus scale, the same flaw
    * `derivePlanes` fixes for d13. `knownCount` skips the derivation
    * scan when the caller already knows the corpus size (table stats, a
    * prior action); the derivation is √-scaled, so a ~2x-off estimate
    * moves the cell count by at most ~√2 — same recall/cost band.
    */
  def embeddingNeardupPairs(spark: SparkSession, dir: String,
      knownCount: Option[Long] = None): DataFrame =
    neardupPairsOf(Tables(spark, dir, "embeddings"), knownCount)

  /** [[embeddingNeardupPairs]] over a caller-supplied embedding frame —
    * the seam c7 uses to mine pairs among its quality/exact-dedup
    * SURVIVORS only (the cell count then derives from the survivor
    * count, not the full corpus).
    */
  def neardupPairsOf(emb: DataFrame,
      knownCount: Option[Long] = None): DataFrame = {
    val spark = emb.sparkSession
    Similarity.ensure(spark)
    val cells = Similarity.deriveCells(
      knownCount.getOrElse(emb.count()), 64, minCells = ivfCells)
    // Persist (tracked) the celled+normed projection: both self-join
    // sides consume it, and without the persist the corpus is scanned —
    // and the nCentroids×dims argmax-dot cell assignment recomputed —
    // TWICE (once per side). Same pattern as d13's bucketed projection.
    val n = graft.core.Caches.persistTracked(
      emb.select(
        col("vec_id"),
        Similarity.coarseCell(col("embedding"), cells, 64).as("cell"),
        col("embedding"),
        Similarity.norm(col("embedding")).as("nrm")))
    val a = n.select(col("cell"), col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = n.select(col("cell").as("cb"), col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.hint("shuffle_hash")
      .join(b, col("cell") === col("cb") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (Similarity.dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos_sim"))
      .filter(col("cos_sim") >= semanticCosThreshold)
  }

  /** Incremental semantic dedup (d23): the EMBEDDING-side sibling of
    * d22, closing the incremental posture for the vector half of the
    * dedup family — d7/d15 re-bucket the ENTIRE corpus per session,
    * while a deployment keeps bucket assignments in the persisted ANN
    * index zone and dedups each arriving delta against all of history
    * by probing it ([[graft.operators.AnnIndexZone.incrementalPairs]]).
    * The zone is created with its plane count derived from the FULL
    * expected corpus size (capacity planning — d19/st19's rule, and
    * what makes the oracle's plane derivation reproducible), backfilled
    * over history (first 4/5 by vec_id), and the delta's pairs are
    * candidate-generated by same-bucket co-location then verified by
    * exact cosine ≥ 0.4 (d7's threshold) over candidate vectors only.
    */
  def d23IncrementalSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val total = graft.core.Tables.countOf(spark, dir, "embeddings")
    val cut = total * 4L / 5L
    val zone = graft.core.StagedLayouts.once(spark, s"d23zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d23zone")
      graft.operators.AnnIndexZone.create(spark, z, expectedCount = total): Unit
      graft.operators.AnnIndexZone.appendIndex(
        emb.filter(col("vec_id") < cut), z)
      z
    }
    graft.operators.AnnIndexZone.incrementalPairs(
        emb, emb.filter(col("vec_id") >= cut), zone,
        minCos = semanticCosThreshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Semantic (embedding-level) dedup DECISION: d7's IVF-celled cosine
    * pairs resolved into clusters with one canonical keeper — the
    * vector-side twin of d9, proving the pairs→components→keeper seam
    * ([[Dedup.connectedComponents]]) is pair-source-agnostic: the same
    * operator consumes shingle-Jaccard pairs (d9/d12), and here cosine
    * pairs, unchanged. Semantic near-dup is not transitive, so a chain
    * of (a,b),(b,c) pairs must collapse to ONE keeper before rows drop —
    * exactly what the min-label components deliver.
    *
    * Cost profile (profiled sf0.1, steady state ~1.6 s): ~0.9 s is the
    * IVF pair generation (shared with d7, plan pinned by PlanShapeSpec)
    * and the remainder is the CC fixpoint's materialization jobs —
    * pair checkpoint, initial labels, then one checkpoint + convergence
    * count per round (2 rounds on this fixture). Each job pays the
    * ~0.1 s local-mode floor, which is what a sub-second toy run cannot
    * avoid and a cluster run never notices; the per-round WORK (one
    * key-partitioned join + partial-aggregated min over the touched
    * subgraph) is the part that scales.
    */
  def d15SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = embeddingNeardupPairs(spark, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val vertices = Tables(spark, dir, "embeddings").select(col("vec_id").as("doc_id"))
    Dedup.connectedComponents(vertices, pairs)
      .select(col("doc_id").as("vec_id"), col("component"),
        col("cluster_size"), col("is_keeper"))
      .orderBy(col("vec_id"))
  }

  /** The production near-dup composition (judge round-1 #4): LSH
    * candidates verified by exact Jaccard, with the stop-shingle
    * document-frequency cap applied up front — see
    * [[Dedup.lshVerifiedPairs]].
    */
  def d8LshVerifiedDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Dedup.lshVerifiedPairs(
        docs, col("doc_id"), col("text"),
        n = 3, k = minhashK, bands = minhashBands,
        minJaccard = jaccardThreshold, maxDocFreq = stopShingleDf(docs))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** String cleaning (reference T8: strip prefix/suffix lists from
    * scraped links — `ideascale/extract_company_from_company_link.py`):
    * regex prefix strip + derived slug, pure codegen'd projection.
    */
  def x5StringClean(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), toks.as("toks"))
      .select(
        col("doc_id"),
        col("source"),
        regexp_replace(col("source"), "^src", "").cast("long").as("src_num"),
        concat(lit("provider_"),
          regexp_replace(col("source"), "^src", "").cast("long") % 5).as("provider"),
        array_join(slice(col("toks"), 1, 3), "-").as("slug"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal decode: image rows are REAL generated PNGs decoded by
    * the in-JDK javax.imageio reader (every 51st payload truncated →
    * decode_ok=false, NULL dims); audio rows are REAL PCM WAVs decoded
    * by the in-JDK javax.sound reader (id%34=0 truncated mid-data — the
    * header parses, the drain check must reject); only video rides the
    * deterministic stub codec — see [[Multimodal]]. The oracle
    * re-derives image dims and audio rate/frames arithmetically (pure
    * functions of doc_id by fixture construction) — a wrong decode or a
    * swallowed corrupt row breaks the hash.
    */
  def m1MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.asMedia(Tables(spark, dir, "documents")))
      .toDF()
      .orderBy(col("doc_id"))

  /** Real image preprocessing end-to-end: decode → aspect-fit
    * nearest-neighbor resize into 64×64 → re-encode → verify the target
    * dims by re-decoding, all per-partition ([[Multimodal.resizeTo]]).
    * Corrupt sources surface as resize_ok=false rows.
    */
  def m3ImageResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizeTo(
        Multimodal.asMedia(Tables(spark, dir, "documents")), box = 64)
      .toDF()
      .orderBy(col("doc_id"))

  /** Real PCM sample statistics (m4): the audio rows' WAV payloads
    * drained sample-by-sample — count, Σ|s|, max|s| and exact integer
    * energy Σs² ([[Multimodal.WavSampleStats]]). The oracle re-derives
    * the stats from the fixture's integer sample recurrence — the query
    * does strictly MORE work (a real decode) than the oracle's
    * arithmetic, same contract as m1/m3; truncated payloads must
    * surface as decode_ok=false with null stats, never partial sums.
    */
  def m4AudioStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioStats(
        Multimodal.asMedia(Tables(spark, dir, "documents")))
      .toDF()
      .orderBy(col("doc_id"))

  /** Perceptual image hashing (m5): every image row's REAL pixels
    * through [[Multimodal.PHash]] — content-level identity (same pixels
    * under different PNG encodings hash identically, where d1's md5
    * sees distinct bytes), Hamming-near under small perturbations, so
    * image near-dup rides d11's pigeonhole machinery unchanged. The
    * hash value is pixel-decode-derived, so no SQL oracle can re-derive
    * it (same posture as q29/q44's sketch bytes); the content-identity,
    * perturbation, and corrupt-payload contracts are pinned in
    * MultimodalSpec. Narrow plan: decode + hash per partition, no
    * shuffle.
    */
  def m5ImagePhash(spark: SparkSession, dir: String): DataFrame =
    Multimodal.phashImages(
        Multimodal.asMedia(Tables(spark, dir, "documents")))
      .toDF()
      .orderBy(col("doc_id"))

  /** Acoustic fingerprinting (m6): every audio row's REAL PCM sample
    * stream through [[Multimodal.AudioEnergyHash]] — a 60-bit
    * energy-delta fingerprint that is gain-invariant and Hamming-near
    * under local edits, so audio near-dup rides the same
    * [[Dedup.hammingPairs]] pigeonhole machinery as text (d11) and
    * images (d16). Unlike m5's pixel hashes the construction is
    * integer-exact end-to-end, so the oracle rebuilds every hash
    * bit-for-bit from the fixture's sample recurrence — a full
    * hash-match on a perceptual signature. Truncated payloads surface
    * as decode_ok=false with a null hash. Narrow plan, no shuffle.
    */
  def m6AudioFingerprint(spark: SparkSession, dir: String): DataFrame =
    Multimodal.fingerprintAudio(
        Multimodal.asMedia(Tables(spark, dir, "documents")))
      .toDF()
      .orderBy(col("doc_id"))

  /** Image near-dup pairs (d16): m5's perceptual hashes through the
    * SAME pigeonhole machinery as text SimHash (d11) — 64 bits in 4
    * chunks, exact-recall blocking for Hamming ≤ 3, codegen'd
    * xor/popcount verify, `shuffle_hash` self-join. The cross-modal
    * point: once a modality yields a Hamming-space signature, the
    * blocking layer is modality-blind. No SQL oracle (hash values are
    * pixel-decode-derived, m5's posture); pair-set correctness vs the
    * brute-force all-pairs formulation is pinned in MultimodalSpec.
    */
  def d16ImageNeardup(spark: SparkSession, dir: String): DataFrame = {
    val hashes = Multimodal.phashImages(
        Multimodal.asMedia(Tables(spark, dir, "documents")))
      .toDF()
      .filter(col("decode_ok"))
      .select(col("doc_id"), col("phash"))
    Dedup.hammingPairs(hashes, "phash", bits = 64, maxHamming = 3, chunks = 4)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The audio corpus as (doc_id, sig) fingerprint rows — m6's decode,
    * decode-failures dropped (no signature to index). Shared by d26 and
    * its streamed twin (st26) so the two derivations cannot drift.
    */
  private[graft] def audioSigs(docs: DataFrame): DataFrame =
    Multimodal.fingerprintAudio(Multimodal.asMedia(
        docs.select(col("doc_id"), col("text"))))
      .toDF()
      .filter(col("decode_ok"))
      .select(col("doc_id"), col("ahash").as("sig"))

  /** Incremental MULTIMODAL dedup (d26): the third modality family's
    * incremental posture — text has d22 (band zone), vectors d23 (SRP
    * index); audio/image Hamming signatures ran batch-only (d16, which
    * re-derives every signature per session — for media that means
    * RE-DECODING all of history per delta). Here history audio
    * fingerprints (m6's integer-exact 60-bit energy hash) live in a
    * persisted [[graft.operators.HammingZone]] (pigeonhole chunk rows
    * as the band analog, the full signature stored alongside), and a
    * delta dedups against all of history by probing stored chunks —
    * history bytes are never decoded again. Audio, not image, because
    * m6's hash is integer-exact end-to-end: the oracle rebuilds every
    * signature bit-for-bit and replays the all-pairs filter (pigeonhole
    * recall is exact, so zone-served pairs must equal it — d11's
    * oracle argument, now against a persisted zone).
    *
    * Scale shape: delta decode + chunking is narrow per-partition work;
    * the probe is one (c, v)-keyed shuffled hash join (delta builds);
    * verification reads stored signatures for candidates only.
    */
  def d26IncrementalAudioDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val cut = incrementalCut(spark, dir)
    val zones = graft.core.StagedLayouts.once(spark, s"d26zone|$dir") { () =>
      val z = graft.core.Scratch.dir("d26zone")
      graft.operators.HammingZone.build(spark,
        audioSigs(docs.filter(col("doc_id") < cut)), s"$z/ham",
        audioHammingBits, audioHammingMax, audioHammingChunks)
      z
    }
    graft.operators.HammingZone.incrementalPairs(
        audioSigs(docs.filter(col("doc_id") >= cut)), s"$zones/ham")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Frame sampling over decoded video rows (bounded lateral explode). */
  def m2FrameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.extractFeatures(
          Multimodal.asMedia(Tables(spark, dir, "documents"))))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Gopher-style repetition filtering (Rae et al. 2021 §A1.1): the
    * fraction of a document occupied by its most frequent 2-gram and the
    * duplicate-bigram mass. Pure per-document aggregation — one partial-
    * aggregated shuffle on (doc, bigram), one on doc — so the cost is one
    * pass over token pairs regardless of corpus size. Bigrams keep their
    * multiplicity here (repetition IS multiplicity), unlike the dedup
    * shingles which are per-doc distinct.
    */
  def x10Repetition(spark: SparkSession, dir: String): DataFrame = {
    val withToks = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val toks = col("toks")
    val grams = filter(
      transform(toks, (_, i) => array_join(slice(toks, i + 1, lit(2)), " ")),
      g => size(split(g, " ")) === 2)
    val perGram = withToks.select(col("doc_id"), explode(grams).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
    perGram.groupBy(col("doc_id"))
      .agg(
        max(col("cnt")).as("top_cnt"),
        sum(col("cnt")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"))
      .withColumn("top_bigram_frac",
        col("top_cnt").cast("double") / col("n_bigrams"))
      .withColumn("dup_bigram_frac",
        (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") / col("n_bigrams"))
      // Gopher's thresholds: flag documents a quality pipeline would drop.
      .withColumn("flagged",
        col("top_bigram_frac") > 0.18 || col("dup_bigram_frac") > 0.5)
      .select(col("doc_id"), col("top_cnt"), col("n_bigrams"),
        col("top_bigram_frac"), col("dup_bigram_frac"), col("flagged"))
      .orderBy(col("doc_id"))
  }

  /** Stratified deterministic sampling: per-stratum Bernoulli keep
    * decisions from a pure hash of the doc id — the data-mixing primitive
    * (downsample the dominant language, keep the rest) that must be
    * reproducible across runs, engines and cluster sizes. Zero shuffle:
    * the keep decision is a codegen'd projection + filter; rates ride a
    * CASE expression (a broadcast rate table at many strata).
    */
  def x11StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val perMille = when(col("lang") === "en", 100L).otherwise(500L)
    Tables(spark, dir, "documents")
      .withColumn("bucket",
        TextOps.h60(concat(lit("samp:"), col("doc_id").cast("string"))) % 1000)
      .filter(col("bucket") < perMille)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Exact-size per-stratum sampling: EXACTLY k documents from every
    * (lang, source) stratum, chosen by seeded-hash order — the balanced
    * eval-set / ablation-corpus construction step where "rate ≈ k/n"
    * ([[x11StratifiedSample]]) is not good enough because downstream
    * wants a fixed row count per cell.
    *
    * The naive formulation is `row_number() OVER (PARTITION BY stratum
    * ORDER BY hash)` — one corpus-sized exchange plus a FULL sort of
    * every stratum to keep k rows. Here a one-pass histogram over the
    * hash's top byte (≤ #strata × 256 rows) finds, per stratum, the
    * smallest byte-prefix cutoff whose cumulative count reaches k; only
    * rows at-or-below the cutoff enter the window. Because the byte is
    * the hash's most-significant bits, every global top-k-by-hash row
    * sorts at-or-below the cutoff, so the pruned window is provably
    * EXACT while its exchange+sort input shrinks to ~k + n/256 rows per
    * stratum (deeper prefixes extend the reduction; the histogram stays
    * metadata-sized either way). The corpus itself is scanned twice but
    * never fully shuffled — at 100 TB the scans are the cheap part, the
    * stratum sorts were the bottleneck. Pruned-vs-naive equality is
    * property-checked in GroupSampleSpec; the DuckDB oracle runs the
    * naive formulation.
    */
  def x20GroupSample(spark: SparkSession, dir: String): DataFrame =
    groupSampleTopK(Tables(spark, dir, "documents"), k = 5)

  /** Library seam for [[x20GroupSample]]: exact top-k-by-seeded-hash per
    * (lang, source) stratum with histogram-pruned window input.
    */
  def groupSampleTopK(docs: DataFrame, k: Int): DataFrame = {
    val strata = Seq(col("lang"), col("source"))
    val hk = TextOps.h60(concat(lit("gs:"), col("doc_id").cast("string")))
    val hashed = docs.select(col("doc_id"), col("lang"), col("source"))
      .withColumn("hk", hk)
      .withColumn("hb", shiftrightunsigned(col("hk"), 52).cast("int")) // top byte of h60
    // one partial-agg pass → ≤ #strata × 256 rows; everything below
    // this line until the broadcast join is metadata-sized
    val hist = hashed.groupBy(strata :+ col("hb"): _*).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(strata: _*).orderBy(col("hb"))
    val wAll = Window.partitionBy(strata: _*)
    val cut = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      // smallest byte whose cumulative count covers k (or the whole
      // stratum when n < k — then the cutoff is the stratum max and
      // nothing is pruned, correctly)
      .filter(col("cum") >= least(lit(k.toLong), col("n")))
      .groupBy(strata: _*).agg(min(col("hb")).as("hb_cut"))
    val rk = row_number().over(
      Window.partitionBy(strata: _*).orderBy(col("hk"), col("doc_id")))
    // NULL-SAFE stratum match: window partitioning groups null strata
    // like any other value, so the cutoff join must too — a plain
    // equi-join would silently drop null-lang/source rows the naive
    // formulation (and any SQL oracle) keeps
    val cutR = cut.withColumnRenamed("lang", "c_lang")
      .withColumnRenamed("source", "c_source")
    hashed.join(broadcast(cutR),
        col("lang") <=> col("c_lang") && col("source") <=> col("c_source"))
      .filter(col("hb") <= col("hb_cut"))
      .withColumn("rk", rk.cast("long"))
      .filter(col("rk") <= k)
      .select(col("lang"), col("source"), col("doc_id"), col("rk"))
      .orderBy(col("lang"), col("source"), col("rk"))
  }

  /** c2: the composed training-corpus pipeline — the round-8 "pieces
    * work together" proof for the text family, as ONE Catalyst plan
    * with a full DuckDB oracle: quality filter (x3's score formula,
    * IEEE-exact float ops so the threshold cut is bit-identical across
    * engines) → exact content dedup keeping the min doc id (d1's rule,
    * as a window min on one md5 exchange — no groupBy-and-join-back) →
    * deterministic hash split (x6's rule) → per-split corpus stats.
    * Scale shape: two codegen'd projections around a single
    * hash-partitioned exchange on the content hash, then a 3-group
    * aggregate; nothing corpus-sized moves twice.
    */
  def c2TrainingCorpus(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val scored = Tables(spark, dir, "documents")
      .select(col("doc_id"), t)
      .withColumn("n_chars_len", length(t).cast("long"))
      .withColumn("n_tokens", TextOps.tokenCount(t).cast("long"))
      // x3's formula verbatim — term order preserved so the float
      // arithmetic matches the oracle bit-for-bit
      .withColumn("score",
        (TextOps.langHits(t, TextOps.langMarkers.head._2).cast("long").cast("double")
            / col("n_tokens")) * 5.0
          - (size(regexp_extract_all(t, lit("[.,!?;:]"), lit(0))).cast("long").cast("double")
            / col("n_chars_len")) * 3.0
          - (size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast("long").cast("double")
            / col("n_chars_len")) * 2.0
          + when(col("n_chars_len").between(100, 400), 0.5).otherwise(0.0))
    val kept = scored.filter(col("score") > 0.0)
    val ded = kept
      .withColumn("keeper",
        min(col("doc_id")).over(Window.partitionBy(md5(t))))
      .filter(col("doc_id") === col("keeper"))
    val bucket = TextOps.h60(concat(lit("split:"), col("doc_id").cast("string"))) % 100
    ded
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars_len")).as("n_chars"))
      .orderBy(col("split"))
  }

  /** Dataset balancing / mixing: downsample every language to the
    * smallest language's size with deterministic hash sampling — the
    * data-mixing step that equalizes corpus composition before training.
    * Unlike [[x11StratifiedSample]]'s fixed rates, the per-stratum rates
    * are DERIVED from the data: a tiny per-language count table (one
    * partial-aggregated shuffle over ~#languages groups) crossed with
    * its own minimum, broadcast back onto the corpus — so the corpus
    * side stays one narrow filter pass and nothing corpus-sized
    * shuffles.
    */
  def x14DatasetMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val minN = counts.agg(min(col("n")).as("min_n"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("lang"), (col("min_n").cast("double") / col("n")).as("keep_rate"))
    docs.join(broadcast(rates), "lang")
      .filter(
        (TextOps.h60(concat(lit("mix:"), col("doc_id").cast("string"))) % 1000000).cast("double")
          < col("keep_rate") * 1000000.0)
      .select(col("doc_id"), col("lang"), col("keep_rate"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing for LLM pretraining: map every document to its
    * global token offset in the doc_id-ordered token stream and the
    * fixed-size training sequences (2048 tokens) it lands in — the
    * concat-and-chunk layout pretraining dataloaders consume.
    *
    * The global prefix sum is the scale problem: a single
    * `Window.orderBy(doc_id)` serializes the corpus through one task (the
    * q20 lesson). Two-phase instead: per-bucket cumulative sums under a
    * PARTITIONED window (parallel), bucket totals prefix-summed in a
    * second tiny window, then broadcast the bucket offsets back. Every
    * corpus-sized step is partition-local.
    *
    * The bucket COUNT is derived from the corpus size (one cheap
    * count()): ≈ max(shuffle partitions, √N), which bounds BOTH windows
    * at ~√N rows — the level-2 window never scales linearly with the
    * corpus (at 10B docs it sees ~100k rows, not 150M). Buckets are
    * RANGE partitions of doc_id (`repartitionByRange` + partition id),
    * not `doc_id div width`: range bounds come from sampling, so the
    * per-bucket row bound holds for ANY id distribution — sparse
    * snowflake-style 64-bit ids would break a width-based bucketing
    * (most docs collapsing into few buckets) but land balanced here.
    * Range partitioning keeps the bucket id monotone in doc_id, which is
    * what makes the two-level sum equal the global prefix sum; the exact
    * boundary placement doesn't affect the result, only the balance.
    */
  private[graft] def packBucketCount(n: Long, partitions: Int): Long =
    math.max(partitions.toLong, math.ceil(math.sqrt(n.toDouble)).toLong).max(1L)

  def x12SequencePack(spark: SparkSession, dir: String): DataFrame =
    sequencePack(Tables(spark, dir, "documents"))

  /** Library seam for [[x12SequencePack]]: pack a caller-supplied corpus.
    * `knownCount` skips the bucket-count derivation scan when the caller
    * already knows the corpus size (table stats, a prior action) — the
    * same seam as `Similarity.batchTopK`. The derivation is sqrt-scaled,
    * so an approximate count changes only bucket BALANCE, never the
    * packed offsets (bucket boundaries are a partitioning detail; the
    * two-level prefix sum is exact for any bucket count), making even a
    * ~2x-off estimate safe.
    */
  def sequencePack(docs: DataFrame, seqLen: Long = 2048L,
      knownCount: Option[Long] = None,
      tokensOf: Column => Column = TextOps.tokenCount(_).cast("long")): DataFrame = {
    // tokensOf: the per-document token pricer — whitespace-word counts
    // by default; c19 swaps in the trained-BPE literal chain (the count
    // a pretraining pipeline actually budgets). Still one narrow
    // codegen'd projection per doc either way — the packing's exchange
    // set does not depend on the pricer.
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val nBuckets = math.min(packBucketCount(knownCount.getOrElse(docs.count()),
      spark.conf.get("spark.sql.shuffle.partitions").toInt), Int.MaxValue.toLong).toInt
    // Both the per-bucket window and the bucket-totals aggregate consume
    // this; tracked persist so regex tokenization runs once (the cached
    // frame is 3 longs per doc — tiny next to the recompute) AND both
    // consumers see the same materialized bucket assignment.
    val toks = graft.core.Caches.persistTracked(
      docs.select(col("doc_id"), tokensOf(col("text")).as("n_tokens"))
        .repartitionByRange(nBuckets, col("doc_id"))
        .withColumn("bkt", spark_partition_id().cast("long")))
    val wLocal = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = toks.withColumn("local_off",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    val wBkt = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bktOff = toks.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("btot"))
      .withColumn("bkt_off", coalesce(sum(col("btot")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("bkt_off"))
    local.join(broadcast(bktOff), "bkt")
      .withColumn("start_off", col("bkt_off") + col("local_off"))
      .withColumn("seq_start", expr(s"start_off div $seqLen"))
      .withColumn("seq_end",
        when(col("n_tokens") === 0, expr(s"start_off div $seqLen"))
          .otherwise(expr(s"(start_off + n_tokens - 1) div $seqLen")))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        col("seq_start"), col("seq_end"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic integer k-means over the embeddings (d18) — the
    * partitional-clustering member of the similarity family (d15's
    * connected components are the transitive near-dup groups; this is
    * the fixed-k semantic partition for mixture weights and
    * per-cluster quotas). See [[graft.operators.Similarity.kmeans]]
    * for the exact-arithmetic design; the oracle replays the same
    * three Lloyd rounds as a generated CTE chain (the q58 discipline:
    * one loop bound feeds both engines, so iteration counts cannot
    * drift).
    */
  def d18Kmeans(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.kmeans(Tables(spark, dir, "embeddings"))

  /** Token-budget training-mix builder (c5): the data-mixing step every
    * pretraining pipeline runs after scoring — per source, keep the
    * highest-quality documents until that source's token budget is
    * spent, then report the mix. Composes x3's quality score (same
    * formula, bit-identical doubles) with x12's token counting and a
    * per-source greedy budget cut; the budget derives from the corpus
    * itself (half the mean per-source token mass), so the operator has
    * no magic numbers to drift from the oracle.
    *
    * Scale shape: scoring is a narrow codegen'd projection; the
    * selection is ONE exchange on source with a per-source
    * quality-ordered running-sum window (sources partition the corpus,
    * so the sort parallelizes across them — and a selection much
    * smaller than a giant source could bound it further with x20's
    * histogram prune at quality altitude); the budget is a scalar agg
    * (driver-side watermark-scale read). Greedy-prefix semantics:
    * a document is kept iff the running total INCLUDING it fits the
    * budget — deterministic under the (score desc, doc_id) total
    * order on both engines.
    */
  def c5TrainingMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = qualityScored(Tables(spark, dir, "documents"), col("source"))
    val scalars = docs
      .agg(sum(col("n_tokens")), countDistinct(col("source"))).head()
    // degenerate inputs make the mix legitimately empty rather than
    // crashing: an empty documents table nulls the sum (NPE at getLong)
    // and an all-NULL source column zeroes the distinct count (divide
    // by zero) — both take a budget no non-negative running sum meets
    val budget =
      if (scalars.isNullAt(0) || scalars.getLong(1) == 0L) -1L
      else scalars.getLong(0) / (2L * scalars.getLong(1))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= budget)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("mix_tokens"),
        min(col("quality_score")).as("cut_quality"))
      .orderBy(col("source"))
  }

  /** The FULL curation pipeline composed end-to-end (c7) — the sequence
    * a pretraining-data team actually runs, proving the decision-layer
    * operators COMPOSE rather than coexist:
    *
    *   1. quality scoring (x3's formula verbatim, bit-identical
    *      doubles) with the score>0 gate;
    *   2. exact dedup (md5 min-keeper — c2's stage);
    *   3. semantic dedup AMONG SURVIVORS: IVF-celled cosine pairs
    *      ([[neardupPairsOf]], cell count derived from the survivor
    *      count) resolved to connected components, min-id keeper only
    *      (d15's stage, survivor-scoped);
    *   4. k-means clustering of the keepers' embeddings
    *      ([[graft.operators.Similarity.kmeansAssign]], d18's
    *      operator) — the semantic partition;
    *   5. CLUSTER-quota'd token-budget mix: c5's greedy selection with
    *      clusters as the budget key (budget = kept token mass / 2 /
    *      #non-empty clusters, derived — no magic numbers), so no
    *      topic monopolizes the training mix;
    *   6. sequence packing of the selection ([[sequencePack]], x12's
    *      two-level prefix sum) into 2048-token training rows.
    *
    * Passage-level boilerplate removal (d17) is deliberately NOT
    * inlined: it REWRITES text rather than dropping rows, so its
    * natural position is a normalization pass over the INPUT corpus
    * (swap `Tables(...documents)` for `passageDedup(docs)` rebuilt to
    * text — the operator composes at the frame seam, proven standalone
    * by d17's own oracle); inlining it here would re-verify d17's
    * chunk-tiling oracle inside every downstream stage for no new
    * compositional claim.
    *
    * Output is PER-DOCUMENT (doc_id, cid, quality_score, n_tokens,
    * start_off, seq_start, seq_end) — the strongest hashable contract:
    * the DuckDB oracle replays every stage (closure, seeding, Lloyd,
    * budget window, prefix sum) and must match every row.
    *
    * Scale shape: each stage keeps its proven plan — narrow codegen'd
    * scoring; ONE corpus exchange for the md5 window; the pair join
    * hash-partitioned with a `shuffle_hash` hint (never a corpus
    * broadcast); the CC fixpoint touching only edge-touched vertices;
    * assignment with literal centroids (no join, no corpus exchange);
    * ONE cid-keyed exchange for the budget window; packing's two-level
    * √N-bounded windows. Stage boundaries hand off by doc_id-keyed
    * semi-join — keeper sets scale WITH the corpus, so the handoffs
    * are hash joins on the primary key (AQE upgrades them to broadcast
    * when a run's survivor set is small); each stage's output is
    * persistTracked so no stage recomputes per consumer. PlanShapeSpec
    * pins the exchange-key set to exactly {md5, doc_id, cid, bkt}.
    */
  def c7CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val scored = qualityScored(Tables(spark, dir, "documents"), col("text"))
      .filter(col("quality_score") > 0.0)
    // stage boundaries are persistTracked: each stage's output feeds
    // 2-3 downstream consumers (semi-joins, eager scalar aggs, the
    // final join-back), and without the persist Catalyst re-derives the
    // whole upstream pipeline — the md5 window re-ran FOUR times in the
    // unpersisted plan. The cached frames are the collapsed survivor
    // sets (small fractions of the corpus); release() reclaims them.
    val exact = graft.core.Caches.persistTracked(scored
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(md5(t))))
      .filter(col("doc_id") === col("keeper")).drop("keeper"))
    val emb = Tables(spark, dir, "embeddings")
    val survEmb = emb.join(
      exact.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val pairs = neardupPairsOf(survEmb)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val comp = Dedup.connectedComponents(exact.select(col("doc_id")), pairs)
    // the keeper id set is vertex-sized and feeds the rest of the
    // pipeline — localCheckpoint it (the fixpoint's own lineage
    // discipline) so the CC resolution tail computes once, not once
    // per downstream consumer
    val keepers = comp.filter(col("is_keeper"))
      .select(col("doc_id")).localCheckpoint()
    val kept = exact.join(keepers, Seq("doc_id"), "left_semi")
    val keptEmb = emb.join(
      kept.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val cids = Similarity.kmeansAssign(keptEmb)
      .select(col("vec_id").as("doc_id"), col("cid"))
    val clustered = graft.core.Caches.persistTracked(kept.join(cids, "doc_id"))
    val scalars = clustered
      .agg(sum(col("n_tokens")), countDistinct(col("cid"))).head()
    // a corpus where no document passes the quality gate fails earlier
    // with kmeans' readable empty-input error (c7 requires >= 1
    // surviving document by contract); clustered can therefore not be
    // empty here, but guard the null anyway so a future contract change
    // degrades to an empty mix instead of an NPE
    val budget =
      if (scalars.isNullAt(0)) -1L
      else scalars.getLong(0) / (2L * scalars.getLong(1))
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mixed = graft.core.Caches.persistTracked(
      clustered.withColumn("cum", sum(col("n_tokens")).over(w))
        .filter(col("cum") <= budget))
    sequencePack(mixed.select(col("doc_id"), col("text")))
      .join(mixed.select(col("doc_id"), col("cid"), col("quality_score")), "doc_id")
      .select(col("doc_id"), col("cid"), col("quality_score"), col("n_tokens"),
        col("start_off"), col("seq_start"), col("seq_end"))
      .orderBy(col("doc_id"))
  }

  /** Incremental curation (c8): c7's ADMISSION layer in the posture a
    * 100 TB deployment actually runs it — per-delta, against persisted
    * zones, never re-reading history. c7 proves the decision stages
    * compose as a batch rebuild; c8 proves the dedup gates run
    * incrementally: an arriving delta (the last 1/5 of the corpus) is
    * admitted or rejected per document using ONLY the delta plus two
    * history zones, with an auditable fate for every row:
    *
    *   1. quality gate — x3's formula verbatim, score>0 (c7's gate);
    *      failures are `low_quality`;
    *   2. exact dedup against the persisted md5 zone (d1's
    *      `(text_md5, keeper_id)` output stored as a table — history's
    *      content hashes at metadata size) AND within the gated delta
    *      (min-id window): a document whose md5 is already claimed by a
    *      smaller id is `exact_dup`, `dup_of` = that id;
    *   3. near-dup dedup against the persisted signature zone
    *      ([[graft.operators.SignatureZone.incrementalPairs]] — d22's
    *      operator, scoped to the exact-survivors): verified pairs
    *      resolve to connected components (c7's discipline; history
    *      endpoints ride along and, having smaller ids than every delta
    *      doc, dominate component minima), non-keepers are `near_dup`
    *      with `dup_of` = the component minimum;
    *   4. the rest are `kept`.
    *
    * Clustering / budget mix / packing are deliberately NOT re-run per
    * delta: they are corpus-level REFRESH decisions (quotas move when
    * the whole mix moves), not per-document admission — the boundary
    * every incremental curation deployment draws. The zones a real loop
    * would then append (survivor md5s + band rows) are maintained by
    * the streamed twins (st20, d1's exact zone via the st13 discipline)
    * rather than inside the query, which must stay re-runnable.
    *
    * Scale shape: scoring is a narrow codegen'd projection over the
    * DELTA; the md5 probe is one zone-keyed hash join (zone rows =
    * distinct history contents); the signature probe is d22's
    * band-keyed shuffled hash join; the CC fixpoint touches only
    * edge-touched vertices. History text is read per-CANDIDATE,
    * history bands per-probe — nothing rescans history.
    *
    * Output: (doc_id, fate, dup_of, quality_score) for EVERY delta
    * document, ordered by doc_id — the strongest hashable contract (the
    * oracle replays every stage, including the recursive closure).
    */
  def c8IncrementalCuration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val cut = incrementalCut(spark, dir)
    val zones = admissionHistZones(spark, dir, docs, cut)
    admissionDecisions(spark, docs,
      docs.filter(col("doc_id") >= cut), s"$zones/md5", s"$zones/sig")
  }

  /** c8's decision core, parameterized by the two history zones — shared
    * with `EventStream.streamAdmissionZones` (st21), which maintains the
    * same zones from a checkpointed stream, and with [[c9AdmissionLoop]],
    * which drives K successive deltas through it (hence `delta` is a
    * frame, not a cut: the loop's deltas are id RANGES). The md5 zone is
    * read through a min-per-md5 aggregate so an append-only streamed or
    * looped zone (duplicate or overlapping keeper rows from replayed or
    * successive batches) answers identically to the batch-built one —
    * the signature zone's structural-idempotency discipline applied to
    * the exact stage. `docs` supplies candidate TEXT for near-dup
    * verification (read per-candidate via semi-join, never scanned);
    * `delta` must expose `doc_id` and `text` and hold ids disjoint from
    * (in the admission timeline: above) everything the zones cover.
    */
  // selfCutOpt: the crash-replay self-exclusion threshold (min delta
  // doc_id), when the caller already computed it — the gate chain
  // otherwise re-runs the same 1-row agg per gate (text, semantic,
  // media), three driver round-trips per micro-batch for one scalar.
  // ordered: the trailing orderBy is for DIRECT query output (c8's
  // contract); per-batch fates writes re-read and re-order at the loop
  // end, so the intermediate range exchange + sort is pure overhead.
  private[graft] def admissionDecisions(spark: SparkSession, docs: DataFrame,
      delta: DataFrame, md5ZoneDir: String, sigZoneDir: String,
      calThresholds: Option[DataFrame] = None,
      selfCutOpt: Option[Long] = None,
      ordered: Boolean = true): DataFrame = {
    // The quality gate: raw score > 0 (c7's rule) by default, or — when
    // a calibration threshold table is supplied (c13) — the per-source
    // CALIBRATED gate: pass iff score >= the source's history threshold
    // (x23's systematic-bias fix wired into admission: raw score scales
    // differ by source, so a global raw threshold over-admits the
    // generous-scale source; the per-source threshold is REFRESH output
    // like c10's centroids — computed over history once, persisted,
    // joined in at admission). A source with no history threshold falls
    // back to the raw rule; a NULL score always fails (both rules).
    // The threshold table is #sources rows — broadcast by construction.
    val scoredCols = calThresholds.fold(Seq(col("text")))(_ =>
      Seq(col("source"), col("text")))
    val base = qualityScored(delta, scoredCols: _*)
    val withPass = calThresholds match {
      case None => base.withColumn("q_pass",
        coalesce(col("quality_score") > 0.0, lit(false)))
      case Some(cal) => base
        .join(broadcast(cal.select(col("source"), col("thr"))), Seq("source"), "left")
        .withColumn("q_pass", coalesce(
          when(col("thr").isNull, col("quality_score") > 0.0)
            .otherwise(col("quality_score") >= col("thr")),
          lit(false)))
    }
    // every fate consumer joins back to the scored delta; localCheckpoint
    // (eager, not a persist) so the regex feature extraction runs once
    // AND the lineage truncates — a persisted-but-untruncated plan nests
    // the whole scoring subtree into every downstream consumer, and the
    // round-18 JobProfile measured the decide's final checkpoint planning
    // 350+-node trees per micro-batch (driver planning/codegen over k-row
    // cached frames was the loop trio's single biggest cost). The frame
    // is delta-sized, so the checkpoint is bounded (the c9/CC rule).
    val scored =
      withPass.select(col("doc_id"), col("text"), col("quality_score"),
        col("q_pass")).localCheckpoint()
    val gated = scored.filter(col("q_pass"))
    // CRASH-REPLAY self-exclusion: foreachBatch is at-least-once, so a
    // replayed batch can re-decide AFTER its own feedback appends
    // landed — zone rows for THIS batch's ids would then act as
    // same-batch blockers (a non-kept doc's md5/band/bucket rows
    // changing a peer's fate — SemanticLoopSpec pins the divergence
    // this closes). The admission-timeline contract (zones cover
    // strictly smaller ids than the delta) makes the fix a SCALAR
    // threshold: ignore zone rows at or above the delta's minimum id.
    // One 1-row agg (the watermark altitude), pushed into the zone
    // scans — zero new exchanges, a no-op on clean zones.
    val selfCut: Long = selfCutOpt.getOrElse {
      val minRow = delta.agg(min(col("doc_id"))).head()
      if (minRow.isNullAt(0)) Long.MaxValue else minRow.getLong(0)
    }
    // exact stage: blocking id = min same-md5 id over history-zone
    // keepers and the gated delta (ids are globally unique, so the
    // least() is the global min-keeper rule c2/c7 apply, evaluated
    // without touching history text)
    // same truncation rule as `scored`: two consumers (survivors + the
    // final fate join), delta-sized, and its lineage would otherwise
    // nest the zone probe into the final plan
    val ex = (gated
      .withColumn("text_md5", md5(col("text")))
      .withColumn("delta_min",
        min(col("doc_id")).over(Window.partitionBy(col("text_md5"))))
      // the md5 zone holds per-doc HISTORY content rows (tombstones
      // subtracted by md5ZoneRead) — it scales with the corpus, so the
      // probe is a shuffled hash join (zone side builds), never a
      // broadcast; the min-agg collapses per-doc, replayed, and
      // batch-split rows alike into the min live keeper
      .join(Dedup.md5ZoneRead(spark, md5ZoneDir)
        .filter(col("keeper_id") < selfCut)
        .groupBy(col("text_md5")).agg(min(col("keeper_id")).as("hist_keeper"))
        .hint("shuffle_hash"), Seq("text_md5"), "left")
      .withColumn("exact_block",
        when(col("hist_keeper").isNull, col("delta_min"))
          .otherwise(least(col("hist_keeper"), col("delta_min"))))
      .select(col("doc_id"), col("text"), col("exact_block")))
      .localCheckpoint()
    val survivors = ex.filter(col("exact_block") === col("doc_id"))
    // three consumers (two vertex legs + the CC fixpoint's checkpoint)
    // would each re-run the zone probe and verify joins — materialize
    // the verified pair list once (pair-sized, tiny next to the work)
    // and TRUNCATE: the probe pipeline's ~100-node subtree must not
    // nest into the vertex legs and the final fate join
    val pairs =
      graft.operators.SignatureZone.incrementalPairs(
          docs, survivors.select(col("doc_id"), col("text")),
          sigZoneDir, jaccardThreshold, maxZoneDocId = Some(selfCut))
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
    val vertices = survivors.select(col("doc_id"))
      .union(pairs.select(col("doc_a").as("doc_id")))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    val comp = Dedup.connectedComponents(vertices, pairs)
      .select(col("doc_id"), col("component"))
    val pass = col("q_pass")
    val out = scored
      .join(ex.select(col("doc_id"), col("exact_block")), Seq("doc_id"), "left")
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(!pass, lit("low_quality"))
          .when(col("exact_block") < col("doc_id"), lit("exact_dup"))
          .when(col("component") < col("doc_id"), lit("near_dup"))
          .otherwise(lit("kept")).as("fate"),
        when(!pass, lit(null).cast("long"))
          .when(col("exact_block") < col("doc_id"), col("exact_block"))
          .when(col("component") < col("doc_id"), col("component"))
          .otherwise(lit(null).cast("long")).as("dup_of"),
        col("quality_score"))
    if (ordered) out.orderBy(col("doc_id")) else out
  }

  /** Capped incremental curation (c11): c8's admission decisions with
    * the near-dup gate running over the CAPPED shingle universe — the
    * zones are built with d24's df binding (`ShingleDfZone` over
    * history, `SignatureZone.buildCapped`), and
    * [[admissionDecisions]] needs NO change: cappedness is zone
    * GEOMETRY, so `incrementalPairs` reads the binding from meta and
    * drops hot shingles from the delta's banding and the verification
    * alike. This is the full-production posture: exact md5 gate +
    * df-capped signature gate + CC resolution per delta.
    */
  def c11AdmissionCapped(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val cut = incrementalCut(spark, dir)
    val cap = Dedup.deriveDocFreqCap(graft.core.Tables.countOf(spark, dir, "documents"))
    val zones = graft.core.StagedLayouts.once(spark, s"c11zones|$dir") { () =>
      val z = graft.core.Scratch.dir("c11zones")
      val hist = docs.filter(col("doc_id") < cut)
        .select(col("doc_id"), col("text"))
      Dedup.md5ZoneAppend(hist, col("text"), col("doc_id"), s"$z/md5")
      graft.operators.ShingleDfZone.create(spark, s"$z/df", shingleN)
      graft.operators.ShingleDfZone.append(hist, s"$z/df", batchId = 0L)
      graft.operators.SignatureZone.buildCapped(spark, hist, s"$z/sig",
        s"$z/df", cap, shingleN, minhashK, minhashBands)
      z
    }
    admissionDecisions(spark, docs,
      docs.filter(col("doc_id") >= cut), s"$zones/md5", s"$zones/sig")
  }

  /** Multi-delta admission loop (c9): the closed incremental-curation
    * loop a deployment actually runs — admit a delta, append its zone
    * rows, admit the NEXT delta against the grown zones. c8 proves one
    * delta decides correctly against static zones; c9 proves the
    * FEEDBACK EDGE: the corpus is split into an initial history slice
    * plus K=4 successive deltas (id-ordered fifths — ingest order), and
    * each round runs [[admissionDecisions]] against the zones AS LEFT
    * BY THE PREVIOUS ROUNDS, then appends the delta's own md5 minima
    * and band rows (st21's per-batch maintenance discipline, executed
    * here between decisions).
    *
    * Ordering is the whole point: each round's fates are MATERIALIZED
    * (written) before its zone appends run — Spark plans are lazy, so
    * an append-before-write would silently let a delta doc's own md5
    * block itself. Zone coverage stays INGESTED history (every prior
    * doc regardless of fate — the c8/st21 rule): duplicate-of-rejected
    * is still duplicate content.
    *
    * The DuckDB oracle replays all K rounds in one statement by slice-
    * tagging every stage (a doc's history = all docs in EARLIER slices,
    * its exact-dedup peers = gated docs in its OWN slice, its CC runs
    * per-slice) — so the green hash proves the looped zone state after
    * round k answers exactly like a batch computation over
    * corpus-through-k, fate for fate. A spec additionally pins the zone
    * EQUIVALENCE directly: the band table left by the loop equals
    * `SignatureZone.build` over the full corpus (append is associative
    * over slices), and the min-aggregated md5 zone equals d1's
    * exactByContent over the full corpus.
    *
    * Scale shape: per round, everything admissionDecisions pins (delta-
    * sized scoring, zone-keyed probes, candidate-sized verification) —
    * per-delta cost grows only with band collisions against history,
    * never with history size; the loop itself is driver-side
    * orchestration over K plans, never over rows.
    *
    * Output: (doc_id, round, fate, dup_of, quality_score) for every doc
    * in every delta, ordered by doc_id.
    */
  def c9AdmissionLoop(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val n = graft.core.Tables.countOf(spark, dir, "documents")
    // integer-exact fifths, the incrementalCut discipline: slice k of
    // 0..4 spans [n*k/5, n*(k+1)/5) — slice 0 is the initial history
    val bounds = (1 to 4).map(k => n * k / 5L)
    // Staged = the state a deployment already HAS when the final delta
    // arrives: rounds 0..2 decided and fed back, zones covering slices
    // 0..3. The FINAL delta's decision round deliberately stays OUT of
    // the staging closure and runs live on every call — it is the
    // per-delta admission serve cost this query prices (staging the
    // whole loop would leave the timed run measuring only a parquet
    // read-back of the fates — the round-12 verdict's accounting bug).
    val z = graft.core.StagedLayouts.once(spark, s"c9|$dir") { () =>
      val root = graft.core.Scratch.dir("c9loop")
      val hist0 = docs.filter(col("doc_id") < bounds(0))
      Dedup.md5ZoneAppend(hist0, col("text"), col("doc_id"), s"$root/md5")
      graft.operators.SignatureZone.build(spark,
        hist0.select(col("doc_id"), col("text")), s"$root/sig",
        shingleN, minhashK, minhashBands)
      for (k <- 0 until 3) {
        val delta = docs.filter(col("doc_id") >= bounds(k) &&
            col("doc_id") < bounds(k + 1))
          .select(col("doc_id"), col("text"))
        // decide FIRST (the write is the action — fates materialize
        // against zones that do not yet contain this delta)...
        admissionDecisions(spark, docs, delta, s"$root/md5", s"$root/sig",
            ordered = false) // re-read + globally ordered at the end
          .write.parquet(s"$root/fates/round=$k")
        // ...then feed back: the delta joins ingested history
        graft.operators.SignatureZone.append(delta, s"$root/sig")
        Dedup.md5ZoneAppend(delta, col("text"), col("doc_id"), s"$root/md5")
        // each round's tracked persists (scored delta, pair list, ...)
        // are dead once its fates are on disk — release before the next
        // round so K rounds hold one round's working set, not K
        graft.core.Caches.release()
      }
      root
    }
    // the timed part: round 3's decisions against the staged zones —
    // real per-delta work (delta-sized scoring, two zone probes,
    // candidate-sized verification, the CC fixpoint), exactly what a
    // deployment pays per arriving batch. Round 3 is the loop's last,
    // so no feedback append follows it and re-running is side-effect
    // free (the query stays re-runnable, the registry contract).
    val last = admissionDecisions(spark, docs,
        docs.filter(col("doc_id") >= bounds(3))
          .select(col("doc_id"), col("text")),
        s"$z/md5", s"$z/sig", ordered = false) // the union's trailing
      .withColumn("round", lit(3L))            // orderBy sorts the output
      .select(col("doc_id"), col("round"), col("fate"), col("dup_of"),
        col("quality_score"))
    spark.read.parquet(s"$z/fates")
      .select(col("doc_id"), col("round").cast("long").as("round"),
        col("fate"), col("dup_of"), col("quality_score"))
      .unionByName(last)
      .orderBy(col("doc_id"))
  }

  /** Incremental cluster assignment at admission (c10): the piece that
    * lets the mix quotas move per delta without a corpus-level
    * re-cluster — c8 defers ALL clustering to corpus refresh; here the
    * kept delta documents are assigned to the PERSISTED centroids of
    * the last refresh (d18's Lloyd fit over history, saved once as a
    * k-row zone — [[graft.operators.Similarity.saveCentroids]]) via
    * the literal-centroid codegen'd projection
    * ([[graft.operators.Similarity.assignToCentroids]]): zero shuffle,
    * zero history reads, one narrow pass over the admitted delta.
    *
    * The oracle replays BOTH halves exactly: c8's admission chain
    * (kept = quality-gated, exact-survivor, component-minimum docs)
    * and the integer Lloyd chain over history embeddings, then assigns
    * kept docs to the final-round centroids (argmin with the lower-cid
    * tiebreak — the same rule the assignment rounds use).
    *
    * Output: (doc_id, cid, dist) for every admitted (kept) delta doc.
    */
  /** The DOCS-cut admission pair's shared staged layout (c8/c13 —
    * cut = 4/5 of the documents count): the two text zones plus the
    * calibration REFRESH output over the same history slice, staged
    * once instead of per-query (the c8zones/c13zones builds were
    * identical modulo the threshold table — round-16 verdict #1b's
    * fixture-sharing ask). c8 probes md5/sig only; c13 adds cal.
    */
  private def admissionHistZones(spark: SparkSession, dir: String,
      docs: DataFrame, cut: Long): String =
    graft.core.StagedLayouts.once(spark, s"cAdmHistZones|$dir") { () =>
      val z = graft.core.Scratch.dir("cAdmHistZones")
      val hist = docs.filter(col("doc_id") < cut)
        .select(col("doc_id"), col("source"), col("text"))
      // three independent layouts in disjoint dirs — concurrent (§2.6)
      graft.core.Par.run(
        () => Dedup.md5ZoneAppend(hist, col("text"), col("doc_id"), s"$z/md5"),
        () => graft.operators.SignatureZone.build(spark,
          hist.select(col("doc_id"), col("text")), s"$z/sig",
          shingleN, minhashK, minhashBands),
        // the calibration REFRESH: per-source thresholds persisted once
        () => calibrationThresholds(hist).write.parquet(s"$z/cal"))
      z
    }

  /** The EMBEDDED-window admission family's shared staged layout
    * (c10/c12/c14/c17/c19 — every composition whose cut is 4/5 of the
    * embeddings count): the two text zones, the ANN index, the Hamming
    * media zone, and the persisted centroid REFRESH output, all over
    * the SAME history slice. One superset staging instead of three
    * near-identical ones (c10zones/c12zones/c17zones each rebuilt
    * md5+sig over the same rows — round-16 verdict #1b's
    * fixture-sharing ask): a deployment has ONE zone set per corpus,
    * not one per query, and a bench session uses every member anyway.
    * Each query still reads only the zones its gates probe.
    */
  private def admissionClusterZones(spark: SparkSession, dir: String,
      docs: DataFrame, emb: DataFrame, cut: Long): String =
    graft.core.StagedLayouts.once(spark, s"cAdmEmbZones|$dir") { () =>
      val z = graft.core.Scratch.dir("cAdmEmbZones")
      val hist = docs.filter(col("doc_id") < cut)
        .select(col("doc_id"), col("text"))
      // five independent layouts in disjoint dirs — concurrent (§2.6):
      // the shingle/minhash build, the audio decode, and the Lloyd fit
      // are each other's back-fill
      graft.core.Par.run(
        () => Dedup.md5ZoneAppend(hist, col("text"), col("doc_id"), s"$z/md5"),
        () => graft.operators.SignatureZone.build(spark, hist, s"$z/sig",
          shingleN, minhashK, minhashBands),
        () => {
          // plane count fixed from the FULL expected corpus (capacity
          // planning — d19/d23's rule, and what the oracle re-derives)
          graft.operators.AnnIndexZone.create(spark, s"$z/ann",
            expectedCount = emb.count()): Unit
          graft.operators.AnnIndexZone.appendIndex(
            emb.filter(col("vec_id") < cut), s"$z/ann")
        },
        // the media zone: history audio decoded ONCE at build time
        () => graft.operators.HammingZone.build(spark, audioSigs(hist), s"$z/ham",
          audioHammingBits, audioHammingMax, audioHammingChunks),
        // the centroid zone is REFRESH output — fitted over the history
        // vectors once, persisted, read back as literals (k·dims longs)
        () => Similarity.saveCentroids(spark,
          Similarity.kmeansFit(emb.filter(col("vec_id") < cut)), s"$z/cents"))
      z
    }

  def c10AdmissionClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    // the admission window is the EMBEDDED sub-corpus (cut = 4/5 of the
    // embeddings count, delta capped at the embedded range): embeddings
    // cover a PREFIX of the documents at some SFs, and a documents-based
    // cut would leave the delta vector-less — a vacuous assignment
    val embTotal = graft.core.Tables.countOf(spark, dir, "embeddings")
    val cut = embTotal * 4L / 5L
    val zones = admissionClusterZones(spark, dir, docs, emb, cut)
    // ordered=false: the fates are an intermediate here (kept-filter →
    // semi-join); the query's own trailing orderBy sorts the output
    val kept = admissionDecisions(spark, docs,
        docs.filter(col("doc_id") >= cut && col("doc_id") < embTotal),
        s"$zones/md5", s"$zones/sig", ordered = false)
      .filter(col("fate") === "kept")
      .select(col("doc_id").as("vec_id"))
    Similarity.assignToCentroids(
        emb.join(kept, Seq("vec_id"), "left_semi"),
        Similarity.loadCentroids(spark, s"$zones/cents"))
      .select(col("vec_id").as("doc_id"), col("cid"), col("dist"))
      .orderBy(col("doc_id"))
  }

  /** Admission-to-training-shard tail (c14): the piece between
    * per-delta admission (c8-c13 end at fates) and the training
    * dataloader — c7's tail (cluster-quota'd token-budget mix →
    * sequence packing) executed INCREMENTALLY per delta, so each
    * arriving batch lands as a packed shard without a corpus-level
    * pipeline re-run:
    *
    *   1. admit the delta (c8's gates against the persisted zones);
    *   2. assign the kept docs to the PERSISTED centroids of the last
    *      refresh (c10's literal-centroid codegen'd projection — zero
    *      shuffle, no Lloyd re-run);
    *   3. per-CLUSTER token-budget cut over the delta's kept mass
    *      (c7's greedy rule applied to the batch: budget = kept tokens
    *      / 2 / #non-empty clusters — each batch fills its own quota,
    *      so no topic monopolizes the shard);
    *   4. sequence-pack the selection (x12's two-level √N prefix sum)
    *      into 2048-token training rows — the delta's shard.
    *
    * The oracle replays every stage per document: the admission chain
    * (recursive closure included), the integer Lloyd chain over history
    * embeddings, the quantized argmin assignment, the per-cluster
    * budget window, and the global prefix sum — c7's per-document
    * contract scoped to the delta.
    *
    * Scale shape: admission as c8 pins it; assignment is a narrow
    * projection; ONE cid-keyed exchange for the budget window; ONE
    * doc_id range exchange + √N-bounded windows for packing
    * (PlanShapeSpec pins the exchange-key set).
    */
  def c14AdmissionShard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    val embTotal = graft.core.Tables.countOf(spark, dir, "embeddings")
    val cut = embTotal * 4L / 5L
    val zones = admissionClusterZones(spark, dir, docs, emb, cut)
    // localCheckpoint, NOT a cache: the kept set feeds four consumers
    // (assignment semi-join, the token join, the budget scalar, the
    // final join-back), and a cached plan still NESTS the full
    // admission subtree in every one — the per-action formatted-explain
    // pass goes super-linear on that replication (the c12/c9 lineage-
    // truncation rule; the frame is kept-delta-sized, so the
    // checkpoint is bounded)
    // ordered=false: the fates are an intermediate (checkpointed, then
    // semi-joined); the tail's trailing orderBy sorts the output
    val kept = admissionDecisions(spark, docs,
        docs.filter(col("doc_id") >= cut && col("doc_id") < embTotal),
        s"$zones/md5", s"$zones/sig", ordered = false)
      .filter(col("fate") === "kept")
      .select(col("doc_id"), col("quality_score"))
      .localCheckpoint()
    val cids = Similarity.assignToCentroids(
        emb.join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
        Similarity.loadCentroids(spark, s"$zones/cents"))
      .select(col("vec_id").as("doc_id"), col("cid"))
    admissionShardTail(docs, kept, cids)
  }

  /** The shard tail priced in TRAINED-BPE tokens (c19) — closing the
    * round-16 gap where the production tail budgeted in whitespace
    * tokens while c18 computed the BPE counts a real pretraining
    * pipeline budgets with. Identical pipeline to [[c14AdmissionShard]]
    * — admit the delta against the persisted zones, assign kept docs to
    * the persisted centroids, per-cluster budget cut, sequence-pack —
    * but EVERY token number (the budget scalar, the quota window's
    * running sums, and the packing offsets) is the document's token
    * count under the trained merge table, not its whitespace word
    * count.
    *
    * The merge table is REFRESH output like the centroids it rides
    * beside: trained over the SAME history slice (docs below the
    * admission cut — [[stagedBpeMerges]] with `filterTo`), persisted as
    * a k-row zone, loaded back as literals. The encode therefore stays
    * JOIN-FREE inside the tail — tokensOf is a codegen'd literal
    * replace chain in the same projection that previously held the
    * whitespace regex, so the tail's exchange set is EXACTLY c14's
    * (ONE cid exchange for the budget window, ONE doc_id range
    * exchange for packing — PlanShapeSpec pins both).
    *
    * The oracle prepends the BPE training CTEs over the history slice
    * and swaps the chain into c14's `cl` token column — a green hash
    * proves budget cut, quota, and offsets all moved together to the
    * learned pricing.
    */
  def c19BpeShardTail(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    val embTotal = graft.core.Tables.countOf(spark, dir, "embeddings")
    val cut = embTotal * 4L / 5L
    val zones = admissionClusterZones(spark, dir, docs, emb, cut)
    val merges = stagedBpeMerges(spark, dir, filterTo = Some(cut))
    // ordered=false: intermediate fates, the tail re-orders (c14's rule)
    val kept = admissionDecisions(spark, docs,
        docs.filter(col("doc_id") >= cut && col("doc_id") < embTotal),
        s"$zones/md5", s"$zones/sig", ordered = false)
      .filter(col("fate") === "kept")
      .select(col("doc_id"), col("quality_score"))
      .localCheckpoint()
    val cids = Similarity.assignToCentroids(
        emb.join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
        Similarity.loadCentroids(spark, s"$zones/cents"))
      .select(col("vec_id").as("doc_id"), col("cid"))
    admissionShardTail(docs, kept, cids, tokensOf = bpeDocTokens(_, merges))
  }

  /** c14's budget-cut + packing tail, factored out so the batch
    * posture (c14) and st29's per-micro-batch production loop run the
    * SAME code and cannot drift (the c15 `hybridRetrievalTail` rule):
    * per-cluster greedy token-budget cut over the kept delta (budget =
    * kept tokens / 2 / #non-empty clusters — each batch fills its own
    * quota), then x12's two-level √N sequence packing of the
    * selection into 2048-token training rows. `kept` must expose
    * `(doc_id, quality_score)` (lineage-truncated by the caller),
    * `cids` `(doc_id, cid)`. Output one row per SELECTED document:
    * `(doc_id, cid, quality_score, n_tokens, start_off, seq_start,
    * seq_end)`.
    *
    * Scale shape: ONE cid-keyed exchange for the budget window; ONE
    * doc_id range exchange + √N-bounded windows for packing
    * (PlanShapeSpec pins the exchange-key set via c14).
    */
  private[graft] def admissionShardTail(docs: DataFrame, kept: DataFrame,
      cids: DataFrame,
      tokensOf: Column => Column = TextOps.tokenCount(_).cast("long")): DataFrame = {
    // tokensOf prices BOTH the per-cluster budget cut and the packing
    // (threaded into sequencePack) from ONE definition, so the two
    // halves of the tail cannot budget in different units — c19 swaps
    // in the trained-BPE chain here.
    // the clustered kept-delta table feeds the budget scalar, the
    // quota window, and the final join-back — persist once (c7's
    // stage-boundary discipline; it is kept-delta-sized)
    val cl = graft.core.Caches.persistTracked(kept
      .join(docs.select(col("doc_id"),
        tokensOf(col("text")).as("n_tokens")), "doc_id")
      .join(cids, "doc_id"))
    val scalars = cl.agg(sum(col("n_tokens")), countDistinct(col("cid"))).head()
    // an all-rejected delta degrades to an empty shard, not an NPE
    val budget =
      if (scalars.isNullAt(0) || scalars.getLong(1) == 0L) -1L
      else scalars.getLong(0) / (2L * scalars.getLong(1))
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mixed = graft.core.Caches.persistTracked(
      cl.withColumn("cum", sum(col("n_tokens")).over(w))
        .filter(col("cum") <= budget))
    sequencePack(docs.join(mixed.select(col("doc_id")), Seq("doc_id"), "left_semi"),
        tokensOf = tokensOf)
      .join(mixed.select(col("doc_id"), col("cid"), col("quality_score")), "doc_id")
      .select(col("doc_id"), col("cid"), col("quality_score"), col("n_tokens"),
        col("start_off"), col("seq_start"), col("seq_end"))
      .orderBy(col("doc_id"))
  }

  /** Semantic admission gate (c12): c8's admission with a THIRD dedup
    * gate — documents that survive the quality, exact-md5, and text
    * near-dup stages are additionally deduped at the EMBEDDING level
    * against the persisted ANN index zone (d23's incremental posture
    * wired into admission, the verdict's "second near-dup gate").
    * Paraphrases and translations share no shingles, so the text gates
    * cannot see them; their vectors co-locate in SRP buckets, which is
    * exactly the history structure the ANN zone stores.
    *
    * Stage order is a cost argument, not a preference: the text gates
    * are cheaper per candidate (md5 equality, then shingle overlap on
    * band collisions) and remove the bulk of duplication, so the vector
    * gate — whose verification reads candidate embeddings — runs over
    * the smallest possible survivor set. Semantic near-dup is not
    * transitive, so survivor pairs resolve through the same
    * connected-components discipline as the text stage; history
    * endpoints (smaller ids) dominate component minima, making
    * `dup_of` point at the oldest semantically-equivalent document.
    *
    * The admission window is the EMBEDDED sub-corpus (c10's rule): the
    * gate needs delta vectors, and a documents-based cut would leave it
    * vacuously empty at SFs where embeddings cover only a prefix.
    *
    * Scale shape: the zone probe is [[graft.operators.AnnIndexZone
    * .incrementalPairs]] — delta buckets are a narrow codegen'd
    * projection, the probe joins bucket-keyed shuffled-hash (zone rows
    * = history vectors, never broadcast), and exact-cosine verification
    * touches candidate vectors only via semi-join. Per-delta cost is
    * ∝ delta + bucket collisions, never history size — the same bound
    * as the text zones, now for the vector modality.
    *
    * Output: (doc_id, fate ∈ {low_quality, exact_dup, near_dup,
    * semantic_dup, kept}, dup_of, quality_score) for every delta doc.
    */
  def c12AdmissionSemantic(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    val embTotal = graft.core.Tables.countOf(spark, dir, "embeddings")
    val cut = embTotal * 4L / 5L
    val zones = admissionClusterZones(spark, dir, docs, emb, cut)
    semanticAdmissionDecisions(spark, docs, emb,
      docs.filter(col("doc_id") >= cut && col("doc_id") < embTotal),
      s"$zones/md5", s"$zones/sig", s"$zones/ann")
  }

  /** c12's decision core, parameterized by the THREE history zones —
    * shared with `EventStream.streamSemanticZones` (st24), which
    * maintains the same zones from one checkpointed stream. The same
    * contract as [[admissionDecisions]] plus: `emb` supplies candidate
    * VECTORS for semantic verification (read per-candidate via
    * semi-join, never scanned), and every delta doc must be inside the
    * embedded range (the caller's window rule). `calThresholds`
    * threads the c13 per-source calibrated quality gate through
    * unchanged (st29's production loop supplies it; when given, the
    * delta must expose `source`).
    */
  private[graft] def semanticAdmissionDecisions(spark: SparkSession,
      docs: DataFrame, emb: DataFrame, delta: DataFrame,
      md5ZoneDir: String, sigZoneDir: String, annZoneDir: String,
      calThresholds: Option[DataFrame] = None,
      selfCutOpt: Option[Long] = None,
      ordered: Boolean = true): DataFrame = {
    // the self-exclusion scalar is shared by every gate — compute it
    // once here when the caller didn't already (admissionDecisions'
    // selfCutOpt scaladoc)
    val selfCut: Long = selfCutOpt.getOrElse {
      val minRow = delta.agg(min(col("doc_id"))).head()
      if (minRow.isNullAt(0)) Long.MaxValue else minRow.getLong(0)
    }
    // text-stage fates feed two consumers (kept filter + final join) AND
    // sit under the whole vector-gate lineage — localCheckpoint (not a
    // cache) because a cached plan still NESTS the full admission
    // subtree in every consumer, and the per-action formatted-explain
    // pass goes super-linear on that replication (the c9/CC lineage-
    // truncation rule; the frame is delta-sized, so the checkpoint is
    // bounded)
    // the nested text-gate call is never this function's direct output
    // (checkpointed, re-joined, re-ordered below) — ordered=false skips
    // its intermediate range exchange + sort
    val fates = admissionDecisions(spark, docs, delta, md5ZoneDir, sigZoneDir,
        calThresholds, selfCutOpt = Some(selfCut), ordered = false)
      .localCheckpoint()
    val keptIds = fates.filter(col("fate") === "kept")
      .select(col("doc_id").as("vec_id"))
    // the same crash-replay self-exclusion threshold as the text gates
    // (admissionDecisions' scaladoc): the vector gate's probe delta is
    // the KEPT subset, so without the cut a replayed batch's NON-kept
    // vectors — already in the index from the pre-crash appends — would
    // become same-batch semantic blockers the clean timeline never saw
    // the vector gate probes the zone with KEPT survivors only
    // materialize + truncate (the admissionDecisions `pairs` rule): the
    // ANN probe's subtree must not nest into the vertex legs / fate join
    val pairs =
      graft.operators.AnnIndexZone.incrementalPairs(
          emb, emb.join(keptIds, Seq("vec_id"), "left_semi"),
          annZoneDir, minCos = semanticCosThreshold,
          maxZoneVecId = Some(selfCut))
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        .localCheckpoint()
    val vertices = keptIds.select(col("vec_id").as("doc_id"))
      .union(pairs.select(col("doc_a").as("doc_id")))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    val comp = Dedup.connectedComponents(vertices, pairs)
      .select(col("doc_id"), col("component").as("sem_component"))
    val out = fates
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("fate") === "kept" && col("sem_component") < col("doc_id"),
          lit("semantic_dup")).otherwise(col("fate")).as("fate"),
        when(col("fate") === "kept" && col("sem_component") < col("doc_id"),
          col("sem_component")).otherwise(col("dup_of")).as("dup_of"),
        col("quality_score"))
    if (ordered) out.orderBy(col("doc_id")) else out
  }

  /** Media admission gate (c17): c12's admission with the FOURTH dedup
    * modality wired in — documents that survive quality, exact-md5,
    * text near-dup, AND vector semantic-dup still pass their MEDIA
    * signatures through the persisted Hamming zone (d26's
    * [[graft.operators.HammingZone]] over m6's integer-exact audio
    * fingerprints): a kept survivor Hamming-near history audio or
    * another survivor resolves through the same connected-components
    * pass to a `media_dup` fate. Audio (not image) because m6's hash
    * is integer-exact end-to-end, so the oracle rebuilds every
    * signature bit-for-bit and the fate chain stays hash-comparable —
    * the cross-modal point of d16/d26 carried into admission: once a
    * modality yields a Hamming signature, the gate is modality-blind.
    *
    * Scale shape: everything c12 pins, plus — the media gate DECODES
    * ONLY the kept survivors' payloads (delta-kept-sized; history
    * media is never re-decoded — its signatures live in the zone), the
    * probe is one (c, v)-keyed shuffled-hash join with the survivor
    * side building, and verification touches stored signatures for
    * candidate docs only.
    */
  def c17AdmissionMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    val embTotal = graft.core.Tables.countOf(spark, dir, "embeddings")
    val cut = embTotal * 4L / 5L
    val zones = admissionClusterZones(spark, dir, docs, emb, cut)
    mediaAdmissionDecisions(spark, docs, emb,
      docs.filter(col("doc_id") >= cut && col("doc_id") < embTotal),
      s"$zones/md5", s"$zones/sig", s"$zones/ann", s"$zones/ham")
  }

  /** c17's decision core: [[semanticAdmissionDecisions]]' fates with
    * the media gate appended — kept survivors' audio fingerprints
    * (decoded here survivor-only, unless the caller already decoded
    * the batch at ingest and passes `deltaSigs` — st31's reuse seam)
    * probe the Hamming zone; verified pairs resolve through the same
    * CC minimum. The zone must cover strictly smaller ids than the
    * delta (the admission-timeline contract); the media probe
    * self-excludes at the delta's minimum id like every other gate
    * (a no-op on clean zones, crash-replay soundness on looped ones).
    */
  private[graft] def mediaAdmissionDecisions(spark: SparkSession,
      docs: DataFrame, emb: DataFrame, delta: DataFrame,
      md5ZoneDir: String, sigZoneDir: String, annZoneDir: String,
      hamZoneDir: String,
      calThresholds: Option[DataFrame] = None,
      deltaSigs: Option[DataFrame] = None,
      selfCutOpt: Option[Long] = None,
      ordered: Boolean = true): DataFrame = {
    // the shared self-exclusion scalar, computed once for all gates
    val selfCut: Long = selfCutOpt.getOrElse {
      val minRow = delta.agg(min(col("doc_id"))).head()
      if (minRow.isNullAt(0)) Long.MaxValue else minRow.getLong(0)
    }
    // four-gate fates feed the kept filter and the final join — the
    // c12 lineage-truncation rule (a cached plan would nest the full
    // admission subtree in every consumer); never this function's
    // direct output, so ordered=false
    val fates = semanticAdmissionDecisions(spark, docs, emb, delta,
        md5ZoneDir, sigZoneDir, annZoneDir, calThresholds,
        selfCutOpt = Some(selfCut), ordered = false)
      .localCheckpoint()
    val keptIds = fates.filter(col("fate") === "kept").select(col("doc_id"))
    // decode ONLY the survivors' media — the zone answers for history
    val keptSigs = deltaSigs
      .getOrElse(audioSigs(docs.join(keptIds, Seq("doc_id"), "left_semi")))
      .join(keptIds, Seq("doc_id"), "left_semi")
    // materialize + truncate (the admissionDecisions `pairs` rule)
    val pairs =
      graft.operators.HammingZone.incrementalPairs(keptSigs, hamZoneDir,
          maxZoneDocId = Some(selfCut))
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
    val vertices = keptIds
      .union(pairs.select(col("doc_a").as("doc_id")))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    val comp = Dedup.connectedComponents(vertices, pairs)
      .select(col("doc_id"), col("component").as("med_component"))
    val out = fates
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("fate") === "kept" && col("med_component") < col("doc_id"),
          lit("media_dup")).otherwise(col("fate")).as("fate"),
        when(col("fate") === "kept" && col("med_component") < col("doc_id"),
          col("med_component")).otherwise(col("dup_of")).as("dup_of"),
        col("quality_score"))
    if (ordered) out.orderBy(col("doc_id")) else out
  }

  /** HTML extraction (x24): the ENGINE side of the reference's scrape
    * sources — S11's Selenium/BS4 pipelines
    * (ideascale/scrape_applicant_name.py:63-88,
    * project_catalyst/scrape_team_names.py:54-78) fetch pages with a
    * browser (driver-side by nature, out of engine scope per SURVEY
    * §2.1) and then run a pure EXTRACTION dataflow over the HTML:
    * the applicant-name two-case fallback chain (a single-author
    * anchor's `title` attribute or text; else the member-dropdown's
    * first link's `<strong>` text or stripped link text; else None)
    * and the team-section name list. THAT dataflow is what this
    * operator re-expresses — regex extraction chains as codegen'd
    * projections over an HTML column, the shape a 100 TB crawl
    * corpus actually needs (per-partition, no shuffle except the
    * output sort).
    *
    * The HTML itself is an injected deterministic fixture (x13's PII
    * discipline: both engines synthesize the identical page from
    * doc_id/source alone), cycling through all four extraction cases —
    * single author with/without title attribute, dropdown with/without
    * strong, and pages with no author markup at all (the None path).
    */
  def x24ScrapeExtract(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val applicant = concat(lit("applicant_"), pmod(id, lit(97)))
    val lead = concat(lit("lead_"), pmod(id, lit(89)))
    val authorBlock =
      when(pmod(id, lit(11)) === 7, lit(""))
        .when(pmod(id, lit(2)) === 0, concat(
          lit("<a class=\"author-name text-truncate\""),
          when(pmod(id, lit(5)) === 0,
            concat(lit(" title=\"Title "), applicant, lit("\"")))
            .otherwise(lit("")),
          lit(">"), applicant, lit("</a>")))
        .otherwise(concat(
          lit("<div class=\"member-list-dropdown\"><a href=\"#\">"),
          when(pmod(id, lit(3)) === 0,
            concat(lit("<strong>"), lead, lit("</strong> (lead)")))
            .otherwise(lead),
          lit("</a><a href=\"#\">member_x</a></div>")))
    val teamBlock = concat(lit("<section id=\"team\">"),
      array_join(transform(sequence(lit(0), pmod(id, lit(3))),
        i => concat(lit("<h4>team_"), pmod(id, lit(83)), lit("_"), i,
          lit("</h4>"))), ""),
      lit("</section>"))
    val page = Tables(spark, dir, "documents").select(id, col("source"),
      concat(lit("<html><head><title>"), col("source"), lit(" proposal "),
        id, lit("</title></head><body>"), authorBlock, teamBlock,
        lit("</body></html>")).as("html"))
    val h = col("html")
    // the find_author_title fallback chain, case for case
    val t1 = regexp_extract(h,
      "<a class=\"author-name text-truncate\" title=\"([^\"]*)\"", 1)
    val t2 = regexp_extract(h,
      "<a class=\"author-name text-truncate\"[^>]*>([^<]*)</a>", 1)
    val firstA = regexp_extract(h,
      "<div class=\"member-list-dropdown\"><a[^>]*>(.*?)</a>", 1)
    val strongTxt = regexp_extract(firstA, "<strong>([^<]*)</strong>", 1)
    val strippedA = trim(regexp_replace(firstA, "<[^>]+>", ""))
    val teamSec = regexp_extract(h, "<section id=\"team\">(.*?)</section>", 1)
    val team = regexp_extract_all(teamSec, lit("<h4>([^<]*)</h4>"), lit(1))
    page.select(id,
        regexp_extract(h, "<title>([^<]*)</title>", 1).as("page_title"),
        when(t1 =!= "", t1).when(t2 =!= "", t2)
          .when(strongTxt =!= "", strongTxt)
          .when(strippedA =!= "", strippedA)
          .otherwise(lit(null).cast("string")).as("applicant"),
        size(team).cast("long").as("n_team"),
        array_join(team, ",").as("team_csv"))
      .orderBy(id)
  }

  /** GitHub-profile extraction (x26): the LITERAL replay of the
    * reference's one pure-Python column transform in the scrape
    * subsystem — `get_github_profile`
    * (project_catalyst/get_github_profile.py:4-23): strip leading/
    * trailing whitespace; if the url starts with the exact prefix
    * `github.com/`, drop the prefix; return the first `/`-separated
    * segment; null/blank input yields the empty string. The reference
    * runs it as a pandas list comprehension over a scraped company
    * column — here it is one codegen'd projection (trim + prefix test
    * + split_part), per-partition with no shuffle except the output
    * sort, which is how a 100 TB link corpus would run it.
    *
    * The company-link column is an injected deterministic fixture
    * (x24's PII discipline — both engines synthesize identical links
    * from doc_id alone) cycling through every branch of the reference
    * function: user/repo, bare user, trailing slash (all three
    * docstring examples), a scheme-prefixed url that misses the
    * prefix test (the reference returns `https:` — replayed verbatim,
    * quirk included), padded whitespace, empty, and NULL.
    */
  def x26GithubProfile(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val user = concat(lit("user_"), pmod(id, lit(53)))
    val link = when(pmod(id, lit(7)) === 0,
        concat(lit("github.com/"), user, lit("/repo_"), pmod(id, lit(13))))
      .when(pmod(id, lit(7)) === 1, concat(lit("github.com/"), user))
      .when(pmod(id, lit(7)) === 2, concat(lit("github.com/"), user, lit("/")))
      .when(pmod(id, lit(7)) === 3, concat(lit("https://github.com/"), user))
      .when(pmod(id, lit(7)) === 4, concat(lit("  github.com/"), user, lit("  ")))
      .when(pmod(id, lit(7)) === 5, lit(""))
      .otherwise(lit(null).cast("string"))
    Tables(spark, dir, "documents")
      .select(id, link.as("company_link"))
      .select(id, col("company_link"),
        githubProfile(col("company_link")).as("github_profile"))
      .orderBy(id)
  }

  /** The extraction chain itself (library seam for the spec, which
    * replays the reference docstring's examples verbatim).
    */
  private[graft] def githubProfile(url: Column): Column = {
    val u = trim(url)
    val rest = when(u.startsWith("github.com/"),
      substring(u, 12, Int.MaxValue)).otherwise(u)
    when(url.isNull || u === "", lit(""))
      .otherwise(split_part(rest, lit("/"), lit(1)))
  }

  /** Company extraction (x27): the scrape subsystem's OTHER pure
    * column transform — `extract_company`
    * (project_catalyst/extract_company_from_company_link.py:3-76):
    * strip whitespace; remove the FIRST matching prefix of
    * `https://www.` / `https://` (in that order, break on match);
    * remove the FIRST matching suffix from the reference's ordered
    * TLD list (break on match); null/blank → empty string. Replayed
    * quirks included: the reference's suffix list has a missing comma
    * after `".xyz/"`, so Python string concatenation fuses it with
    * `".earth"` into the single dead entry `".xyz/.earth"` — a URL
    * ending `.xyz/` or bare `.earth` therefore NEVER strips, and this
    * replay preserves exactly that. List order is also semantic
    * (`.co.jp/` precedes `.co` and `.jp`; `.com/en/` is reachable only
    * because `.com` fails on a trailing path) — both engines derive
    * their first-match chains from the SAME [[companySuffixes]] Seq,
    * so the 55-arm order cannot drift between them. One codegen'd
    * CASE projection, shuffle-free except the output sort.
    */
  def x27CompanyExtract(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val name = concat(lit("corp"), pmod(id, lit(47)))
    val link = when(pmod(id, lit(11)) === 0, concat(lit("https://www."), name, lit(".com")))
      .when(pmod(id, lit(11)) === 1, concat(lit("https://"), name, lit(".io/")))
      .when(pmod(id, lit(11)) === 2,
        concat(lit("https://github.com/"), name, lit("/")))
      .when(pmod(id, lit(11)) === 3, concat(lit("https://www."), name, lit(".com/en/")))
      .when(pmod(id, lit(11)) === 4, concat(lit("https://www."), name, lit(".com.br/")))
      .when(pmod(id, lit(11)) === 5, concat(name, lit(".xyz/")))
      .when(pmod(id, lit(11)) === 6, concat(name, lit(".earth")))
      .when(pmod(id, lit(11)) === 7, concat(lit("  https://"), name, lit(".ai  ")))
      .when(pmod(id, lit(11)) === 8, concat(name, lit(".co.jp")))
      .when(pmod(id, lit(11)) === 9, lit(""))
      .otherwise(lit(null).cast("string"))
    Tables(spark, dir, "documents")
      .select(id, link.as("company_link"))
      .select(id, col("company_link"),
        extractCompany(col("company_link")).as("company"))
      .orderBy(id)
  }

  /** The reference's suffix list IN ITS EFFECTIVE PYTHON ORDER —
    * including the fused `".xyz/.earth"` the missing comma produces.
    * Single source for the Spark chain and the oracle CASE.
    */
  private[graft] val companySuffixes: Seq[String] = Seq(
    ".com", ".com/", ".io", ".io/", ".fi", ".fi/", ".rest", ".rest/",
    ".net", ".net/", ".city", ".city/", ".org", ".org/", ".co.jp/",
    ".co.jp", ".id", ".id/", ".vn", ".vn/", ".dev", ".dev/",
    ".network", ".network/", ".xyz", ".xyz/.earth", ".earth/", ".art",
    ".art/", ".co", ".co/", ".de", ".de/", ".com/en/", ".com.br/",
    ".com.br", ".ca", ".ca/", ".ac.in/", ".ch", ".ch/", ".ae", ".ae/",
    ".li", ".li/", ".jp", ".jp/", ".me", ".me/", ".gg", ".gg/", ".pt",
    ".pt/", ".ai", ".ai/")

  /** Library seam for [[x27CompanyExtract]] (spec fixtures). */
  private[graft] def extractCompany(url: Column): Column = {
    val u = trim(url)
    val c = when(u.startsWith("https://www."), substring(u, 13, Int.MaxValue))
      .when(u.startsWith("https://"), substring(u, 9, Int.MaxValue))
      .otherwise(u)
    val stripped = companySuffixes.foldLeft(when(lit(false), c)) { (acc, suf) =>
      acc.when(c.endsWith(suf), c.substr(lit(1), length(c) - lit(suf.length)))
    }.otherwise(c)
    when(url.isNull || u === "", lit("")).otherwise(stripped)
  }

  /** x27's oracle tail: the same first-match suffix CASE, generated
    * from the same Seq.
    */
  private[graft] lazy val companySuffixCaseSql: String =
    "CASE " + companySuffixes.map(s =>
      s"WHEN ends_with(c, '$s') THEN left(c, length(c) - ${s.length})")
      .mkString("\n         ") + "\n         ELSE c END"

  /** Feasibility-details extraction (x28): the replay of
    * `find_feasibility_details`
    * (ideascale/scrape_feasibility_details_async.py:36-52) — locate
    * the `<dl id="custom-field-section-4027">` section; within it the
    * `<span class="ql-editor ql-render">` preview; join the stripped
    * text of every nested `<p>` with `"\n"`; a missing dl OR missing
    * span yields None, while a present span with ZERO paragraphs
    * yields the EMPTY string (the reference returns `"\n".join(...)`
    * unconditionally once the span is found — '' and None are
    * distinct outcomes, replayed distinctly). Empty `<p></p>`
    * elements contribute empty lines, exactly as
    * `p.get_text(strip=True)` feeds `join`.
    *
    * The HTML is an injected deterministic fixture (x24's PII
    * discipline) cycling every branch: multi-paragraph with padded
    * whitespace, single paragraph, an empty `<p></p>` between
    * non-empty ones, a zero-paragraph span, dl-without-span, and
    * no-dl. Present sections always carry non-empty content (as real
    * pages do), so regexp '' unambiguously means absent. One
    * codegen'd projection, shuffle-free except the output sort.
    */
  def x28ScrapeFeasibility(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def para(i: Column): Column =
      concat(lit("<p>  feas_"), pmod(id, lit(71)), lit("_"), i, lit(" </p>"))
    val spanBody =
      when(pmod(id, lit(7)) === 0,
        concat(para(lit(0)), para(lit(1))))
        .when(pmod(id, lit(7)) === 1, para(lit(0)))
        .when(pmod(id, lit(7)) === 2,
          concat(para(lit(0)), lit("<p></p>"), para(lit(2))))
        .when(pmod(id, lit(7)) === 3, lit("pending review"))
        .otherwise(lit(""))
    val dlBody = concat(lit("<dt>Feasibility</dt><dd>"),
      when(pmod(id, lit(7)) <= 3,
        concat(lit("<span class=\"ql-editor ql-render\">"), spanBody,
          lit("</span>")))
        .otherwise(lit("<em>no preview</em>")),
      lit("</dd>"))
    val page = Tables(spark, dir, "documents").select(id,
      concat(lit("<html><body><h2>Idea "), id, lit("</h2>"),
        when(pmod(id, lit(7)) <= 4,
          concat(lit("<dl id=\"custom-field-section-4027\">"), dlBody,
            lit("</dl>")))
          .otherwise(lit("<dl id=\"other-section\"><dt>x</dt></dl>")),
        lit("</body></html>")).as("html"))
    val h = col("html")
    val dl = regexp_extract(h,
      "<dl id=\"custom-field-section-4027\">(.*?)</dl>", 1)
    val span = regexp_extract(dl,
      "<span class=\"ql-editor ql-render\">(.*?)</span>", 1)
    val ps = regexp_extract_all(span, lit("<p>([^<]*)</p>"), lit(1))
    page.select(id,
        when(dl === "" || span === "", lit(null).cast("string"))
          .otherwise(array_join(transform(ps, p => trim(p)), "\n"))
          .as("feasibility"))
      .orderBy(id)
  }

  /** Anchor href-or-text extraction (x29): the replay of the
    * reference's two-member anchor family — `find_company_link`
    * (ideascale/get_company_link_ideascale.py:58-65, selector
    * `a.unfurl-url.classic-link`) and `find_website_link`
    * (project_catalyst/scrape_company_links_from_csv.py:63-70,
    * selector `a.sc-ffb617e7-0.fTVUpX`). Both run the same dataflow:
    * first matching anchor's `href` attribute, OR — Python's falsy
    * `or`, so a present-but-EMPTY `href=""` also falls through — the
    * anchor's stripped text; no anchor at all yields None. Both
    * selectors extracted from ONE page column here, because the
    * reference runs them over the same scraped-page corpus shape.
    *
    * Fixture cycles every branch per selector on coprime moduli
    * (href'd, attribute-less, empty-href quirk, absent anchor, and
    * for the website anchor href-with-empty-text). One codegen'd
    * projection, shuffle-free except the output sort.
    */
  def x29ScrapeLinks(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val corp = concat(lit("corp_"), pmod(id, lit(43)))
    val site = concat(lit("site_"), pmod(id, lit(41)))
    val companyA =
      when(pmod(id, lit(4)) === 0, concat(
        lit("<a class=\"unfurl-url classic-link\" href=\"https://"), corp,
        lit(".com\">"), corp, lit(" home</a>")))
        .when(pmod(id, lit(4)) === 1, concat(
          lit("<a class=\"unfurl-url classic-link\">  "), corp,
          lit(" site  </a>")))
        .when(pmod(id, lit(4)) === 2, concat(
          lit("<a class=\"unfurl-url classic-link\" href=\"\">"), corp,
          lit(" fallback</a>")))
        .otherwise(lit(""))
    val websiteA =
      when(pmod(id, lit(5)) === 0, concat(
        lit("<a class=\"sc-ffb617e7-0 fTVUpX\" href=\"https://"), site,
        lit(".org\">"), site, lit("</a>")))
        .when(pmod(id, lit(5)) === 1, concat(
          lit("<a class=\"sc-ffb617e7-0 fTVUpX\"> "), site, lit(" </a>")))
        .when(pmod(id, lit(5)) === 2, concat(
          lit("<a class=\"sc-ffb617e7-0 fTVUpX\" href=\"\">"), site,
          lit(" page</a>")))
        .when(pmod(id, lit(5)) === 3, concat(
          lit("<a class=\"sc-ffb617e7-0 fTVUpX\" href=\"https://"), site,
          lit(".net\"></a>")))
        .otherwise(lit(""))
    val page = Tables(spark, dir, "documents").select(id,
      concat(lit("<html><body>"), companyA, lit("<p>between</p>"), websiteA,
        lit("</body></html>")).as("html"))
    page.select(id,
        anchorHrefOrText(col("html"), "unfurl-url classic-link")
          .as("company_link"),
        anchorHrefOrText(col("html"), "sc-ffb617e7-0 fTVUpX")
          .as("website_link"))
      .orderBy(id)
  }

  /** The anchor family's shared chain (library seam for the spec):
    * `tag.get("href") or tag.get_text(strip=True)` with the None case
    * — non-empty href wins, empty-or-missing href falls to stripped
    * text (which may itself be ''), absent anchor is NULL.
    */
  private[graft] def anchorHrefOrText(h: Column, cls: String): Column = {
    val open = "<a class=\"" + cls + "\""
    val whole = regexp_extract(h, open + "[^>]*>[^<]*</a>", 0)
    val href = regexp_extract(h, open + "[^>]*href=\"([^\"]*)\"[^>]*>", 1)
    val txt = trim(regexp_extract(h, open + "[^>]*>([^<]*)</a>", 1))
    when(whole === "", lit(null).cast("string"))
      .when(href =!= "", href)
      .otherwise(txt)
  }

  /** Applicant-name extraction, project_catalyst variant (x30): the
    * replay of THAT subsystem's `find_author_title`
    * (project_catalyst/scrape_applicant_name_project_catalyst_new.py:56-63)
    * — a DIFFERENT dataflow from the ideascale one x24 replays: find
    * the `<h3>` whose text CONTAINS (case-insensitively) the literal
    * label `[general] name and surname of main applicant`; the name
    * is the text node immediately FOLLOWING the h3, stripped; a
    * whitespace-only sibling, a label-less page, or no h3 at all each
    * yield None (the reference's `return name if name else None` plus
    * its implicit fall-through).
    *
    * Fixture cycles the label in three casings (the `.lower()`
    * contains-test), with surrounding h3 text, padded sibling text, a
    * whitespace-only sibling, a wrong-label h3, and no h3. One
    * codegen'd projection, shuffle-free except the output sort.
    */
  def x30ScrapeApplicantPc(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val name = concat(lit("pc_applicant_"), pmod(id, lit(61)))
    val block =
      when(pmod(id, lit(6)) === 0, concat(
        lit("<h3>[General] Name and Surname of main applicant</h3>"),
        name, lit("<div class=\"sep\">|</div>")))
        .when(pmod(id, lit(6)) === 1, concat(
          lit("<h3>[general] name and surname of main applicant</h3>  "),
          name, lit("  <p>next</p>")))
        .when(pmod(id, lit(6)) === 2, concat(
          lit("<h3>Q1: [GENERAL] NAME AND SURNAME OF MAIN APPLICANT *</h3>"),
          name, lit("<br>")))
        .when(pmod(id, lit(6)) === 3, lit(
          "<h3>[general] name and surname of main applicant</h3>   <div>x</div>"))
        .when(pmod(id, lit(6)) === 4, lit("<h3>Budget breakdown</h3>someone"))
        .otherwise(lit("<p>no headings here</p>"))
    val page = Tables(spark, dir, "documents").select(id,
      concat(lit("<html><body>"), block, lit("</body></html>")).as("html"))
    val cap = trim(regexp_extract(col("html"),
      "(?i)<h3>[^<]*\\[general\\] name and surname of main applicant[^<]*</h3>([^<]*)",
      1))
    page.select(id,
        when(cap === "", lit(null).cast("string")).otherwise(cap)
          .as("applicant"))
      .orderBy(id)
  }

  /** Per-source calibration thresholds over a HISTORY slice — the
    * REFRESH output c13's admission gate consumes (the c10 centroid
    * pattern applied to x23's calibration): for each source, the raw
    * quality score at the LOWER MEDIAN of that source's non-null
    * history scores, ordered by the same (score asc, doc_id) total
    * order x23 ranks with. Rank-exact integer arithmetic (row_number
    * against (n+1) div 2), no interpolation — both engines land on the
    * identical threshold double, so the >= gate comparison is
    * cross-engine exact. One exchange on source; output is
    * #sources rows.
    */
  private[graft] def calibrationThresholds(hist: DataFrame): DataFrame = {
    val byScore = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").asc, col("doc_id").asc)
    qualityScored(hist, col("source"))
      .select(col("source"), col("doc_id"), col("quality_score"))
      .filter(col("quality_score").isNotNull)
      .withColumn("rn", row_number().over(byScore))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("source"), col("quality_score").as("thr"))
  }

  /** Calibrated admission (c13): c8's three-gate admission with the
    * quality gate running on the PER-SOURCE CALIBRATED threshold
    * instead of the raw `score > 0` — the systematic-bias fix x23's
    * scaladoc argues for, executed where it matters: raw score scales
    * differ by source (a boilerplate-heavy crawl and a curated dump
    * occupy different bands), so the raw global threshold admits the
    * generous-scale source's mediocre documents while rejecting the
    * strict-scale source's good ones. Here each source's history
    * median IS its bar: a delta doc passes iff its raw score reaches
    * its own source's historical middle — admission pressure is equal
    * per source by construction (AdmissionSpec pins the dominance
    * flip on a two-band synthetic corpus).
    *
    * The thresholds are refresh output (computed over the history
    * slice once, persisted as a #sources-row table — the c10 centroid
    * posture); at admission they ride a broadcast join into the gate
    * projection. Everything downstream (exact gate, near-dup gate, CC
    * resolution) is c8's machinery unchanged — the gate swap is one
    * optional parameter on [[admissionDecisions]].
    */
  def c13AdmissionCalibrated(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val cut = incrementalCut(spark, dir)
    val zones = admissionHistZones(spark, dir, docs, cut)
    admissionDecisions(spark, docs,
      docs.filter(col("doc_id") >= cut)
        .select(col("doc_id"), col("source"), col("text")),
      s"$zones/md5", s"$zones/sig",
      calThresholds = Some(spark.read.parquet(s"$zones/cal")))
  }

  /** Per-source quality calibration (x23): x3's raw score rank-
    * normalized WITHIN each source to a [0,1] percent_rank — the
    * cross-source comparability signal every mixed-corpus curation
    * step needs (raw score scales differ by source: a boilerplate-
    * heavy crawl and a curated wiki dump occupy different score
    * bands, so any global threshold or cross-source ranking on raw
    * scores systematically over-selects the generous-scale source;
    * c5 sidesteps this with per-source budgets, c7's clusters mix
    * sources — calibration is the principled fix). Rank-based on
    * purpose: a z-score needs mean/variance whose float summation
    * order differs across engines, while percent_rank is exact
    * integer rank arithmetic over the same (score, doc_id) total
    * order both engines share — hash-matchable.
    *
    * Scale shape: ONE exchange on source (the per-source ranking
    * window; sources partition the corpus, so the sort parallelizes
    * across them), scoring itself a narrow codegen'd projection.
    */
  def x23QualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    // asc_nulls_last, NOT plain asc: a zero-token or zero-char document
    // scores NULL, and Spark's ASC default is NULLS FIRST while
    // DuckDB's is NULLS LAST — an un-pinned ordering would shift every
    // rank in that source and hash-mismatch the oracle the moment the
    // data contains one such row (the oracle SQL pins NULLS LAST too)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").asc_nulls_last, col("doc_id"))
    qualityScored(Tables(spark, dir, "documents"), col("source"))
      .withColumn("calibrated", percent_rank().over(w))
      .select(col("doc_id"), col("source"), col("quality_score"), col("calibrated"))
      .orderBy(col("doc_id"))
  }

  /** Int8 scalar quantization of the embedding column (the memory-side
    * half of IVF-PQ-style ANN): per-dimension corpus min/max, then each
    * value to its 0..255 code. Stats are one partial-aggregated shuffle
    * over 64 dim groups; the stats table (64 rows) broadcasts back; the
    * quantization itself is a codegen'd projection. Float→double casts
    * are exact and the scale math uses only IEEE-exact ops, so any engine
    * reproduces the codes bit-for-bit.
    */
  def d10QuantizeEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    // `e` feeds both the stats aggregate and the quantize join and is
    // deliberately NOT cached: the exploded table is dims× the source
    // size, so materializing it costs more than the second columnar scan
    // it would save (the explode itself is a codegen'd projection).
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        col("col").cast("double").as("x"))
    val stats = e.groupBy(col("dim")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    e.join(broadcast(stats), "dim")
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(255L),
            floor((col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))))))
      .select(col("vec_id"), col("dim"), col("code"))
      .orderBy(col("vec_id"), col("dim"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x10_repetition" -> (x10Repetition _),
    "x11_stratified_sample" -> (x11StratifiedSample _),
    "x20_group_sample" -> (x20GroupSample _),
    "c2_training_corpus" -> (c2TrainingCorpus _),
    "x12_sequence_pack" -> (x12SequencePack _),
    "c5_training_mix" -> (c5TrainingMix _),
    "d18_kmeans" -> (d18Kmeans _),
    "c7_curation_pipeline" -> (c7CurationPipeline _),
    "c8_incremental_curation" -> (c8IncrementalCuration _),
    "c9_admission_loop" -> (c9AdmissionLoop _),
    "c10_admission_clusters" -> (c10AdmissionClusters _),
    "c11_admission_capped" -> (c11AdmissionCapped _),
    "c12_admission_semantic" -> (c12AdmissionSemantic _),
    "c17_admission_media" -> (c17AdmissionMedia _),
    "c13_admission_calibrated" -> (c13AdmissionCalibrated _),
    "c14_admission_shard" -> (c14AdmissionShard _),
    "d22_incremental_dedup" -> (d22IncrementalDedup _),
    "d24_incremental_dedup_capped" -> (d24IncrementalDedupCapped _),
    "d25_incremental_dedup_bucketed" -> (d25IncrementalDedupBucketed _),
    "d26_incremental_audio_dedup" -> (d26IncrementalAudioDedup _),
    "d27_rebuilt_zone_dedup" -> (d27RebuiltZoneDedup _),
    "d20_cc_bucketed" -> (d20CcBucketed _),
    "d19_ann_index_zone" -> (d19AnnIndexZone _),
    "d21_ann_index_optimized" -> (d21AnnIndexOptimized _),
    "d28_ivf_topk" -> (d28IvfTopk _),
    "d29_ivf_optimized" -> (d29IvfOptimized _),
    "d30_pq_topk" -> (d30PqTopk _),
    "d31_ivf_pq" -> (d31IvfPq _),
    "d32_ivf_pq_refined" -> (d32IvfPqRefined _),
    "c16_reindex_loop" -> (c16ReindexLoop _),
    "c15_retrieval_refined" -> (c15RetrievalRefined _),
    "x23_quality_calibration" -> (x23QualityCalibration _),
    "x24_scrape_extract" -> (x24ScrapeExtract _),
    "x26_github_profile" -> (x26GithubProfile _),
    "x27_company_extract" -> (x27CompanyExtract _),
    "x28_scrape_feasibility" -> (x28ScrapeFeasibility _),
    "x29_scrape_links" -> (x29ScrapeLinks _),
    "x30_scrape_applicant_pc" -> (x30ScrapeApplicantPc _),
    "d10_quantize_embeddings" -> (d10QuantizeEmbeddings _),
    "d7_embedding_neardup" -> (d7EmbeddingNeardup _),
    "d15_semantic_dedup" -> (d15SemanticDedup _),
    "d23_incremental_semantic_dedup" -> (d23IncrementalSemanticDedup _),
    "d8_lsh_verified_dedup" -> (d8LshVerifiedDedup _),
    "d9_dedup_clusters" -> (d9DedupClusters _),
    "d12_quality_keeper" -> (d12QualityKeeper _),
    "x6_deterministic_split" -> (x6DeterministicSplit _),
    "x7_vocab_topk" -> (x7VocabTopk _),
    "x21_weighted_sample" -> (x21WeightedSample _),
    "x22_ngram_novelty" -> (x22NgramNovelty _),
    "x19_heavy_hitters" -> (x19HeavyHitters _),
    "x15_oov_rate" -> (x15OovRate _),
    "x16_lm_familiarity" -> (x16LmFamiliarity _),
    "x17_tfidf_keywords" -> (x17TfidfKeywords _),
    "x18_chunk_split" -> (x18ChunkSplit _),
    "d17_passage_dedup" -> (d17PassageDedup _),
    "d33_substring_dedup" -> (d33SubstringDedup _),
    "x25_substring_clean" -> (x25SubstringClean _),
    "d34_incremental_substring" -> (d34IncrementalSubstring _),
    "d14_fuzzy_match" -> (d14FuzzyMatch _),
    "x8_bpe_tokens" -> (x8BpeTokens _),
    "x31_bpe_train" -> (x31BpeTrain _),
    "c18_bpe_encode" -> (c18BpeEncode _),
    "c19_bpe_shard_tail" -> (c19BpeShardTail _),
    "c20_epoch_pack" -> (c20EpochPack _),
    "x32_epoch_shuffle" -> (x32EpochShuffle _),
    "x9_decontaminate" -> (x9Decontaminate _),
    "x13_pii_redact" -> (x13PiiRedact _),
    "x14_dataset_mix" -> (x14DatasetMix _),
    "x5_string_clean" -> (x5StringClean _),
    "m1_media_features" -> (m1MediaFeatures _),
    "m2_frame_sample" -> (m2FrameSample _),
    "m4_audio_stats" -> (m4AudioStats _),
    "m6_audio_fingerprint" -> (m6AudioFingerprint _),
    "m5_image_phash" -> (m5ImagePhash _),
    "d16_image_neardup" -> (d16ImageNeardup _),
    "m3_image_resize" -> (m3ImageResize _),
    "d1_dedup_exact" -> (d1DedupExact _),
    "d2_ngram_jaccard" -> (d2NgramJaccard _),
    "d3_minhash_lsh" -> (d3MinhashLsh _),
    "d4_simhash" -> (d4Simhash _),
    "d11_simhash_pairs" -> (d11SimhashPairs _),
    "d5_cosine_topk" -> (d5CosineTopk _),
    "d6_ann_lsh" -> (d6AnnLsh _),
    "c6_hybrid_retrieval" -> (c6HybridRetrieval _),
    "d13_batch_ann" -> (d13BatchAnn _),
    "x1_token_stats" -> (x1TokenStats _),
    "x2_lang_id" -> (x2LangId _),
    "x3_quality_score" -> (x3QualityScore _),
    "x4_fingerprint" -> (x4Fingerprint _))

  /** Bench-family tags for this registry's `c*` entries, declared WITH
    * the definitions so a new entry cannot silently mis-classify by
    * name prefix (Bench refuses an untagged `c*` key). The admission/
    * curation compositions carry structural per-entry floors (CC
    * fixpoint rounds, persisted-zone staging) that batch SQL entries
    * do not — the reason the per-family subtotal exists.
    */
  val families: Map[String, String] = Map(
    "c2_training_corpus" -> "composition",
    "c5_training_mix" -> "composition",
    "c6_hybrid_retrieval" -> "composition",
    "c7_curation_pipeline" -> "composition",
    "c8_incremental_curation" -> "composition",
    "c9_admission_loop" -> "composition",
    "c10_admission_clusters" -> "composition",
    "c11_admission_capped" -> "composition",
    "c12_admission_semantic" -> "composition",
    "c17_admission_media" -> "composition",
    "c18_bpe_encode" -> "composition",
    "c19_bpe_shard_tail" -> "composition",
    "c20_epoch_pack" -> "composition",
    "c13_admission_calibrated" -> "composition",
    "c14_admission_shard" -> "composition",
    "c15_retrieval_refined" -> "composition",
    "c16_reindex_loop" -> "composition")

  /** d6's oracle, k-parameterized: the SRP-LSH bucket/probe derivation
    * with the plane count re-derived from the corpus size, top-k by
    * (cos_sim desc, vec_id). Shared by d6 (k=10) and c6's candidate
    * stage (k=20) so the two gates cannot drift.
    */
  /** SRP plane derivation + per-vector bucket assignment as CTEs
    * (np, planes, bucketed) — shared by the d6/d19/d21 top-k oracles
    * and d23's incremental pair oracle.
    */
  private lazy val srpBucketCtes =
    s"""np AS (
       |  SELECT coalesce(min(p), 24) AS np FROM range(25) r(p)
       |  WHERE p >= 4 AND (CAST(32 AS BIGINT) << p) >= (SELECT count(*) FROM embeddings)),
       |planes AS (
       |  SELECT p, list((${h60sql.format("'plane' || p || ':' || i")} % 2001 - 1000) / 1000.0
       |                 ORDER BY i) AS w
       |  FROM range(24) rp(p), range(64) ri(i), np WHERE p < np.np GROUP BY p),
       |bucketed AS (
       |  SELECT vec_id, embedding,
       |         (SELECT sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), pl.w) >= 0
       |                          THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
       |          FROM planes pl) AS bucket
       |  FROM embeddings e)""".stripMargin

  private def lshTopKOracleSql(k: Int): String =
    s"""WITH $srpBucketCtes,
       |q AS (SELECT embedding AS qvec, bucket AS qbucket FROM bucketed WHERE vec_id = 0),
       |probes AS (
       |  SELECT q.qvec, CASE WHEN r.p = np.np THEN q.qbucket
       |                      ELSE xor(q.qbucket, CAST(1 AS BIGINT) << r.p) END AS pb
       |  FROM q, np, range(25) r(p) WHERE r.p <= np.np)
       |SELECT b.vec_id,
       |  list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(pr.qvec AS DOUBLE[])) /
       |  (sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))) *
       |   sqrt(list_dot_product(CAST(pr.qvec AS DOUBLE[]), CAST(pr.qvec AS DOUBLE[])))) AS cos_sim
       |FROM bucketed b JOIN probes pr ON b.bucket = pr.pb
       |ORDER BY cos_sim DESC, vec_id LIMIT $k""".stripMargin

  /** d18's oracle: the same `iters` integer Lloyd rounds as chained
    * CTEs — assignment (argmin with lower-cid tiebreak), centroid
    * recompute (`sum // count`, empty clusters keep the previous
    * centroid), generated from one loop bound so the two engines'
    * iteration counts cannot drift (the q58 discipline). All values
    * are positive longs (the +1 quantization shift), so DuckDB's `//`
    * and Spark's driver-side long division agree.
    */
  /** The k-means CTE chain, parameterized by the source relation (any
    * CTE/table exposing `vec_id, embedding`) so d18 (full embeddings)
    * and c7 (curation survivors) replay the SAME algorithm: the
    * distance-weighted hash-randomized seeding (k scans, each an
    * argmax of `nearest-chosen-sqdist · hashed-uniform`, exactly
    * [[graft.operators.Similarity.kmeansAssign]]'s derivation), then
    * `iters` Lloyd rounds in exact integer space. The final
    * per-vector assignment lands in CTE `a<iters>` (vec_id, cid,
    * dist); `kq` is the quantized exploded corpus.
    */
  private[queries] def kmeansCtes(src: String, k: Int = 8, iters: Int = 3,
      prefix: String = ""): String = {
    val P = prefix
    // the Spark twin accepts any k >= 1; the generated chain must too —
    // k = 1 has an EMPTY seeding segment (ch0 is the full chosen set),
    // which the assembly below handles by dropping that block entirely
    // rather than emitting a dangling comma
    require(k >= 1 && iters >= 1, s"kmeansCtes needs k >= 1, iters >= 1 (got $k, $iters)")
    val draw = (i: Int) =>
      s"(CAST((${h60sql.format(s"'seed$i:' || CAST(vec_id AS VARCHAR)")} % 1048576 + 1) AS DOUBLE) / 1048576.0)"
    val seeding = (1 until k).map { i =>
      // cb$i materializes the CHOSEN vectors' exploded rows (<=i·dims)
      // BEFORE the dim join: without it DuckDB may join kq with kq on
      // dim first (corpus² · dims rows — OOM at verify scale) and only
      // then apply the chosen filter
      s"""${P}cb$i AS MATERIALIZED (SELECT b.vec_id, b.dim, b.v
         |  FROM ${P}kq b JOIN ${P}ch${i - 1} c ON c.vec_id = b.vec_id),
         |${P}nd$i AS MATERIALIZED (SELECT a_vec AS vec_id, min(d) AS nd FROM (
         |    SELECT a.vec_id AS a_vec, b.vec_id AS b_vec,
         |        sum((a.v - b.v)*(a.v - b.v)) AS d
         |    FROM ${P}kq a JOIN ${P}cb$i b ON b.dim = a.dim
         |    GROUP BY a.vec_id, b.vec_id) t GROUP BY a_vec),
         |${P}s$i AS MATERIALIZED (SELECT vec_id FROM ${P}nd$i
         |  ORDER BY CAST(nd AS DOUBLE) * ${draw(i)} DESC, vec_id LIMIT 1),
         |${P}ch$i AS MATERIALIZED (SELECT vec_id FROM ${P}ch${i - 1} UNION ALL SELECT vec_id FROM ${P}s$i)""".stripMargin
    }.mkString(",\n")
    val iterations = (1 to iters).map { i =>
      s"""${P}d$i AS MATERIALIZED (SELECT q.vec_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS dist
         |  FROM ${P}kq q JOIN ${P}c${i - 1} c USING (dim) GROUP BY q.vec_id, c.cid),
         |${P}a$i AS MATERIALIZED (SELECT vec_id, cid, dist FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cid) AS rn FROM ${P}d$i)
         |  WHERE rn = 1),
         |${P}c$i AS MATERIALIZED (SELECT c.cid, c.dim, CAST(coalesce(n.s // n.n, c.c) AS BIGINT) AS c
         |  FROM ${P}c${i - 1} c LEFT JOIN (
         |    SELECT a.cid, q.dim, sum(q.v) AS s, count(*) AS n
         |    FROM ${P}a$i a JOIN ${P}kq q USING (vec_id) GROUP BY a.cid, q.dim) n
         |  ON n.cid = c.cid AND n.dim = c.dim)""".stripMargin
    }.mkString(",\n")
    val seedingBlock = if (k > 1) seeding + ",\n" else ""
    s"""${P}kq AS MATERIALIZED (SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
       |    CAST(floor((CAST(unnest(embedding) AS DOUBLE) + 1.0) * 1048576.0) AS BIGINT) AS v
       |  FROM $src),
       |${P}ch0 AS MATERIALIZED (SELECT vec_id FROM $src
       |  ORDER BY ${draw(0)} DESC, vec_id LIMIT 1),
       |${seedingBlock}${P}init AS MATERIALIZED (SELECT DISTINCT vec_id FROM ${P}ch${k - 1}),
       |${P}c0 AS MATERIALIZED (SELECT CAST(dense_rank() OVER (ORDER BY q.vec_id) - 1 AS BIGINT) AS cid,
       |    q.dim, q.v AS c
       |  FROM ${P}kq q JOIN ${P}init USING (vec_id)),
       |$iterations""".stripMargin
  }

  // lazy: references h60sql, which is declared later in the object body
  private lazy val kmeansOracleSql: String =
    s"""WITH ${kmeansCtes("embeddings")}
       |SELECT cid, count(*) AS n_members, CAST(sum(dist) AS BIGINT) AS ssd
       |FROM a3 GROUP BY cid ORDER BY cid""".stripMargin

  /** d28/d29's oracle: kmeansCtes' fitted quantizer and home cells —
    * the zone stores kmeansFit's output, which is the centroid set the
    * FINAL assignment runs against (a3 assigns against c2: iteration i
    * scores c_{i-1}), so both the per-query cell ranking (same
    * (dist, cid) tiebreak) and the stored lists derive from c2. Then
    * nprobe=2 probing and exact cosine top-10 over probed lists — the
    * engine's approximation is exactly WHICH candidates are scored, so
    * the whole structure hash-matches.
    */
  private lazy val ivfTopKOracleSql: String =
    s"""WITH ${kmeansCtes("embeddings", k = ivfKmeansK)},
       |qd AS MATERIALIZED (
       |  SELECT q.vec_id AS q_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS d
       |  FROM kq q JOIN c2 c USING (dim) WHERE q.vec_id < 5 GROUP BY 1, 2),
       |probed AS (SELECT q_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY d, cid) AS rn
       |    FROM qd) WHERE rn <= 2),
       |cands AS (SELECT p.q_id, a.vec_id FROM probed p JOIN a3 a USING (cid)),
       |scored AS (SELECT c.q_id, c.vec_id,
       |    list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[])) /
       |    (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
       |     sqrt(list_dot_product(CAST(qe.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[])))) AS cos_sim
       |  FROM cands c JOIN embeddings e USING (vec_id)
       |  JOIN embeddings qe ON qe.vec_id = c.q_id)
       |SELECT q_id, vec_id, cos_sim, CAST(rn AS BIGINT) AS nn_rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)
       |WHERE rn <= 10 ORDER BY q_id, nn_rank""".stripMargin

  /** d33's oracle: per-position window hashes via the tok self-join
    * (positions × W rows — fine at oracle scale), HAVING count(*)=W
    * drops incomplete tails, dup hashes by global occurrence count,
    * gap-and-island merge with the same running-max rule.
    */
  /** d33/x25's shared chain through `isl` (doc, marked position,
    * island id) — `tok` stays visible for x25's reassembly.
    */
  private lazy val substringSpanCtes: String = {
    val w = ssdedupW
    s"""tok AS MATERIALIZED (SELECT doc_id, CAST(generate_subscripts(t, 1) AS BIGINT) AS i, unnest(t) AS w
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents)),
       |win AS MATERIALIZED (SELECT a.doc_id, a.i AS s,
       |    ${h60sql.format("string_agg(b.w, ' ' ORDER BY b.i)")} AS h
       |  FROM tok a JOIN tok b ON b.doc_id = a.doc_id
       |    AND b.i >= a.i AND b.i < a.i + $w
       |  GROUP BY a.doc_id, a.i HAVING count(*) = $w),
       |dup AS MATERIALIZED (SELECT doc_id, s FROM win
       |  WHERE h IN (SELECT h FROM win GROUP BY h HAVING count(*) >= 2)),
       |brks AS (SELECT doc_id, s,
       |    CASE WHEN s > coalesce(max(s) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -$w) + $w
       |      THEN 1 ELSE 0 END AS brk
       |  FROM dup),
       |isl AS MATERIALIZED (SELECT doc_id, s,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island FROM brks)""".stripMargin
  }

  private lazy val substringDedupOracleSql: String =
    s"""WITH $substringSpanCtes
       |SELECT doc_id, min(s) AS span_start, max(s) + ${ssdedupW - 1} AS span_end,
       |    count(*) AS n_windows
       |FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin

  /** d34's oracle: d33's chain with the final select restricted to
    * the delta slice (doc_id >= the 4/5 cut) — the incremental zone
    * probe must answer exactly like the batch recompute there.
    */
  private lazy val incrSubstringOracleSql: String =
    s"""WITH $substringSpanCtes,
       |cut AS (SELECT count(*) * 4 // 5 AS c FROM documents)
       |SELECT doc_id, min(s) AS span_start, max(s) + ${ssdedupW - 1} AS span_end,
       |    count(*) AS n_windows
       |FROM isl, cut WHERE doc_id >= cut.c
       |GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin

  /** x25: the span chain, then every token OUTSIDE a span reassembled
    * in position order (docs fully covered drop out — no kept rows).
    */
  private lazy val substringCleanOracleSql: String =
    s"""WITH $substringSpanCtes,
       |spans AS MATERIALIZED (SELECT doc_id, min(s) AS st,
       |    max(s) + ${ssdedupW - 1} AS en
       |  FROM isl GROUP BY doc_id, island)
       |SELECT t.doc_id, count(*) AS n_kept,
       |    string_agg(t.w, ' ' ORDER BY t.i) AS clean_text
       |FROM tok t
       |WHERE NOT EXISTS (SELECT 1 FROM spans sp
       |  WHERE sp.doc_id = t.doc_id AND t.i BETWEEN sp.st AND sp.en)
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** The PQ structure as CTEs, shared by the d30 and d31 oracles: per
    * subspace, a sliced-source integer-Lloyd chain (kmeansCtes with a
    * `p{s}` name prefix; iters=2 ⇒ codebook = p{s}c1, assignment =
    * p{s}a2 — the kmeansFit contract), then the code table (one row
    * per vector: its m cell ids) and the five queries' per-subspace
    * LUTs (distance to EVERY codebook entry). Sums cast to BIGINT —
    * DuckDB's sum() yields HUGEINT, which pandas would coerce to
    * float.
    */
  private lazy val pqCtes: String = {
    val m = pqSubspaces
    val dsub = 64 / m
    val subs = (0 until m).map { s =>
      s"sub$s AS MATERIALIZED (SELECT vec_id, " +
        s"embedding[${s * dsub + 1}:${(s + 1) * dsub}] AS embedding FROM embeddings)"
    }.mkString(",\n")
    val chains = (0 until m).map { s =>
      kmeansCtes(s"sub$s", k = pqCodes, iters = 2, prefix = s"p$s")
    }.mkString(",\n")
    val codeCols = (0 until m).map(s => s"a$s.cid AS k$s").mkString(", ")
    val codeJoin = (1 until m)
      .map(s => s"JOIN p${s}a2 a$s USING (vec_id)").mkString(" ")
    val luts = (0 until m).map { s =>
      s"""lut$s AS MATERIALIZED (SELECT q.vec_id AS q_id, c.cid,
         |    CAST(sum((q.v - c.c)*(q.v - c.c)) AS BIGINT) AS d
         |  FROM p${s}kq q JOIN p${s}c1 c USING (dim)
         |  WHERE q.vec_id < 5 GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""$subs,
       |$chains,
       |pqcodes AS MATERIALIZED (SELECT a0.vec_id, $codeCols FROM p0a2 a0 $codeJoin),
       |$luts""".stripMargin
  }

  /** The ADC scores as a CTE (`adc(q_id, vec_id, adc_dist)`) over
    * `pqcodes` × the LUTs, with candidates restricted by `candJoin`
    * (empty for the full scan).
    */
  private def pqAdcCte(candJoin: String): String = {
    val m = pqSubspaces
    val lutJoins = (0 until m).map { s =>
      if (s == 0 && candJoin.isEmpty) s"JOIN lut0 l0 ON l0.cid = cd.k0"
      else s"JOIN lut$s l$s ON l$s.q_id = ${if (s == 0) "cn.q_id" else "l0.q_id"} AND l$s.cid = cd.k$s"
    }.mkString("\n  ")
    val adc = (0 until m).map(s => s"l$s.d").mkString(" + ")
    s"""adc AS MATERIALIZED (SELECT l0.q_id, cd.vec_id, CAST($adc AS BIGINT) AS adc_dist
       |  FROM ${if (candJoin.isEmpty) "pqcodes cd" else candJoin}
       |  $lutJoins)""".stripMargin
  }

  /** The ADC top-k select over the `adc` CTE. */
  private def pqAdcSelect(k: Int): String =
    s"""SELECT q_id, vec_id, adc_dist, CAST(rn AS BIGINT) AS nn_rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY adc_dist, vec_id) AS rn FROM adc)
       |WHERE rn <= $k ORDER BY q_id, nn_rank""".stripMargin

  private lazy val pqTopKOracleSql: String =
    s"""WITH $pqCtes,
       |${pqAdcCte("")}
       |${pqAdcSelect(10)}""".stripMargin

  /** c16's oracle: BOTH quantizer fits replayed, phase-routed. The
    * history-slice Lloyd chain (prefix `h`, over the first 3/4 of the
    * corpus) serves `ivf_stale` — its stored lists are the history
    * assignments (ha3) plus the delta assigned under the SAME stale
    * centroids (hc2), exactly what append() wrote before the reindex.
    * The full-corpus chain (prefix `f`) serves `ivf_reindexed` — it
    * is literally d28's oracle chain, proving the rebuilt zone equals
    * a from-scratch build. `pq_reindexed` is literally d30's chain
    * (full-corpus codebooks + ADC). Ranks only: which geometry served
    * which phase is what the hash must pin.
    */
  private lazy val reindexLoopOracleSql: String = {
    val cut = "(SELECT count(*) * 3 // 4 FROM embeddings)"
    val cos = (cand: String) =>
      s"""SELECT c.q_id, c.vec_id,
         |    list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[])) /
         |    (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
         |     sqrt(list_dot_product(CAST(qe.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[])))) AS cs
         |  FROM $cand c JOIN embeddings e USING (vec_id)
         |  JOIN embeddings qe ON qe.vec_id = c.q_id""".stripMargin
    s"""WITH hemb AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < $cut),
       |${kmeansCtes("hemb", k = ivfKmeansK, prefix = "h")},
       |${kmeansCtes("embeddings", k = ivfKmeansK, prefix = "f")},
       |$pqCtes,
       |${pqAdcCte("")},
       |hdd AS MATERIALIZED (
       |  SELECT q.vec_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS dist
       |  FROM fkq q JOIN hc2 c USING (dim)
       |  WHERE q.vec_id >= $cut GROUP BY q.vec_id, c.cid),
       |hda AS (SELECT vec_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist, cid) AS rn FROM hdd) WHERE rn = 1),
       |slists AS MATERIALIZED (
       |  SELECT vec_id, cid FROM ha3 UNION ALL SELECT vec_id, cid FROM hda),
       |sqd AS MATERIALIZED (
       |  SELECT q.vec_id AS q_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS d
       |  FROM fkq q JOIN hc2 c USING (dim) WHERE q.vec_id < 5 GROUP BY 1, 2),
       |sprobed AS (SELECT q_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY d, cid) AS rn
       |    FROM sqd) WHERE rn <= 2),
       |scands AS (SELECT p.q_id, l.vec_id FROM sprobed p JOIN slists l USING (cid)),
       |fqd AS MATERIALIZED (
       |  SELECT q.vec_id AS q_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS d
       |  FROM fkq q JOIN fc2 c USING (dim) WHERE q.vec_id < 5 GROUP BY 1, 2),
       |fprobed AS (SELECT q_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY d, cid) AS rn
       |    FROM fqd) WHERE rn <= 2),
       |fcands AS (SELECT p.q_id, a.vec_id FROM fprobed p JOIN fa3 a USING (cid)),
       |sscore AS (${cos("scands")}),
       |fscore AS (${cos("fcands")}),
       |ranked AS (
       |  SELECT 'ivf_stale' AS phase, q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
       |    FROM sscore
       |  UNION ALL
       |  SELECT 'ivf_reindexed' AS phase, q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
       |    FROM fscore
       |  UNION ALL
       |  SELECT 'pq_reindexed' AS phase, q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rn
       |    FROM adc)
       |SELECT phase, q_id, vec_id, CAST(rn AS BIGINT) AS nn_rank
       |FROM ranked WHERE rn <= 10 ORDER BY phase, q_id, nn_rank""".stripMargin
  }

  /** d28's router chain as CTEs (`qd`, `probed`, `cands`), shared by
    * the d31/d32 oracles.
    */
  private lazy val ivfRouterCtes: String =
    s"""${kmeansCtes("embeddings", k = ivfKmeansK)},
       |qd AS MATERIALIZED (
       |  SELECT q.vec_id AS q_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS d
       |  FROM kq q JOIN c2 c USING (dim) WHERE q.vec_id < 5 GROUP BY 1, 2),
       |probed AS (SELECT q_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY d, cid) AS rn
       |    FROM qd) WHERE rn <= 2),
       |cands AS MATERIALIZED (
       |  SELECT p.q_id, a.vec_id FROM probed p JOIN a3 a USING (cid))""".stripMargin

  /** d31: the d28 router chain (full-dim quantizer + probed cells +
    * candidate lists) composed with the PQ scoring chain — one replay
    * of both trained structures.
    */
  private lazy val ivfPqOracleSql: String =
    s"""WITH $ivfRouterCtes,
       |$pqCtes,
       |${pqAdcCte("cands cn JOIN pqcodes cd ON cd.vec_id = cn.vec_id")}
       |${pqAdcSelect(10)}""".stripMargin

  /** c6/c15's shared oracle tail (expects a `cand(vec_id, cos_sim)`
    * CTE upstream): query terms, chunk tiling over candidates, exact
    * term hits, hybrid top-10.
    */
  private lazy val hybridTailSql: String =
    """qt AS (
          |  SELECT w FROM (
          |    SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w
          |    FROM documents WHERE doc_id = 0)
          |  WHERE w NOT IN ('the','and','of','to','in','is')
          |  GROUP BY w ORDER BY count(*) DESC, w LIMIT 3),
          |tok AS (SELECT d.doc_id, regexp_extract_all(lower(d.text), '\w+') AS toks
          |        FROM documents d JOIN cand ON cand.vec_id = d.doc_id),
          |s AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0),
          |st AS (SELECT doc_id, toks, n, unnest(range(0, CAST(n AS BIGINT), 24)) AS strt
          |       FROM s),
          |ch AS (SELECT doc_id, CAST(strt // 24 AS BIGINT) AS chunk_idx,
          |         toks[strt + 1 : least(strt + 32, n)] AS chunk_toks
          |       FROM st),
          |sc AS (SELECT ch.doc_id, ch.chunk_idx,
          |         CAST((SELECT coalesce(sum(len(list_filter(ch.chunk_toks, x -> x = qt.w))), 0)
          |               FROM qt) AS BIGINT) AS hits,
          |         cand.cos_sim
          |       FROM ch JOIN cand ON cand.vec_id = ch.doc_id)
          |SELECT doc_id, chunk_idx, hits, cos_sim
          |FROM sc ORDER BY hits DESC, cos_sim DESC, doc_id, chunk_idx
          |LIMIT 10""".stripMargin

  /** The d32 chain up to `scored(q_id, vec_id, cos_sim)` — router +
    * PQ + routed ADC shortlist (top-$pqRefineR per query) + exact
    * cosine over the shortlist. Shared by the d32 and c15 oracles.
    */
  private lazy val ivfPqRefinedCtes: String =
    s"""$ivfRouterCtes,
       |$pqCtes,
       |${pqAdcCte("cands cn JOIN pqcodes cd ON cd.vec_id = cn.vec_id")},
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY adc_dist, vec_id) AS rn FROM adc)
       |  WHERE rn <= $pqRefineR),
       |scored AS (SELECT s.q_id, s.vec_id,
       |    list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[])) /
       |    (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
       |     sqrt(list_dot_product(CAST(qe.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[])))) AS cos_sim
       |  FROM short s JOIN embeddings e USING (vec_id)
       |  JOIN embeddings qe ON qe.vec_id = s.q_id)""".stripMargin

  /** d32: the three-stage production retrieval pipeline. */
  private lazy val ivfPqRefinedOracleSql: String =
    s"""WITH $ivfPqRefinedCtes
       |SELECT q_id, vec_id, cos_sim, CAST(rn AS BIGINT) AS nn_rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)
       |WHERE rn <= 10 ORDER BY q_id, nn_rank""".stripMargin

  private val grams3 =
    """tok AS (SELECT doc_id, generate_subscripts(t, 1) AS i, unnest(t) AS w
      |        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t FROM documents)),
      |grams AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      |          FROM tok a
      |          JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |          JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2)""".stripMargin

  /** [[grams3]] with MATERIALIZED hints — required whenever the chain
    * rides inside a `WITH RECURSIVE` (c8): DuckDB's recursive-CTE
    * planner otherwise inlines `grams` into each of its four consumers
    * (see the d18 seeding-chain OOM note in SCALE.md).
    */
  private lazy val grams3M = grams3
    .replace("tok AS (", "tok AS MATERIALIZED (")
    .replace("grams AS (", "grams AS MATERIALIZED (")

  private val h60sql = "CAST(('0x' || substr(md5(%s), 1, 15)) AS BIGINT)"

  /** [[epochCount]] rendered as the oracle's VALUES list — derived from
    * the same val the engine explodes, so the epoch count cannot drift
    * between the two sides.
    */
  private lazy val epochValuesSql =
    (0 until epochCount).map(e => s"($e)").mkString(", ")

  /** x31/c18's oracle scaffolding: the word histogram + initial symbol
    * sequences (s0), then one (p_i, m_i, s_i) CTE triple per merge step
    * — pair counts, the deterministic argmax, and the fused sequences
    * under the SAME doubled-separator literal replace the engine uses
    * ([[graft.operators.Bpe.mergeOnce]]), so the k learned rules agree
    * exactly. Column names are step-suffixed so c18 can cross join all
    * k argmax rows into one per-word lambda.
    */
  private def bpeStagesSql(k: Int, corpusSql: String = "documents",
      cte: String = ""): String = {
    // corpusSql: the training-corpus FROM clause (an incremental entry
    // trains over a history slice, not the full table). cte: prefix on
    // every generated CTE and argmax column so TWO training chains —
    // the slice-0 fit and a scheduled re-fit — coexist in one oracle
    // statement (st32's slice-routing).
    val tab = "chr(9)"
    val stages = (1 to k).map { i =>
      val prev = s"${cte}s${i - 1}"
      s"""${cte}p$i AS (
         |  SELECT l[i] AS lft, l[i+1] AS rgt, CAST(sum(freq) AS BIGINT) AS pair_cnt
         |  FROM (SELECT string_split(seq, $tab) AS l, freq FROM $prev) t,
         |       UNNEST(range(1, len(l))) AS u(i)
         |  GROUP BY 1, 2),
         |${cte}m$i AS (SELECT lft AS ${cte}lft$i, rgt AS ${cte}rgt$i,
         |               lft || rgt AS ${cte}merged$i,
         |               pair_cnt AS ${cte}pair_cnt$i
         |        FROM ${cte}p$i ORDER BY pair_cnt DESC, lft, rgt LIMIT 1),
         |${cte}s$i AS (
         |  SELECT replace(trim(replace(
         |      $tab || replace(seq, $tab, $tab || $tab) || $tab,
         |      $tab || m.${cte}lft$i || $tab || $tab || m.${cte}rgt$i || $tab,
         |      $tab || m.${cte}merged$i || $tab), $tab), $tab || $tab, $tab) AS seq, freq
         |  FROM $prev, ${cte}m$i m)""".stripMargin
    }
    s"""${cte}w0 AS (
       |  SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS word
       |    FROM $corpusSql) t
       |  GROUP BY word ORDER BY freq DESC, word LIMIT $bpeVocabTop),
       |${cte}s0 AS (SELECT rtrim(regexp_replace(word, '(.)', '\\1' || chr(9), 'g'),
       |                    chr(9)) AS seq, freq FROM ${cte}w0),
       |${stages.mkString(",\n")}""".stripMargin
  }

  /** c18's per-word merge chain in SQL: [[graft.operators.Bpe.applyMerges]]
    * unrolled k deep over the cross-joined m_i argmax columns (`cte`
    * selects which training chain's argmax columns the replaces bind).
    */
  private def bpeChainSql(k: Int, w: String, cte: String = ""): String = {
    val tab = "chr(9)"
    val init = s"rtrim(regexp_replace($w, '(.)', '\\1' || $tab, 'g'), $tab)"
    (1 to k).foldLeft(init) { (s, i) =>
      s"replace(trim(replace($tab || replace($s, $tab, $tab || $tab) || $tab, " +
        s"$tab || ${cte}lft$i || $tab || $tab || ${cte}rgt$i || $tab, " +
        s"$tab || ${cte}merged$i || $tab), $tab), $tab || $tab, $tab)"
    }
  }

  /** The BPE-token-count SQL for one document's `toks` word list under
    * the `cte` training chain — the oracle twin of the engine's
    * codegen'd literal chain summed per doc (shared by c18/c19/st32 so
    * the pricing formula lives once).
    */
  private def bpeDocTokensSql(toks: String, cte: String = ""): String =
    s"CAST(coalesce(list_sum(list_transform($toks, w -> " +
      s"len(string_split(${bpeChainSql(bpeMerges, "w", cte)}, chr(9))))), 0) AS BIGINT)"

  private lazy val x31OracleSql: String = {
    val finals = (1 to bpeMerges).map { i =>
      s"SELECT CAST($i AS BIGINT) AS step, lft$i AS lft, rgt$i AS rgt, " +
        s"merged$i AS merged, pair_cnt$i AS pair_cnt FROM m$i"
    }.mkString("\nUNION ALL ")
    s"WITH ${bpeStagesSql(bpeMerges)}\n$finals\nORDER BY step"
  }

  private lazy val c18OracleSql: String = {
    val mJoins = (1 to bpeMerges).map(i => s"m$i").mkString(", ")
    // n_bpe_tokens computed ONCE in a nested CTE and referenced by the
    // CASE guard and the division — the per-word replace chain is the
    // expensive term, and inlining it three times tripled the oracle's
    // per-document cost (round-16 advice).
    s"""WITH ${bpeStagesSql(bpeMerges)},
       |enc AS MATERIALIZED (SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(toks, w -> len(w))), 0)
       |      AS BIGINT) AS n_syms0,
       |    ${bpeDocTokensSql("toks")} AS n_bpe_tokens
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS toks
       |        FROM documents), $mJoins)
       |SELECT doc_id, n_words, n_syms0, n_bpe_tokens,
       |  CASE WHEN n_bpe_tokens > 0
       |    THEN CAST(n_syms0 AS DOUBLE) / n_bpe_tokens END AS compression
       |FROM enc ORDER BY doc_id""".stripMargin
  }

  /** The data-derived stop-shingle cap in SQL — must re-derive
    * [[Dedup.deriveDocFreqCap]] exactly: max(50, ceil(√n)). sqrt/ceil
    * are IEEE-exact at these magnitudes, so both engines land on the
    * same integer (50 at sf0.01, 71 at sf0.1).
    */
  private val capSql =
    "greatest(50, CAST(ceil(sqrt((SELECT count(*) FROM documents))) AS BIGINT))"

  /** CTE chain producing per-document 60-bit SimHashes (`sh`) — shared by
    * the d4 and d11 oracles.
    */
  private lazy val simhashCtes =
    s"""tok AS (SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS w
       |        FROM documents),
       |h AS (SELECT doc_id, ${h60sql.format("w")} AS h FROM tok),
       |votes AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |          FROM h, range(60) r(b) GROUP BY 1, 2),
       |sh AS (SELECT doc_id,
       |         CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
       |           AS simhash
       |       FROM votes GROUP BY doc_id)""".stripMargin

  /** CTE chain producing the df-capped, LSH-candidate, exact-Jaccard
    * verified near-dup pairs (`vpairs`) — shared by the d8 and d9
    * oracles.
    */
  private val verifiedPairCtes =
    s"""$grams3,
       |capped AS (SELECT g.doc_id, g.shingle FROM grams g
       |           JOIN (SELECT shingle FROM grams GROUP BY shingle HAVING count(*) <= $capSql) ok
       |             USING (shingle)),
       |hashed AS (SELECT doc_id, ${h60sql.format("shingle")} % 1073741824 AS h FROM capped),
       |mh AS (SELECT doc_id, s, min((h * (2 * s + 1) + (s * 12345 + 678)) % 1073741824) AS m
       |       FROM hashed, range(16) r(s) GROUP BY 1, 2),
       |bands AS (SELECT doc_id, s // 4 AS band, md5(string_agg(m, ':' ORDER BY s)) AS bh
       |          FROM mh GROUP BY doc_id, s // 4),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |vsizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY 1),
       |common AS (SELECT c.doc_a, c.doc_b, count(*) AS nc
       |           FROM cand c
       |           JOIN capped a ON a.doc_id = c.doc_a
       |           JOIN capped b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |           GROUP BY 1, 2),
       |vpairs AS (SELECT doc_a, doc_b, nc AS n_common,
       |                  CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) AS jaccard
       |           FROM common JOIN vsizes sa ON sa.doc_id = doc_a
       |                       JOIN vsizes sb ON sb.doc_id = doc_b
       |           WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= 0.8)""".stripMargin

  /** d22's oracle — shared verbatim by d25 (same query served from the
    * OPTIMIZEd bucketed band layout; storage must be invisible).
    */
  private lazy val d22OracleSql =
    s"""WITH $grams3,
       |cut AS (SELECT count(*) * 4 // 5 AS c FROM documents),
       |hashed AS (SELECT doc_id, ${h60sql.format("shingle")} % 1073741824 AS h FROM grams),
       |mh AS (SELECT doc_id, s, min((h * (2 * s + 1) + (s * 12345 + 678)) % 1073741824) AS m
       |       FROM hashed, range(16) r(s) GROUP BY 1, 2),
       |bands AS (SELECT doc_id, s // 4 AS band, md5(string_agg(m, ':' ORDER BY s)) AS bh
       |          FROM mh GROUP BY doc_id, s // 4),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id, cut
       |         WHERE b.doc_id >= cut.c),
       |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
       |common AS (SELECT c.doc_a, c.doc_b, count(*) AS nc
       |           FROM cand c JOIN grams ga ON ga.doc_id = c.doc_a
       |           JOIN grams gb ON gb.doc_id = c.doc_b AND gb.shingle = ga.shingle
       |           GROUP BY 1, 2)
       |SELECT doc_a, doc_b, nc AS n_common,
       |       CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) AS jaccard
       |FROM common JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** c8's full admission replay as a CTE chain (quality gate → exact
    * stage → survivor band pairs → verified pairs → per-delta CC) —
    * shared by the c8 oracle (fate select), the c10 oracle (kept docs
    * feed the centroid assignment), and the c11 oracle (`capped =
    * true`: banding, sizes, and verification run over the
    * history-df-capped shingle universe, the d24 drop rule). Must ride
    * under `WITH RECURSIVE` (the closure) with MATERIALIZED hints
    * throughout.
    */
  private[queries] def admissionCtes(capped: Boolean,
      histLive: String = "TRUE",
      cutCte: String = "SELECT count(*) * 4 // 5 AS c FROM documents",
      deltaPred: String = "TRUE",
      scCols: String = "",
      preGate: String = "",
      gatedCte: String =
        "gated AS MATERIALIZED (SELECT doc_id, text FROM sc WHERE quality_score > 0)"): String = {
    // histLive: SQL boolean over the placeholder {ID} restricting which
    // INGESTED history docs are still LIVE (st23's streamed tombstones
    // — deleted docs' md5 rows and bands are subtracted by the zone
    // readers, so the replay must subtract them from the hist keeper
    // set and from the candidate a-side alike). cutCte/deltaPred bound
    // the admission window (c10 admits the EMBEDDED sub-corpus: cut =
    // 4/5 of the embeddings count, delta capped at the embedded range,
    // so the entry does real assignment work at every SF).
    // scCols adds passthrough columns to q0/sc (c13 carries source);
    // preGate injects extra CTEs between sc and the gate (c13's
    // threshold chain — each entry must end with ",\n"); gatedCte
    // overrides the quality gate itself (c13 gates on the per-source
    // calibrated threshold instead of raw score > 0).
    val histLiveHist = histLive.replace("{ID}", "doc_id")
    val histLiveCand = histLive.replace("{ID}", "a.doc_id")
    val src = if (capped) "cgrams" else "grams"
    val cappedCtes = if (!capped) "" else
      s"""hotc AS MATERIALIZED (SELECT shingle FROM grams, cut
         |  WHERE doc_id < cut.c GROUP BY shingle HAVING count(*) > $capSql),
         |cgrams AS MATERIALIZED (SELECT g.doc_id, g.shingle FROM grams g
         |  LEFT JOIN hotc h USING (shingle) WHERE h.shingle IS NULL),
         |""".stripMargin
    s"""cut AS MATERIALIZED ($cutCte),
       |q0 AS MATERIALIZED (
       |  SELECT doc_id, ${scCols}text,
       |    length(text) AS n_chars_len,
       |    CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens,
       |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
       |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
       |    CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS BIGINT) AS stop_cnt
       |  FROM documents, cut WHERE doc_id >= cut.c AND ($deltaPred)),
       |sc AS MATERIALIZED (SELECT doc_id, ${scCols}text,
       |    (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
       |      - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
       |      - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
       |      + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END)
       |      AS quality_score
       |  FROM q0),
       |$preGate$gatedCte,
       |hist AS MATERIALIZED (SELECT md5(text) AS m, min(doc_id) AS hk
       |  FROM documents, cut WHERE doc_id < cut.c AND ($histLiveHist) GROUP BY 1),
       |dmin AS MATERIALIZED (SELECT md5(text) AS m, min(doc_id) AS dk
       |  FROM gated GROUP BY 1),
       |ex AS MATERIALIZED (SELECT g.doc_id,
       |    CASE WHEN h.hk IS NULL THEN d.dk ELSE least(h.hk, d.dk) END AS eb
       |  FROM gated g JOIN dmin d ON md5(g.text) = d.m
       |  LEFT JOIN hist h ON h.m = d.m),
       |sv AS MATERIALIZED (SELECT doc_id FROM ex WHERE eb = doc_id),
       |$grams3M,
       |${cappedCtes}hashed AS MATERIALIZED (SELECT doc_id, ${h60sql.format("shingle")} % 1073741824 AS h FROM $src),
       |mh AS MATERIALIZED (SELECT doc_id, s, min((h * (2 * s + 1) + (s * 12345 + 678)) % 1073741824) AS m
       |  FROM hashed, range(16) r(s) GROUP BY 1, 2),
       |bands AS MATERIALIZED (SELECT doc_id, s // 4 AS band, md5(string_agg(m, ':' ORDER BY s)) AS bh
       |  FROM mh GROUP BY doc_id, s // 4),
       |cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id, cut
       |  WHERE b.doc_id IN (SELECT doc_id FROM sv)
       |    AND ((a.doc_id < cut.c AND ($histLiveCand))
       |      OR a.doc_id IN (SELECT doc_id FROM sv))),
       |sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM $src GROUP BY 1),
       |common AS MATERIALIZED (SELECT c.doc_a, c.doc_b, count(*) AS nc
       |  FROM cand c JOIN $src ga ON ga.doc_id = c.doc_a
       |  JOIN $src gb ON gb.doc_id = c.doc_b AND gb.shingle = ga.shingle
       |  GROUP BY 1, 2),
       |vp AS MATERIALIZED (SELECT doc_a, doc_b FROM common
       |  JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= 0.8),
       |verts AS MATERIALIZED (SELECT doc_id FROM sv
       |  UNION SELECT doc_a FROM vp UNION SELECT doc_b FROM vp),
       |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM vp
       |  UNION ALL SELECT doc_b, doc_a FROM vp),
       |closure(a, b) AS (
       |  SELECT doc_id, doc_id FROM verts
       |  UNION
       |  SELECT c.a, e.dst FROM closure c JOIN edges e ON c.b = e.src),
       |comp AS MATERIALIZED (SELECT a AS doc_id, min(b) AS component FROM closure GROUP BY a)""".stripMargin
  }

  private lazy val c8AdmissionCtes = admissionCtes(capped = false)

  /** st25's oracle: the streamed three-gate admission LOOP replayed in
    * one statement — c9's slice-tagged construction (a doc's history =
    * earlier slices, exact peers = gated docs of its own slice, CC per
    * slice) over the EMBEDDED window's quarters, extended with c12's
    * semantic gate PER SLICE (kept survivors SRP-bucket against
    * earlier-ingested vectors and each other, exact-cosine verified,
    * second per-slice closure) and st23's tombstone subtraction (every
    * `doc_id % 17 = 3` ingested before the slice-2 boundary is deleted
    * WITH batch 2, so it leaves the history of deciders s >= 2 — the
    * exact-keeper set, the band candidate a-side, and the SRP candidate
    * a-side alike). A matching hash proves the streamed loop's zone
    * state after round k answers exactly like a batch computation over
    * the live corpus through k, for all three modality gates at once.
    */
  private[queries] lazy val st25OracleSql =
    s"""WITH RECURSIVE
       |ee AS MATERIALIZED (SELECT count(*) AS e FROM embeddings),
       |sl AS MATERIALIZED (SELECT doc_id, text,
       |    (CASE WHEN doc_id >= e * 1 // 4 THEN 1 ELSE 0 END
       |     + CASE WHEN doc_id >= e * 2 // 4 THEN 1 ELSE 0 END
       |     + CASE WHEN doc_id >= e * 3 // 4 THEN 1 ELSE 0 END) AS s
       |  FROM documents, ee WHERE doc_id < e),
       |q0 AS MATERIALIZED (
       |  SELECT doc_id, text, s,
       |    length(text) AS n_chars_len,
       |    CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens,
       |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
       |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
       |    CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS BIGINT) AS stop_cnt
       |  FROM sl WHERE s >= 1),
       |sc AS MATERIALIZED (SELECT doc_id, text, s,
       |    (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
       |      - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
       |      - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
       |      + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END)
       |      AS quality_score
       |  FROM q0),
       |gated AS MATERIALIZED (SELECT doc_id, s, text FROM sc WHERE quality_score > 0),
       |allm AS MATERIALIZED (SELECT doc_id, s, md5(text) AS m FROM sl),
       |hist AS MATERIALIZED (SELECT g.doc_id, min(a.doc_id) AS hk
       |  FROM gated g JOIN allm a ON a.m = md5(g.text) AND a.s < g.s, ee
       |  WHERE NOT (a.doc_id % 17 = 3 AND a.doc_id < ee.e * 2 // 4 AND g.s >= 2)
       |  GROUP BY 1),
       |dmin AS MATERIALIZED (SELECT s, md5(text) AS m, min(doc_id) AS dk
       |  FROM gated GROUP BY 1, 2),
       |ex AS MATERIALIZED (SELECT g.doc_id, g.s,
       |    CASE WHEN h.hk IS NULL THEN d.dk ELSE least(h.hk, d.dk) END AS eb
       |  FROM gated g JOIN dmin d ON d.s = g.s AND d.m = md5(g.text)
       |  LEFT JOIN hist h ON h.doc_id = g.doc_id),
       |sv AS MATERIALIZED (SELECT doc_id, s FROM ex WHERE eb = doc_id),
       |$grams3M,
       |hashed AS MATERIALIZED (SELECT doc_id, ${h60sql.format("shingle")} % 1073741824 AS h FROM grams),
       |mh AS MATERIALIZED (SELECT doc_id, s, min((h * (2 * s + 1) + (s * 12345 + 678)) % 1073741824) AS m
       |  FROM hashed, range(16) r(s) GROUP BY 1, 2),
       |bands AS MATERIALIZED (SELECT doc_id, s // 4 AS band, md5(string_agg(m, ':' ORDER BY s)) AS bh
       |  FROM mh GROUP BY doc_id, s // 4),
       |cand AS MATERIALIZED (SELECT DISTINCT v.s AS s, a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM bands a JOIN bands b2
       |    ON a.band = b2.band AND a.bh = b2.bh AND a.doc_id < b2.doc_id
       |  JOIN sv v ON v.doc_id = b2.doc_id
       |  JOIN sl sa ON sa.doc_id = a.doc_id
       |  LEFT JOIN sv va ON va.doc_id = a.doc_id AND va.s = v.s, ee
       |  WHERE (sa.s < v.s
       |      AND NOT (a.doc_id % 17 = 3 AND a.doc_id < ee.e * 2 // 4 AND v.s >= 2))
       |    OR va.doc_id IS NOT NULL),
       |sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
       |common AS MATERIALIZED (SELECT c.s, c.doc_a, c.doc_b, count(*) AS nc
       |  FROM cand c JOIN grams ga ON ga.doc_id = c.doc_a
       |  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.shingle = ga.shingle
       |  GROUP BY 1, 2, 3),
       |vp AS MATERIALIZED (SELECT s, doc_a, doc_b FROM common
       |  JOIN sizes sa2 ON sa2.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(nc AS DOUBLE) / (sa2.n + sb.n - nc) >= $jaccardThreshold),
       |verts AS MATERIALIZED (SELECT s, doc_id FROM sv
       |  UNION SELECT s, doc_a FROM vp UNION SELECT s, doc_b FROM vp),
       |edges AS MATERIALIZED (SELECT s, doc_a AS src, doc_b AS dst FROM vp
       |  UNION ALL SELECT s, doc_b, doc_a FROM vp),
       |closure(s, a, b) AS (
       |  SELECT s, doc_id, doc_id FROM verts
       |  UNION
       |  SELECT c.s, c.a, e.dst FROM closure c JOIN edges e ON e.s = c.s AND e.src = c.b),
       |comp AS MATERIALIZED (SELECT s, a AS doc_id, min(b) AS component FROM closure GROUP BY 1, 2),
       |keptd AS MATERIALIZED (SELECT v.doc_id, v.s FROM sv v
       |  JOIN sc ON sc.doc_id = v.doc_id
       |  JOIN comp c ON c.doc_id = v.doc_id AND c.s = v.s
       |  WHERE sc.quality_score > 0 AND c.component = v.doc_id),
       |$srpBucketCtes,
       |scand AS MATERIALIZED (SELECT DISTINCT k.s AS s, a.vec_id AS va, b.vec_id AS vb
       |  FROM bucketed a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  JOIN keptd k ON k.doc_id = b.vec_id
       |  JOIN sl sa3 ON sa3.doc_id = a.vec_id
       |  LEFT JOIN keptd ka ON ka.doc_id = a.vec_id AND ka.s = k.s, ee
       |  WHERE (sa3.s < k.s
       |      AND NOT (a.vec_id % 17 = 3 AND a.vec_id < ee.e * 2 // 4 AND k.s >= 2))
       |    OR ka.doc_id IS NOT NULL),
       |sn AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                          CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |svp AS MATERIALIZED (SELECT s, va, vb FROM scand
       |  JOIN sn a ON a.vec_id = va JOIN sn b ON b.vec_id = vb
       |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $semanticCosThreshold),
       |sverts AS MATERIALIZED (SELECT s, doc_id FROM keptd
       |  UNION SELECT s, va FROM svp UNION SELECT s, vb FROM svp),
       |sedges AS MATERIALIZED (SELECT s, va AS src, vb AS dst FROM svp
       |  UNION ALL SELECT s, vb, va FROM svp),
       |closure2(s, a, b) AS (
       |  SELECT s, doc_id, doc_id FROM sverts
       |  UNION
       |  SELECT c.s, c.a, e.dst FROM closure2 c JOIN sedges e ON e.s = c.s AND e.src = c.b),
       |comp2 AS MATERIALIZED (SELECT s, a AS doc_id, min(b) AS component
       |  FROM closure2 GROUP BY 1, 2)
       |SELECT sc.doc_id, CAST(sc.s AS BIGINT) AS round,
       |  CASE WHEN sc.quality_score IS NULL OR sc.quality_score <= 0 THEN 'low_quality'
       |       WHEN ex.eb < sc.doc_id THEN 'exact_dup'
       |       WHEN comp.component < sc.doc_id THEN 'near_dup'
       |       WHEN comp2.component < sc.doc_id THEN 'semantic_dup'
       |       ELSE 'kept' END AS fate,
       |  CASE WHEN sc.quality_score IS NULL OR sc.quality_score <= 0 THEN NULL
       |       WHEN ex.eb < sc.doc_id THEN ex.eb
       |       WHEN comp.component < sc.doc_id THEN comp.component
       |       WHEN comp2.component < sc.doc_id THEN comp2.component
       |       ELSE NULL END AS dup_of,
       |  sc.quality_score
       |FROM sc LEFT JOIN ex ON ex.doc_id = sc.doc_id
       |LEFT JOIN comp ON comp.doc_id = sc.doc_id AND comp.s = sc.s
       |LEFT JOIN comp2 ON comp2.doc_id = sc.doc_id AND comp2.s = sc.s
       |ORDER BY sc.doc_id""".stripMargin

  /** st29/st30's oracle: st25's slice-tagged three-gate loop replay
    * with (a) c13's calibration-threshold CTE swapped into the quality
    * gate (thresholds trained over the slice-0 history — the refresh
    * the engine persists before the stream opens), and (b) c14's
    * assignment + per-cluster quota + packing chain appended PER SLICE
    * (centroids likewise slice-0-trained; each round packs its own
    * kept-and-budgeted docs from offset 0 — the per-batch shard). One
    * hash-compared relation: every decided doc's fate plus its shard
    * row (NULLs when not selected).
    *
    * `refresh = true` (st30): the scheduled mid-loop re-fit replayed —
    * a SECOND threshold table and a SECOND (prefix-`r`) Lloyd chain,
    * both over the grown LIVE history (slices 0-2 minus batch-2
    * tombstones), routed by slice: rounds 1-2 gate and assign with the
    * slice-0 fit, round 3 with the refreshed one. A green hash proves
    * exactly which fit served which round.
    */
  private[queries] lazy val st29OracleSql = productionOracleSql(refresh = false)
  private[queries] lazy val st30OracleSql = productionOracleSql(refresh = true)

  /** st32's oracle: the tokenizer loop replayed in one statement —
    * BOTH training chains generated by [[bpeStagesSql]] under distinct
    * CTE prefixes (`a` = the slice-0 fit; `r` = the batch-3 re-fit
    * over LIVE slices 0-2, i.e. minus the batch-2 tombstones — exactly
    * the md5 zone's keeper state below the delta's min id at the
    * trigger), then every insert of rounds 1-3 priced under its
    * round's chain. A green hash proves which merge table served
    * which round, token count for token count.
    */
  private[queries] lazy val st32OracleSql =
    s"""WITH
       |ee AS MATERIALIZED (SELECT count(*) AS e FROM embeddings),
       |sl AS MATERIALIZED (SELECT doc_id, text,
       |    (CASE WHEN doc_id >= e * 1 // 4 THEN 1 ELSE 0 END
       |     + CASE WHEN doc_id >= e * 2 // 4 THEN 1 ELSE 0 END
       |     + CASE WHEN doc_id >= e * 3 // 4 THEN 1 ELSE 0 END) AS s
       |  FROM documents, ee WHERE doc_id < e),
       |${bpeStagesSql(bpeMerges, corpusSql = "sl WHERE s = 0", cte = "a")},
       |${bpeStagesSql(bpeMerges,
          corpusSql =
            "sl, ee WHERE s <= 2 AND NOT (doc_id % 17 = 3 AND doc_id < ee.e * 2 // 4)",
          cte = "r")},
       |enc AS MATERIALIZED (SELECT doc_id, s,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(toks, w -> len(w))), 0)
       |      AS BIGINT) AS n_syms0,
       |    CASE WHEN s <= 2 THEN ${bpeDocTokensSql("toks", "a")}
       |         ELSE ${bpeDocTokensSql("toks", "r")} END AS n_bpe_tokens
       |  FROM (SELECT doc_id, s, regexp_extract_all(lower(text), '\\w+') AS toks
       |        FROM sl WHERE s >= 1),
       |  ${(1 to bpeMerges).map(i => s"am$i").mkString(", ")},
       |  ${(1 to bpeMerges).map(i => s"rm$i").mkString(", ")})
       |SELECT doc_id, CAST(s AS BIGINT) AS round, n_words, n_syms0, n_bpe_tokens,
       |  CASE WHEN n_bpe_tokens > 0
       |    THEN CAST(n_syms0 AS DOUBLE) / n_bpe_tokens END AS compression
       |FROM enc ORDER BY doc_id""".stripMargin

  /** st31: the five-gate variant — c17's media chain inserted PER
    * SLICE between the four-gate fates and the shard stages (audio
    * fingerprints rebuilt bit-for-bit, slice-tagged pairs with st25's
    * tombstone live-rule, a third recursive closure, kept→media_dup
    * rewrite) — the shard tail then packs the five-gate survivors.
    */
  private[queries] lazy val st31OracleSql =
    productionOracleSql(refresh = false, media = true)

  private def productionOracleSql(refresh: Boolean,
      media: Boolean = false): String = {
    val ftName = if (media) "ftm" else "ft"
    val mediaCtes = if (!media) "" else
      s"""keptp AS MATERIALIZED (SELECT doc_id, s FROM ft WHERE fate = 'kept'),
         |aud AS MATERIALIZED (SELECT d2a.doc_id, 256 + d2a.doc_id % 1000 AS n
         |  FROM documents d2a, ee WHERE d2a.doc_id % 3 = 1
         |    AND d2a.doc_id % 34 <> 0 AND d2a.doc_id < ee.e),
         |audv AS MATERIALIZED (
         |  SELECT aud.doc_id, (r.i * 61) // aud.n AS seg,
         |         ((r.i * 2654435761 + aud.doc_id) % 65536) - 32768 AS sm
         |  FROM aud, range(1256) r(i) WHERE r.i < aud.n),
         |aude AS MATERIALIZED (SELECT doc_id, seg, CAST(sum(sm * sm) AS BIGINT) AS energy
         |  FROM audv GROUP BY 1, 2),
         |audd AS MATERIALIZED (SELECT doc_id, seg, energy,
         |    lag(energy) OVER (PARTITION BY doc_id ORDER BY seg) AS prev
         |  FROM aude),
         |audh AS MATERIALIZED (SELECT doc_id,
         |    CAST(sum(CASE WHEN energy > prev THEN (CAST(1 AS BIGINT) << (seg - 1))
         |             ELSE 0 END) AS BIGINT) AS ahash
         |  FROM audd WHERE seg >= 1 GROUP BY doc_id),
         |mp AS MATERIALIZED (SELECT DISTINCT k.s AS s, x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM audh x JOIN audh y ON x.doc_id < y.doc_id
         |  JOIN keptp k ON k.doc_id = y.doc_id
         |  JOIN sl sx ON sx.doc_id = x.doc_id
         |  LEFT JOIN keptp kx ON kx.doc_id = x.doc_id AND kx.s = k.s, ee
         |  WHERE bit_count(xor(x.ahash, y.ahash)) <= $audioHammingMax
         |    AND ((sx.s < k.s
         |        AND NOT (x.doc_id % 17 = 3 AND x.doc_id < ee.e * 2 // 4 AND k.s >= 2))
         |      OR kx.doc_id IS NOT NULL)),
         |mverts AS MATERIALIZED (SELECT s, doc_id FROM keptp
         |  UNION SELECT s, doc_a FROM mp UNION SELECT s, doc_b FROM mp),
         |medges AS MATERIALIZED (SELECT s, doc_a AS src, doc_b AS dst FROM mp
         |  UNION ALL SELECT s, doc_b, doc_a FROM mp),
         |closure3(s, a, b) AS (
         |  SELECT s, doc_id, doc_id FROM mverts
         |  UNION
         |  SELECT c.s, c.a, e.dst FROM closure3 c JOIN medges e ON e.s = c.s AND e.src = c.b),
         |comp3 AS MATERIALIZED (SELECT s, a AS doc_id, min(b) AS component
         |  FROM closure3 GROUP BY 1, 2),
         |ftm AS MATERIALIZED (SELECT f.doc_id, f.round, f.s,
         |    CASE WHEN f.fate = 'kept' AND c3.component < f.doc_id
         |         THEN 'media_dup' ELSE f.fate END AS fate,
         |    CASE WHEN f.fate = 'kept' AND c3.component < f.doc_id
         |         THEN c3.component ELSE f.dup_of END AS dup_of,
         |    f.quality_score
         |  FROM ft f LEFT JOIN comp3 c3 ON c3.doc_id = f.doc_id AND c3.s = f.s),
         |""".stripMargin
    val calth1 = if (!refresh) "" else
      s"""hq1 AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    length(text) AS n_chars_len,
         |    CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens,
         |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
         |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
         |    CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS BIGINT) AS stop_cnt
         |  FROM sl, ee WHERE s <= 2
         |    AND NOT (doc_id % 17 = 3 AND doc_id < ee.e * 2 // 4)),
         |hsc1 AS MATERIALIZED (SELECT doc_id, source,
         |    (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
         |      - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
         |      - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
         |      + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END)
         |      AS quality_score
         |  FROM hq1),
         |calth1 AS MATERIALIZED (SELECT source, quality_score AS thr FROM (
         |    SELECT source, quality_score,
         |      row_number() OVER (PARTITION BY source
         |        ORDER BY quality_score, doc_id) AS rn,
         |      count(*) OVER (PARTITION BY source) AS n
         |    FROM hsc1 WHERE quality_score IS NOT NULL) t
         |  WHERE rn = (n + 1) // 2),
         |""".stripMargin
    val qpCte = if (!refresh)
      s"""qp AS MATERIALIZED (SELECT sc.doc_id,
         |    coalesce(CASE WHEN t.thr IS NULL THEN sc.quality_score > 0
         |                  ELSE sc.quality_score >= t.thr END, FALSE) AS q_pass
         |  FROM sc LEFT JOIN calth t ON t.source = sc.source)""".stripMargin
    else
      s"""qp AS MATERIALIZED (SELECT sc.doc_id,
         |    coalesce(CASE WHEN sc.s >= 3 THEN
         |        CASE WHEN t1.thr IS NULL THEN sc.quality_score > 0
         |             ELSE sc.quality_score >= t1.thr END
         |      ELSE
         |        CASE WHEN t0.thr IS NULL THEN sc.quality_score > 0
         |             ELSE sc.quality_score >= t0.thr END END, FALSE) AS q_pass
         |  FROM sc LEFT JOIN calth t0 ON t0.source = sc.source
         |  LEFT JOIN calth1 t1 ON t1.source = sc.source)""".stripMargin
    val asgCtes = if (!refresh)
      s"""kqd AS MATERIALIZED (SELECT e3.vec_id,
         |    CAST(generate_subscripts(e3.embedding, 1) AS BIGINT) AS dim,
         |    CAST(floor((CAST(unnest(e3.embedding) AS DOUBLE) + 1.0) * 1048576.0) AS BIGINT) AS v
         |  FROM embeddings e3 JOIN keptf k ON k.doc_id = e3.vec_id),
         |dd AS MATERIALIZED (SELECT q.vec_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS dist
         |  FROM kqd q JOIN c2 c USING (dim) GROUP BY q.vec_id, c.cid),
         |asg AS MATERIALIZED (SELECT vec_id AS doc_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cid) AS rn FROM dd)
         |  WHERE rn = 1)""".stripMargin
    else
      s"""hembr AS MATERIALIZED (SELECT e4.vec_id, e4.embedding
         |  FROM embeddings e4, ee WHERE e4.vec_id < ee.e * 3 // 4
         |    AND NOT (e4.vec_id % 17 = 3 AND e4.vec_id < ee.e * 2 // 4)),
         |${kmeansCtes("hembr", prefix = "r")},
         |kqd AS MATERIALIZED (SELECT e3.vec_id, k.s,
         |    CAST(generate_subscripts(e3.embedding, 1) AS BIGINT) AS dim,
         |    CAST(floor((CAST(unnest(e3.embedding) AS DOUBLE) + 1.0) * 1048576.0) AS BIGINT) AS v
         |  FROM embeddings e3 JOIN keptf k ON k.doc_id = e3.vec_id),
         |dd AS MATERIALIZED (SELECT q.vec_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS dist
         |  FROM kqd q JOIN c2 c USING (dim) WHERE q.s <= 2 GROUP BY q.vec_id, c.cid),
         |ddr AS MATERIALIZED (SELECT q.vec_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS dist
         |  FROM kqd q JOIN rc2 c USING (dim) WHERE q.s >= 3 GROUP BY q.vec_id, c.cid),
         |asg AS MATERIALIZED (
         |  SELECT vec_id AS doc_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cid) AS rn FROM dd) WHERE rn = 1
         |  UNION ALL
         |  SELECT vec_id AS doc_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cid) AS rn FROM ddr) WHERE rn = 1)""".stripMargin
    s"""WITH RECURSIVE
       |ee AS MATERIALIZED (SELECT count(*) AS e FROM embeddings),
       |sl AS MATERIALIZED (SELECT doc_id, source, text,
       |    (CASE WHEN doc_id >= e * 1 // 4 THEN 1 ELSE 0 END
       |     + CASE WHEN doc_id >= e * 2 // 4 THEN 1 ELSE 0 END
       |     + CASE WHEN doc_id >= e * 3 // 4 THEN 1 ELSE 0 END) AS s
       |  FROM documents, ee WHERE doc_id < e),
       |hq AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    length(text) AS n_chars_len,
       |    CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens,
       |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
       |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
       |    CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS BIGINT) AS stop_cnt
       |  FROM sl WHERE s = 0),
       |hsc AS MATERIALIZED (SELECT doc_id, source,
       |    (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
       |      - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
       |      - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
       |      + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END)
       |      AS quality_score
       |  FROM hq),
       |calth AS MATERIALIZED (SELECT source, quality_score AS thr FROM (
       |    SELECT source, quality_score,
       |      row_number() OVER (PARTITION BY source
       |        ORDER BY quality_score, doc_id) AS rn,
       |      count(*) OVER (PARTITION BY source) AS n
       |    FROM hsc WHERE quality_score IS NOT NULL) t
       |  WHERE rn = (n + 1) // 2),
       |${calth1}q0 AS MATERIALIZED (
       |  SELECT doc_id, source, text, s,
       |    length(text) AS n_chars_len,
       |    CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens,
       |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
       |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
       |    CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS BIGINT) AS stop_cnt
       |  FROM sl WHERE s >= 1),
       |sc AS MATERIALIZED (SELECT doc_id, source, text, s,
       |    (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
       |      - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
       |      - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
       |      + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END)
       |      AS quality_score
       |  FROM q0),
       |$qpCte,
       |gated AS MATERIALIZED (SELECT sc.doc_id, sc.s, sc.text
       |  FROM sc JOIN qp ON qp.doc_id = sc.doc_id WHERE qp.q_pass),
       |allm AS MATERIALIZED (SELECT doc_id, s, md5(text) AS m FROM sl),
       |hist AS MATERIALIZED (SELECT g.doc_id, min(a.doc_id) AS hk
       |  FROM gated g JOIN allm a ON a.m = md5(g.text) AND a.s < g.s, ee
       |  WHERE NOT (a.doc_id % 17 = 3 AND a.doc_id < ee.e * 2 // 4 AND g.s >= 2)
       |  GROUP BY 1),
       |dmin AS MATERIALIZED (SELECT s, md5(text) AS m, min(doc_id) AS dk
       |  FROM gated GROUP BY 1, 2),
       |ex AS MATERIALIZED (SELECT g.doc_id, g.s,
       |    CASE WHEN h.hk IS NULL THEN d.dk ELSE least(h.hk, d.dk) END AS eb
       |  FROM gated g JOIN dmin d ON d.s = g.s AND d.m = md5(g.text)
       |  LEFT JOIN hist h ON h.doc_id = g.doc_id),
       |sv AS MATERIALIZED (SELECT doc_id, s FROM ex WHERE eb = doc_id),
       |$grams3M,
       |hashed AS MATERIALIZED (SELECT doc_id, ${h60sql.format("shingle")} % 1073741824 AS h FROM grams),
       |mh AS MATERIALIZED (SELECT doc_id, s, min((h * (2 * s + 1) + (s * 12345 + 678)) % 1073741824) AS m
       |  FROM hashed, range(16) r(s) GROUP BY 1, 2),
       |bands AS MATERIALIZED (SELECT doc_id, s // 4 AS band, md5(string_agg(m, ':' ORDER BY s)) AS bh
       |  FROM mh GROUP BY doc_id, s // 4),
       |cand AS MATERIALIZED (SELECT DISTINCT v.s AS s, a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM bands a JOIN bands b2
       |    ON a.band = b2.band AND a.bh = b2.bh AND a.doc_id < b2.doc_id
       |  JOIN sv v ON v.doc_id = b2.doc_id
       |  JOIN sl sa ON sa.doc_id = a.doc_id
       |  LEFT JOIN sv va ON va.doc_id = a.doc_id AND va.s = v.s, ee
       |  WHERE (sa.s < v.s
       |      AND NOT (a.doc_id % 17 = 3 AND a.doc_id < ee.e * 2 // 4 AND v.s >= 2))
       |    OR va.doc_id IS NOT NULL),
       |sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
       |common AS MATERIALIZED (SELECT c.s, c.doc_a, c.doc_b, count(*) AS nc
       |  FROM cand c JOIN grams ga ON ga.doc_id = c.doc_a
       |  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.shingle = ga.shingle
       |  GROUP BY 1, 2, 3),
       |vp AS MATERIALIZED (SELECT s, doc_a, doc_b FROM common
       |  JOIN sizes sa2 ON sa2.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(nc AS DOUBLE) / (sa2.n + sb.n - nc) >= $jaccardThreshold),
       |verts AS MATERIALIZED (SELECT s, doc_id FROM sv
       |  UNION SELECT s, doc_a FROM vp UNION SELECT s, doc_b FROM vp),
       |edges AS MATERIALIZED (SELECT s, doc_a AS src, doc_b AS dst FROM vp
       |  UNION ALL SELECT s, doc_b, doc_a FROM vp),
       |closure(s, a, b) AS (
       |  SELECT s, doc_id, doc_id FROM verts
       |  UNION
       |  SELECT c.s, c.a, e.dst FROM closure c JOIN edges e ON e.s = c.s AND e.src = c.b),
       |comp AS MATERIALIZED (SELECT s, a AS doc_id, min(b) AS component FROM closure GROUP BY 1, 2),
       |keptd AS MATERIALIZED (SELECT v.doc_id, v.s FROM sv v
       |  JOIN qp ON qp.doc_id = v.doc_id
       |  JOIN comp c ON c.doc_id = v.doc_id AND c.s = v.s
       |  WHERE qp.q_pass AND c.component = v.doc_id),
       |$srpBucketCtes,
       |scand AS MATERIALIZED (SELECT DISTINCT k.s AS s, a.vec_id AS va, b.vec_id AS vb
       |  FROM bucketed a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  JOIN keptd k ON k.doc_id = b.vec_id
       |  JOIN sl sa3 ON sa3.doc_id = a.vec_id
       |  LEFT JOIN keptd ka ON ka.doc_id = a.vec_id AND ka.s = k.s, ee
       |  WHERE (sa3.s < k.s
       |      AND NOT (a.vec_id % 17 = 3 AND a.vec_id < ee.e * 2 // 4 AND k.s >= 2))
       |    OR ka.doc_id IS NOT NULL),
       |sn AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                          CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |svp AS MATERIALIZED (SELECT s, va, vb FROM scand
       |  JOIN sn a ON a.vec_id = va JOIN sn b ON b.vec_id = vb
       |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $semanticCosThreshold),
       |sverts AS MATERIALIZED (SELECT s, doc_id FROM keptd
       |  UNION SELECT s, va FROM svp UNION SELECT s, vb FROM svp),
       |sedges AS MATERIALIZED (SELECT s, va AS src, vb AS dst FROM svp
       |  UNION ALL SELECT s, vb, va FROM svp),
       |closure2(s, a, b) AS (
       |  SELECT s, doc_id, doc_id FROM sverts
       |  UNION
       |  SELECT c.s, c.a, e.dst FROM closure2 c JOIN sedges e ON e.s = c.s AND e.src = c.b),
       |comp2 AS MATERIALIZED (SELECT s, a AS doc_id, min(b) AS component
       |  FROM closure2 GROUP BY 1, 2),
       |ft AS MATERIALIZED (SELECT sc.doc_id, CAST(sc.s AS BIGINT) AS round, sc.s,
       |  CASE WHEN NOT qp.q_pass THEN 'low_quality'
       |       WHEN ex.eb < sc.doc_id THEN 'exact_dup'
       |       WHEN comp.component < sc.doc_id THEN 'near_dup'
       |       WHEN comp2.component < sc.doc_id THEN 'semantic_dup'
       |       ELSE 'kept' END AS fate,
       |  CASE WHEN NOT qp.q_pass THEN NULL
       |       WHEN ex.eb < sc.doc_id THEN ex.eb
       |       WHEN comp.component < sc.doc_id THEN comp.component
       |       WHEN comp2.component < sc.doc_id THEN comp2.component
       |       ELSE NULL END AS dup_of,
       |  sc.quality_score
       |FROM sc JOIN qp ON qp.doc_id = sc.doc_id
       |LEFT JOIN ex ON ex.doc_id = sc.doc_id
       |LEFT JOIN comp ON comp.doc_id = sc.doc_id AND comp.s = sc.s
       |LEFT JOIN comp2 ON comp2.doc_id = sc.doc_id AND comp2.s = sc.s),
       |${mediaCtes}keptf AS MATERIALIZED (SELECT doc_id, s, quality_score FROM $ftName
       |  WHERE fate = 'kept'),
       |hemb AS MATERIALIZED (SELECT e2.vec_id, e2.embedding
       |  FROM embeddings e2, ee WHERE e2.vec_id < ee.e // 4),
       |${kmeansCtes("hemb")},
       |$asgCtes,
       |clx AS MATERIALIZED (SELECT k.doc_id, k.s, asg.cid, k.quality_score,
       |    q0.n_tokens
       |  FROM keptf k JOIN asg USING (doc_id)
       |  JOIN q0 ON q0.doc_id = k.doc_id),
       |bud AS MATERIALIZED (SELECT s,
       |    CAST(sum(n_tokens) // (2 * count(DISTINCT cid)) AS BIGINT) AS budget
       |  FROM clx GROUP BY s),
       |sel AS MATERIALIZED (SELECT rw.doc_id, rw.s, rw.cid, rw.n_tokens FROM (
       |    SELECT clx.*, sum(n_tokens) OVER (PARTITION BY s, cid
       |      ORDER BY quality_score DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM clx) rw
       |  JOIN bud ON bud.s = rw.s WHERE rw.cum <= bud.budget),
       |o AS MATERIALIZED (SELECT doc_id, s, cid, n_tokens,
       |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY s ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |  FROM sel)
       |SELECT ft.doc_id, ft.round, ft.fate, ft.dup_of, ft.quality_score,
       |  o.cid, o.n_tokens, o.start_off,
       |  o.start_off // 2048 AS seq_start,
       |  CASE WHEN o.n_tokens = 0 THEN o.start_off // 2048
       |       ELSE (o.start_off + o.n_tokens - 1) // 2048 END AS seq_end
       |FROM $ftName ft LEFT JOIN o ON o.doc_id = ft.doc_id
       |ORDER BY ft.doc_id""".stripMargin
  }

  /** The admission fate SELECT shared by c8 (uncapped), c11 (capped
    * near-dup universe), and st23 (tombstoned history) — only the CTE
    * chain differs.
    */
  private[queries] lazy val admissionFateSelect =
    """SELECT sc.doc_id,
      |  CASE WHEN sc.quality_score IS NULL OR sc.quality_score <= 0 THEN 'low_quality'
      |       WHEN ex.eb < sc.doc_id THEN 'exact_dup'
      |       WHEN comp.component < sc.doc_id THEN 'near_dup'
      |       ELSE 'kept' END AS fate,
      |  CASE WHEN sc.quality_score IS NULL OR sc.quality_score <= 0 THEN NULL
      |       WHEN ex.eb < sc.doc_id THEN ex.eb
      |       WHEN comp.component < sc.doc_id THEN comp.component
      |       ELSE NULL END AS dup_of,
      |  sc.quality_score
      |FROM sc LEFT JOIN ex ON ex.doc_id = sc.doc_id
      |LEFT JOIN comp ON comp.doc_id = sc.doc_id
      |ORDER BY sc.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "x18_chunk_split" ->
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
        |             FROM documents),
        |s AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0),
        |st AS (SELECT doc_id, toks, n, unnest(range(0, CAST(n AS BIGINT), 24)) AS strt
        |       FROM s),
        |c AS (SELECT doc_id, CAST(strt // 24 AS BIGINT) AS chunk_idx,
        |        toks[strt + 1 : least(strt + 32, n)] AS chunk_toks
        |      FROM st)
        |SELECT doc_id, chunk_idx, CAST(len(chunk_toks) AS BIGINT) AS n_tok,
        |  array_to_string(chunk_toks, ' ') AS chunk
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "d17_passage_dedup" ->
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
        |             FROM documents),
        |s AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0),
        |st AS (SELECT doc_id, toks, n, unnest(range(0, CAST(n AS BIGINT), 4)) AS strt
        |       FROM s),
        |p AS (SELECT doc_id, CAST(strt // 4 AS BIGINT) AS chunk_idx,
        |        array_to_string(toks[strt + 1 : least(strt + 4, n)], ' ') AS chunk
        |      FROM st),
        |f AS (SELECT *, row_number() OVER (PARTITION BY chunk
        |                                   ORDER BY doc_id, chunk_idx) AS rn
        |      FROM p)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_passages,
        |  CAST(coalesce(sum(CASE WHEN rn > 1 THEN 1 END), 0) AS BIGINT) AS n_removed,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
        |                      ORDER BY chunk_idx), '') AS clean_text
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x17_tfidf_keywords" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |d AS (SELECT doc_id, token, tf,
        |        CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df
        |      FROM tf),
        |s AS (SELECT doc_id, token, tf, df,
        |        tf * (SELECT CAST(count(*) AS BIGINT) FROM documents) // df AS score
        |      FROM d),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                                   ORDER BY score DESC, token) AS kw_rank
        |      FROM s)
        |SELECT doc_id, CAST(kw_rank AS BIGINT) AS kw_rank, token, tf, df, score
        |FROM r WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank""".stripMargin,
    "x13_pii_redact" ->
      """WITH inj AS (SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
        |         || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT)
        |    AS n_ips,
        |  CAST(len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')) AS redacted_md5
        |FROM inj ORDER BY doc_id""".stripMargin,
    "x14_dataset_mix" ->
      s"""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |rates AS (SELECT lang,
         |    CAST((SELECT min(n) FROM counts) AS DOUBLE) / n AS keep_rate
         |  FROM counts)
         |SELECT d.doc_id, d.lang, r.keep_rate
         |FROM documents d JOIN rates r USING (lang)
         |WHERE CAST(${h60sql.format("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE)
         |        < r.keep_rate * 1000000.0
         |ORDER BY doc_id""".stripMargin,
    "x10_repetition" ->
      """WITH tok AS (SELECT doc_id, generate_subscripts(t, 1) AS i, unnest(t) AS w
        |             FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
        |                   FROM documents)),
        |bi AS (SELECT a.doc_id, a.w || ' ' || b.w AS bigram
        |       FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |pg AS (SELECT doc_id, bigram, count(*) AS cnt FROM bi GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top_cnt,
        |          CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |          CAST(count(*) AS BIGINT) AS n_distinct FROM pg GROUP BY doc_id)
        |SELECT doc_id, top_cnt, n_bigrams,
        |  CAST(top_cnt AS DOUBLE) / n_bigrams AS top_bigram_frac,
        |  CAST(n_bigrams - n_distinct AS DOUBLE) / n_bigrams AS dup_bigram_frac,
        |  (CAST(top_cnt AS DOUBLE) / n_bigrams > 0.18
        |    OR CAST(n_bigrams - n_distinct AS DOUBLE) / n_bigrams > 0.5) AS flagged
        |FROM agg ORDER BY doc_id""".stripMargin,
    "c2_training_corpus" ->
      """WITH q AS (
        |  SELECT doc_id, text,
        |    (CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS DOUBLE)
        |       / len(regexp_extract_all(lower(text), '\w+'))) * 5.0
        |    - (CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / length(text)) * 3.0
        |    - (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)) * 2.0
        |    + CASE WHEN length(text) BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END AS score
        |  FROM documents),
        |kept AS (SELECT doc_id, text FROM q WHERE score > 0),
        |ded AS (SELECT doc_id, text FROM (
        |    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
        |    FROM kept) WHERE doc_id = keeper),
        |sp AS (SELECT
        |    CASE WHEN CAST(('0x' || substr(md5('split:' || doc_id), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
        |         WHEN CAST(('0x' || substr(md5('split:' || doc_id), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split,
        |    len(regexp_extract_all(lower(text), '\w+')) AS ntok,
        |    length(text) AS nch
        |  FROM ded)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(sum(nch) AS BIGINT) AS n_chars
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,
    "x20_group_sample" ->
      s"""WITH h AS (SELECT lang, source, doc_id,
         |    ${h60sql.format("'gs:' || CAST(doc_id AS VARCHAR)")} AS hk
         |  FROM documents),
         |r AS (SELECT lang, source, doc_id,
         |    row_number() OVER (PARTITION BY lang, source ORDER BY hk, doc_id) AS rk
         |  FROM h)
         |SELECT lang, source, doc_id, rk FROM r WHERE rk <= 5
         |ORDER BY lang, source, rk""".stripMargin,
    "x11_stratified_sample" ->
      s"""SELECT doc_id, lang,
         |  ${h60sql.format("'samp:' || CAST(doc_id AS VARCHAR)")} % 1000 AS bucket
         |FROM documents
         |WHERE ${h60sql.format("'samp:' || CAST(doc_id AS VARCHAR)")} % 1000
         |        < (CASE WHEN lang = 'en' THEN 100 ELSE 500 END)
         |ORDER BY doc_id""".stripMargin,
    "x12_sequence_pack" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (SELECT doc_id, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |  FROM t)
        |SELECT doc_id, n_tokens, start_off,
        |  start_off // 2048 AS seq_start,
        |  CASE WHEN n_tokens = 0 THEN start_off // 2048
        |       ELSE (start_off + n_tokens - 1) // 2048 END AS seq_end
        |FROM o ORDER BY doc_id""".stripMargin,
    "d10_quantize_embeddings" ->
      """WITH e AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim)
        |SELECT e.vec_id, e.dim,
        |  CAST(CASE WHEN s.mx = s.mn THEN 0
        |            ELSE least(255, floor((e.x - s.mn) * 255.0 / (s.mx - s.mn))) END
        |       AS BIGINT) AS code
        |FROM e JOIN s USING (dim) ORDER BY e.vec_id, e.dim""".stripMargin,
    "d15_semantic_dedup" ->
      s"""WITH RECURSIVE nc AS (
         |  SELECT coalesce(min(c), 4096) AS nc FROM range(4097) r(c)
         |  WHERE c >= 8 AND c*c*64 >= (SELECT count(*) FROM embeddings)),
         |centroids AS (
         |  SELECT c, list((${h60sql.format("'cent' || c || ':' || i")} % 2001 - 1000) / 1000.0
         |                 ORDER BY i) AS w
         |  FROM range(4096) rc(c), range(64) ri(i), nc WHERE c < nc.nc GROUP BY c),
         |n AS (SELECT vec_id,
         |             (SELECT c FROM centroids
         |              ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), w) DESC, c
         |              LIMIT 1) AS cell,
         |             CAST(embedding AS DOUBLE[]) AS v,
         |             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
         |      FROM embeddings e),
         |vp AS (SELECT a.vec_id AS va, b.vec_id AS vb
         |       FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |       WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $semanticCosThreshold),
         |edges AS (SELECT va AS src, vb AS dst FROM vp
         |          UNION ALL SELECT vb, va FROM vp),
         |closure(a, b) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT c.a, e.dst FROM closure c JOIN edges e ON c.b = e.src),
         |comp AS (SELECT a AS vec_id, min(b) AS component FROM closure GROUP BY a),
         |csize AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
         |SELECT c.vec_id, c.component, s.cluster_size,
         |       (c.vec_id = c.component) AS is_keeper
         |FROM comp c JOIN csize s USING (component)
         |ORDER BY vec_id""".stripMargin,
    "d7_embedding_neardup" ->
      s"""WITH nc AS (
         |  SELECT coalesce(min(c), 4096) AS nc FROM range(4097) r(c)
         |  WHERE c >= 8 AND c*c*64 >= (SELECT count(*) FROM embeddings)),
         |centroids AS (
         |  SELECT c, list((${h60sql.format("'cent' || c || ':' || i")} % 2001 - 1000) / 1000.0
         |                 ORDER BY i) AS w
         |  FROM range(4096) rc(c), range(64) ri(i), nc WHERE c < nc.nc GROUP BY c),
         |n AS (SELECT vec_id,
         |             (SELECT c FROM centroids
         |              ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), w) DESC, c
         |              LIMIT 1) AS cell,
         |             CAST(embedding AS DOUBLE[]) AS v,
         |             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
         |      FROM embeddings e)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_sim
         |FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $semanticCosThreshold
         |ORDER BY vec_a, vec_b""".stripMargin,
    "d8_lsh_verified_dedup" ->
      s"""WITH $verifiedPairCtes
         |SELECT doc_a, doc_b, n_common, jaccard FROM vpairs
         |ORDER BY doc_a, doc_b""".stripMargin,
    // d23: the incremental semantic posture — SRP buckets replayed for
    // every vector (the zone's fixed planes derive from the full
    // corpus count), candidates restricted to pairs with a delta
    // member (vec_a < vec_b and vec ids are ingest-ordered, so the
    // delta condition is b >= cut), exact-cosine verified like d7
    "d23_incremental_semantic_dedup" ->
      s"""WITH $srpBucketCtes,
         |cut AS (SELECT count(*) * 4 // 5 AS c FROM embeddings),
         |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |         FROM bucketed a JOIN bucketed b
         |           ON a.bucket = b.bucket AND a.vec_id < b.vec_id, cut
         |         WHERE b.vec_id >= cut.c),
         |n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
         |      FROM embeddings)
         |SELECT c.vec_a, c.vec_b,
         |       list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_sim
         |FROM cand c JOIN n a ON a.vec_id = c.vec_a JOIN n b ON b.vec_id = c.vec_b
         |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $semanticCosThreshold
         |ORDER BY vec_a, vec_b""".stripMargin,
    // d20 shares d9's oracle by construction: the disk-bucketed edge
    // layout must be invisible in the resolved components.
    "d20_cc_bucketed" ->
      s"""WITH RECURSIVE $verifiedPairCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM vpairs
         |          UNION ALL SELECT doc_b, doc_a FROM vpairs),
         |closure(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT c.a, e.dst FROM closure c JOIN edges e ON c.b = e.src),
         |comp AS (SELECT a AS doc_id, min(b) AS component FROM closure GROUP BY a),
         |csize AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
         |SELECT c.doc_id, c.component, s.cluster_size,
         |       (c.doc_id = c.component) AS is_keeper
         |FROM comp c JOIN csize s USING (component)
         |ORDER BY doc_id""".stripMargin,
    "d9_dedup_clusters" ->
      s"""WITH RECURSIVE $verifiedPairCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM vpairs
         |          UNION ALL SELECT doc_b, doc_a FROM vpairs),
         |closure(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT c.a, e.dst FROM closure c JOIN edges e ON c.b = e.src),
         |comp AS (SELECT a AS doc_id, min(b) AS component FROM closure GROUP BY a),
         |csize AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
         |SELECT c.doc_id, c.component, s.cluster_size,
         |       (c.doc_id = c.component) AS is_keeper
         |FROM comp c JOIN csize s USING (component)
         |ORDER BY doc_id""".stripMargin,
    "d12_quality_keeper" ->
      s"""WITH RECURSIVE $verifiedPairCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM vpairs
         |          UNION ALL SELECT doc_b, doc_a FROM vpairs),
         |closure(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT c.a, e.dst FROM closure c JOIN edges e ON c.b = e.src),
         |comp AS (SELECT a AS doc_id, min(b) AS component FROM closure GROUP BY a),
         |csize AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component),
         |q AS (SELECT doc_id,
         |  (CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS DOUBLE)
         |     / len(regexp_extract_all(lower(text), '\\w+'))) * 5.0
         |  - (CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / length(text)) * 3.0
         |  - (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)) * 2.0
         |  + (CASE WHEN length(text) BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END) AS quality_score
         |  FROM documents)
         |SELECT c.doc_id, c.component, s.cluster_size, q.quality_score,
         |  (row_number() OVER (PARTITION BY c.component
         |                      ORDER BY q.quality_score DESC, c.doc_id) = 1) AS keep
         |FROM comp c JOIN csize s USING (component) JOIN q USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "x7_vocab_topk" ->
      """SELECT w AS token, count(*) AS cnt
        |FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w FROM documents)
        |GROUP BY 1 ORDER BY cnt DESC, token LIMIT 100""".stripMargin,
    // x19: the frequencies sketch is exact while the vocabulary fits its
    // counter map (it does at verify scale), so the sketch-path top-20
    // hash-matches the exact oracle.
    "x19_heavy_hitters" ->
      """SELECT w AS token, count(*) AS cnt
        |FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w FROM documents)
        |GROUP BY 1 ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    "d14_fuzzy_match" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    array_to_string(regexp_extract_all(lower(text), '\w+')[1:3], ' ') AS title
        |  FROM documents),
        |b AS (SELECT doc_id, title,
        |        split_part(title, ' ', 1) AS blk1,
        |        string_split(title, ' ')[-1] AS blk2,
        |        split_part(title, ' ', 2) AS tok2 FROM t),
        |b3 AS (SELECT doc_id, title,
        |         unnest(list_distinct(list_append(
        |           list_transform(range(1, length(tok2) + 1),
        |             i -> substr(tok2, 1, i - 1) || substr(tok2, i + 1, length(tok2) - i)),
        |           tok2))) AS blk3
        |       FROM b),
        |f1 AS (SELECT * FROM (SELECT doc_id, title, blk1 AS blk,
        |         count(*) OVER (PARTITION BY blk1) AS bn FROM b) WHERE bn <= 500),
        |f2 AS (SELECT * FROM (SELECT doc_id, title, blk2 AS blk,
        |         count(*) OVER (PARTITION BY blk2) AS bn FROM b) WHERE bn <= 500),
        |f3 AS (SELECT * FROM (SELECT doc_id, title, blk3 AS blk,
        |         count(*) OVER (PARTITION BY blk3) AS bn FROM b3) WHERE bn <= 500),
        |p1 AS (SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |         CAST(levenshtein(a.title, b2.title) AS BIGINT) AS dist
        |       FROM f1 a JOIN f1 b2
        |         ON a.blk = b2.blk AND a.doc_id < b2.doc_id
        |        AND abs(length(a.title) - length(b2.title)) <= 3
        |       WHERE levenshtein(a.title, b2.title) <= 3),
        |p2 AS (SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |         CAST(levenshtein(a.title, b2.title) AS BIGINT) AS dist
        |       FROM f2 a JOIN f2 b2
        |         ON a.blk = b2.blk AND a.doc_id < b2.doc_id
        |        AND abs(length(a.title) - length(b2.title)) <= 3
        |       WHERE levenshtein(a.title, b2.title) <= 3),
        |p3 AS (SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |         CAST(levenshtein(a.title, b2.title) AS BIGINT) AS dist
        |       FROM f3 a JOIN f3 b2
        |         ON a.blk = b2.blk AND a.doc_id < b2.doc_id
        |        AND abs(length(a.title) - length(b2.title)) <= 3
        |       WHERE levenshtein(a.title, b2.title) <= 3)
        |SELECT DISTINCT doc_a, doc_b, dist
        |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |      UNION ALL SELECT * FROM p3)
        |ORDER BY doc_a, doc_b""".stripMargin,
    "x15_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, count(*) AS cnt FROM toks
        |    GROUP BY 1 ORDER BY cnt DESC, token LIMIT 100))
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS oov_rate
        |FROM toks t LEFT JOIN vocab v ON t.token = v.token
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "x16_lm_familiarity" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM t WHERE len(t) >= 2),
        |allt AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
        |model AS (SELECT w1, w2, c12 FROM allt WHERE c12 >= 2),
        |heads AS (SELECT w1, sum(c12) AS c1 FROM allt GROUP BY w1),
        |v AS (SELECT count(*) AS vocab FROM heads),
        |scored AS (
        |  SELECT b.doc_id,
        |    (1000000000 * (coalesce(m.c12, 0) + 1)) //
        |      (coalesce(h.c1, 0) + v.vocab) AS p_scaled
        |  FROM bi b
        |  LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
        |  LEFT JOIN heads h ON b.w1 = h.w1, v),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_bigrams, sum(p_scaled) AS sum_p
        |  FROM scored GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(a.sum_p // a.n_bigrams, 0) AS BIGINT) AS familiarity_scaled
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "x8_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '''[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_word_tokens,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '''[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+')) AS DOUBLE) /
        |    len(regexp_extract_all(lower(text), '\w+')) AS bpe_per_word
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x31_bpe_train" -> x31OracleSql,
    "c18_bpe_encode" -> c18OracleSql,
    // c19: c14's shard-tail oracle with the BPE training CTEs prepended
    // (trained over the history slice, the engine's stagedBpeMerges
    // filterTo) and the trained chain swapped into cl's token column —
    // budget scalar, quota window, and packing offsets all re-derive
    // from the learned pricing.
    "c19_bpe_shard_tail" ->
      s"""WITH RECURSIVE
         |${admissionCtes(capped = false,
            cutCte = "SELECT (SELECT count(*) FROM embeddings) * 4 // 5 AS c",
            deltaPred = "doc_id < (SELECT count(*) FROM embeddings)")},
         |${bpeStagesSql(bpeMerges,
            corpusSql = "documents, cut WHERE doc_id < cut.c", cte = "b")},
         |keptd AS MATERIALIZED (SELECT sc.doc_id FROM sc
         |  JOIN ex ON ex.doc_id = sc.doc_id
         |  JOIN comp ON comp.doc_id = sc.doc_id
         |  WHERE sc.quality_score > 0
         |    AND ex.eb = sc.doc_id AND comp.component = sc.doc_id),
         |hemb AS MATERIALIZED (SELECT e.vec_id, e.embedding
         |  FROM embeddings e, cut WHERE e.vec_id < cut.c),
         |${kmeansCtes("hemb")},
         |kqd AS MATERIALIZED (SELECT e.vec_id,
         |    CAST(generate_subscripts(e.embedding, 1) AS BIGINT) AS dim,
         |    CAST(floor((CAST(unnest(e.embedding) AS DOUBLE) + 1.0) * 1048576.0) AS BIGINT) AS v
         |  FROM embeddings e JOIN keptd k ON k.doc_id = e.vec_id),
         |dd AS MATERIALIZED (SELECT q.vec_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS dist
         |  FROM kqd q JOIN c2 c USING (dim) GROUP BY q.vec_id, c.cid),
         |asg AS MATERIALIZED (SELECT vec_id AS doc_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cid) AS rn FROM dd)
         |  WHERE rn = 1),
         |cl AS MATERIALIZED (SELECT k.doc_id, asg.cid, sc.quality_score,
         |    ${bpeDocTokensSql("regexp_extract_all(lower(q0.text), '\\w+')", "b")}
         |      AS n_tokens
         |  FROM keptd k JOIN asg USING (doc_id)
         |  JOIN sc ON sc.doc_id = k.doc_id
         |  JOIN q0 ON q0.doc_id = k.doc_id,
         |  ${(1 to bpeMerges).map(i => s"bm$i").mkString(", ")}),
         |bud AS MATERIALIZED (SELECT CAST(sum(n_tokens) // (2 * count(DISTINCT cid)) AS BIGINT)
         |  AS budget FROM cl),
         |r AS MATERIALIZED (SELECT cl.*, sum(n_tokens) OVER (PARTITION BY cid
         |    ORDER BY quality_score DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM cl),
         |sel AS MATERIALIZED (SELECT r.doc_id, r.cid, r.quality_score, r.n_tokens
         |  FROM r, bud WHERE r.cum <= bud.budget),
         |o AS MATERIALIZED (SELECT doc_id, cid, quality_score, n_tokens,
         |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
         |  FROM sel)
         |SELECT doc_id, cid, quality_score, n_tokens, start_off,
         |  start_off // 2048 AS seq_start,
         |  CASE WHEN n_tokens = 0 THEN start_off // 2048
         |       ELSE (start_off + n_tokens - 1) // 2048 END AS seq_end
         |FROM o ORDER BY doc_id""".stripMargin,
    // c20: x32's seeded per-epoch rank with the running token sum
    // accumulated beside it — the oracle states both as plain windows
    // over one pass (single-node replay of the engine's two-phase
    // construction).
    "c20_epoch_pack" ->
      s"""WITH tk AS MATERIALIZED (SELECT doc_id,
         |    CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |p AS MATERIALIZED (SELECT CAST(e.epoch AS BIGINT) AS epoch, t.doc_id,
         |    t.n_tokens,
         |    CAST(row_number() OVER w AS BIGINT) AS pos,
         |    CAST(COALESCE(sum(t.n_tokens) OVER (PARTITION BY e.epoch ORDER BY
         |      ${h60sql.format("'epoch' || e.epoch || ':' || CAST(t.doc_id AS VARCHAR)")},
         |      t.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS start_off
         |  FROM tk t, (VALUES $epochValuesSql) e(epoch)
         |  WINDOW w AS (PARTITION BY e.epoch ORDER BY
         |    ${h60sql.format("'epoch' || e.epoch || ':' || CAST(t.doc_id AS VARCHAR)")},
         |    t.doc_id))
         |SELECT epoch, doc_id, pos, n_tokens, start_off,
         |  start_off // 2048 AS seq_start,
         |  CASE WHEN n_tokens = 0 THEN start_off // 2048
         |       ELSE (start_off + n_tokens - 1) // 2048 END AS seq_end
         |FROM p ORDER BY epoch, pos""".stripMargin,
    "x32_epoch_shuffle" ->
      s"""SELECT CAST(e.epoch AS BIGINT) AS epoch, d.doc_id,
         |  CAST(row_number() OVER (PARTITION BY e.epoch ORDER BY
         |    ${h60sql.format("'epoch' || e.epoch || ':' || CAST(d.doc_id AS VARCHAR)")},
         |    d.doc_id) AS BIGINT) AS pos
         |FROM documents d, (VALUES $epochValuesSql) e(epoch)
         |ORDER BY epoch, pos""".stripMargin,
    "x22_ngram_novelty" ->
      s"""WITH $grams3,
         |firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM grams GROUP BY 1)
         |SELECT g.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         |    AS novelty_rate
         |FROM grams g JOIN firsts f USING (shingle)
         |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin,
    "x9_decontaminate" ->
      s"""WITH $grams3,
         |bsh AS (SELECT DISTINCT shingle FROM grams WHERE doc_id % 97 = 0),
         |csh AS (SELECT doc_id, shingle FROM grams WHERE doc_id % 97 <> 0),
         |tot AS (SELECT doc_id, count(*) AS n_shingles FROM csh GROUP BY 1),
         |cont AS (SELECT doc_id, count(*) AS n_contaminated
         |         FROM csh JOIN bsh USING (shingle) GROUP BY 1)
         |SELECT t.doc_id, t.n_shingles,
         |  coalesce(c.n_contaminated, 0) AS n_contaminated,
         |  CAST(coalesce(c.n_contaminated, 0) AS DOUBLE) / t.n_shingles AS contamination_rate
         |FROM tot t LEFT JOIN cont c USING (doc_id) ORDER BY doc_id""".stripMargin,
    "x21_weighted_sample" ->
      s"""SELECT doc_id, GREATEST(n_chars, 1) AS weight,
         |  ${h60sql.format("'wsample:' || doc_id")} // GREATEST(n_chars, 1) AS priority
         |FROM documents ORDER BY priority, doc_id LIMIT 100""".stripMargin,
    "x6_deterministic_split" ->
      s"""SELECT doc_id,
         |  ${h60sql.format("'split:' || doc_id")} % 100 AS bucket,
         |  CASE WHEN ${h60sql.format("'split:' || doc_id")} % 100 < 80 THEN 'train'
         |       WHEN ${h60sql.format("'split:' || doc_id")} % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "x5_string_clean" ->
      """SELECT doc_id, source,
        |  CAST(regexp_replace(source, '^src', '') AS BIGINT) AS src_num,
        |  'provider_' || (CAST(regexp_replace(source, '^src', '') AS BIGINT) % 5) AS provider,
        |  array_to_string(regexp_extract_all(lower(text), '\w+')[1:3], '-') AS slug
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m1_media_features" ->
      s"""SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
         |       ELSE 'video' END AS media_type,
         |  CASE WHEN doc_id % 3 = 0
         |       THEN CASE WHEN doc_id % 51 = 0 THEN NULL
         |                 ELSE CAST(16 + doc_id % 32 AS BIGINT) END
         |       WHEN doc_id % 3 = 1
         |       THEN CASE WHEN doc_id % 34 = 0 THEN NULL
         |                 ELSE CAST(8000 + (doc_id % 5) * 2000 AS BIGINT) END
         |       ELSE CAST(64 + ${h60sql.format("text")} % 1857 AS BIGINT) END AS width,
         |  CASE WHEN doc_id % 3 = 0
         |       THEN CASE WHEN doc_id % 51 = 0 THEN NULL
         |                 ELSE CAST(8 + (doc_id // 7) % 24 AS BIGINT) END
         |       WHEN doc_id % 3 = 1
         |       THEN CASE WHEN doc_id % 34 = 0 THEN NULL ELSE CAST(1 AS BIGINT) END
         |       ELSE CAST(64 + (${h60sql.format("text")} // 1857) % 1017 AS BIGINT) END AS height,
         |  CASE WHEN doc_id % 3 = 0
         |       THEN CAST(CASE WHEN doc_id % 51 = 0 THEN 0 ELSE 1 END AS BIGINT)
         |       WHEN doc_id % 3 = 1
         |       THEN CAST(CASE WHEN doc_id % 34 = 0 THEN 0
         |                      ELSE 256 + doc_id % 1000 END AS BIGINT)
         |       ELSE CAST(1 + ${h60sql.format("text")} % 7 AS BIGINT) END AS n_frames,
         |  CASE WHEN doc_id % 3 = 0 THEN doc_id % 51 <> 0
         |       WHEN doc_id % 3 = 1 THEN doc_id % 34 <> 0
         |       ELSE TRUE END AS decode_ok
         |FROM documents ORDER BY doc_id""".stripMargin,
    // d26: m6's fingerprint chain rebuilt bit-for-bit over decodable
    // audio docs, then the ALL-PAIRS hamming filter restricted to pairs
    // with a delta member (doc_a < doc_b and slices are id-ordered, so
    // doc_b >= cut is exactly "at least one delta member") — pigeonhole
    // recall is exact, so the zone-probed result must equal it.
    "d26_incremental_audio_dedup" ->
      s"""WITH a AS (SELECT doc_id, 256 + doc_id % 1000 AS n FROM documents
         |           WHERE doc_id % 3 = 1),
         |cut AS (SELECT count(*) * 4 // 5 AS c FROM documents),
         |v AS (
         |  SELECT a.doc_id, (r.i * 61) // a.n AS seg,
         |         ((r.i * 2654435761 + a.doc_id) % 65536) - 32768 AS s
         |  FROM a, range(1256) r(i) WHERE r.i < a.n),
         |e AS (SELECT doc_id, seg, CAST(sum(s * s) AS BIGINT) AS energy
         |      FROM v GROUP BY 1, 2),
         |d AS (SELECT doc_id, seg, energy,
         |        lag(energy) OVER (PARTITION BY doc_id ORDER BY seg) AS prev
         |      FROM e),
         |h AS (SELECT doc_id,
         |        CAST(sum(CASE WHEN energy > prev THEN (CAST(1 AS BIGINT) << (seg - 1))
         |                 ELSE 0 END) AS BIGINT) AS ahash
         |      FROM d WHERE seg >= 1 GROUP BY doc_id),
         |h2 AS (SELECT h.doc_id, h.ahash FROM h JOIN a USING (doc_id)
         |       WHERE a.doc_id % 34 <> 0)
         |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |  CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming
         |FROM h2 x JOIN h2 y ON x.doc_id < y.doc_id, cut
         |WHERE y.doc_id >= cut.c
         |  AND bit_count(xor(x.ahash, y.ahash)) <= $audioHammingMax
         |ORDER BY doc_a, doc_b""".stripMargin,
    "m6_audio_fingerprint" ->
      """WITH a AS (SELECT doc_id, 256 + doc_id % 1000 AS n FROM documents
        |           WHERE doc_id % 3 = 1),
        |v AS (
        |  SELECT a.doc_id, (r.i * 61) // a.n AS seg,
        |         ((r.i * 2654435761 + a.doc_id) % 65536) - 32768 AS s
        |  FROM a, range(1256) r(i) WHERE r.i < a.n),
        |e AS (SELECT doc_id, seg, CAST(sum(s * s) AS BIGINT) AS energy
        |      FROM v GROUP BY 1, 2),
        |d AS (SELECT doc_id, seg, energy,
        |        lag(energy) OVER (PARTITION BY doc_id ORDER BY seg) AS prev
        |      FROM e),
        |h AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN energy > prev THEN (CAST(1 AS BIGINT) << (seg - 1))
        |                 ELSE 0 END) AS BIGINT) AS ahash
        |      FROM d WHERE seg >= 1 GROUP BY doc_id)
        |SELECT a.doc_id,
        |  CASE WHEN a.doc_id % 34 = 0 THEN NULL ELSE h.ahash END AS ahash,
        |  (a.doc_id % 34 <> 0) AS decode_ok
        |FROM a JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin,
    "m4_audio_stats" ->
      """WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
        |s AS (
        |  SELECT a.doc_id, ((r.i * 2654435761 + a.doc_id) % 65536) - 32768 AS s
        |  FROM a, range(1256) r(i) WHERE r.i < 256 + a.doc_id % 1000),
        |st AS (
        |  SELECT doc_id, count(*) AS n_samples,
        |         CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
        |         max(abs(s)) AS max_abs,
        |         CAST(sum(s * s) AS BIGINT) AS energy
        |  FROM s GROUP BY doc_id)
        |SELECT a.doc_id,
        |  CASE WHEN a.doc_id % 34 = 0 THEN NULL ELSE st.n_samples END AS n_samples,
        |  CASE WHEN a.doc_id % 34 = 0 THEN NULL ELSE st.sum_abs END AS sum_abs,
        |  CASE WHEN a.doc_id % 34 = 0 THEN NULL ELSE st.max_abs END AS max_abs,
        |  CASE WHEN a.doc_id % 34 = 0 THEN NULL ELSE st.energy END AS energy,
        |  (a.doc_id % 34 <> 0) AS decode_ok
        |FROM a JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin,
    "m3_image_resize" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 51 = 0 THEN NULL
        |       ELSE CAST(16 + doc_id % 32 AS BIGINT) END AS orig_w,
        |  CASE WHEN doc_id % 51 = 0 THEN NULL
        |       ELSE CAST(8 + (doc_id // 7) % 24 AS BIGINT) END AS orig_h,
        |  CASE WHEN doc_id % 51 = 0 THEN NULL
        |       ELSE CAST(GREATEST(1, ((16 + doc_id % 32) * 64)
        |              // GREATEST(16 + doc_id % 32, 8 + (doc_id // 7) % 24)) AS BIGINT)
        |       END AS new_w,
        |  CASE WHEN doc_id % 51 = 0 THEN NULL
        |       ELSE CAST(GREATEST(1, ((8 + (doc_id // 7) % 24) * 64)
        |              // GREATEST(16 + doc_id % 32, 8 + (doc_id // 7) % 24)) AS BIGINT)
        |       END AS new_h,
        |  (doc_id % 51 <> 0) AS resize_ok
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin,
    "m2_frame_sample" ->
      s"""WITH f AS (SELECT doc_id, 1 + ${h60sql.format("text")} % 7 AS n_frames
         |           FROM documents WHERE doc_id % 3 = 2)
         |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames, CAST(i AS BIGINT) AS frame_idx,
         |       doc_id || ':' || i AS frame_key
         |FROM f, range(7) r(i) WHERE i < n_frames
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keeper_id, count(*) AS dup_cnt
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "d2_ngram_jaccard" ->
      s"""WITH $grams3,
         |capped AS (SELECT g.doc_id, g.shingle FROM grams g
         |           JOIN (SELECT shingle FROM grams GROUP BY shingle HAVING count(*) <= $capSql) ok
         |             USING (shingle)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY 1),
         |common AS (SELECT g1.doc_id AS da, g2.doc_id AS db, count(*) AS c
         |           FROM capped g1 JOIN capped g2 ON g1.shingle = g2.shingle AND g1.doc_id < g2.doc_id
         |           GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, c AS n_common,
         |       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
         |FROM common JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
         |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d3_minhash_lsh" ->
      s"""WITH $grams3,
         |hashed AS (SELECT doc_id, ${h60sql.format("shingle")} % 1073741824 AS h FROM grams),
         |mh AS (SELECT doc_id, s, min((h * (2 * s + 1) + (s * 12345 + 678)) % 1073741824) AS m
         |       FROM hashed, range(16) r(s) GROUP BY 1, 2),
         |bands AS (SELECT doc_id, s // 4 AS band, md5(string_agg(m, ':' ORDER BY s)) AS bh
         |          FROM mh GROUP BY doc_id, s // 4)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    // d22: the incremental posture — same signature chain as d3, pairs
    // restricted to those with a delta member (doc_a < doc_b, so the
    // delta-membership condition is b >= cut), exact-Jaccard verified
    // like d2/d8 but UNCAPPED (the df cap needs corpus-wide frequencies
    // an incremental step must not recompute)
    "d22_incremental_dedup" -> d22OracleSql,
    // d25 serves d22's query from the OPTIMIZEd bucketed band zone —
    // the storage layout must be invisible in the result
    "d25_incremental_dedup_bucketed" -> d22OracleSql,
    // d27 serves d22's query from a zone REBUILT to k=32 / 8 bands —
    // the oracle is d22's chain under the NEW geometry (rows-per-band
    // stays 4, so only the hash count changes): the cut-over zone must
    // answer exactly like a fresh new-geometry build
    "d27_rebuilt_zone_dedup" -> d22OracleSql.replace("range(16)", "range(32)"),
    // d24: d22 with the stop-shingle cap restored — the drop list is
    // the HISTORY-df hot set (the df zone's coverage at probe time:
    // deltas append their own df only after decisions, the c9
    // ordering), cap = the full-corpus capacity plan. Banding, sizes,
    // and verification all run over the same capped universe.
    "d24_incremental_dedup_capped" ->
      s"""WITH $grams3,
         |cut AS (SELECT count(*) * 4 // 5 AS c FROM documents),
         |hot AS (SELECT shingle FROM grams, cut WHERE doc_id < cut.c
         |        GROUP BY shingle HAVING count(*) > $capSql),
         |capped AS (SELECT g.doc_id, g.shingle FROM grams g
         |           LEFT JOIN hot h USING (shingle) WHERE h.shingle IS NULL),
         |hashed AS (SELECT doc_id, ${h60sql.format("shingle")} % 1073741824 AS h FROM capped),
         |mh AS (SELECT doc_id, s, min((h * (2 * s + 1) + (s * 12345 + 678)) % 1073741824) AS m
         |       FROM hashed, range(16) r(s) GROUP BY 1, 2),
         |bands AS (SELECT doc_id, s // 4 AS band, md5(string_agg(m, ':' ORDER BY s)) AS bh
         |          FROM mh GROUP BY doc_id, s // 4),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id, cut
         |         WHERE b.doc_id >= cut.c),
         |sizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY 1),
         |common AS (SELECT c.doc_a, c.doc_b, count(*) AS nc
         |           FROM cand c JOIN capped ga ON ga.doc_id = c.doc_a
         |           JOIN capped gb ON gb.doc_id = c.doc_b AND gb.shingle = ga.shingle
         |           GROUP BY 1, 2)
         |SELECT doc_a, doc_b, nc AS n_common,
         |       CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) AS jaccard
         |FROM common JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    // c8: the admission pipeline replayed stage by stage — quality gate,
    // min-id exact dedup across history ∪ gated delta, d22's pair
    // derivation scoped to exact-survivors, recursive-closure components
    // (MATERIALIZED hints: the chain rides under WITH RECURSIVE)
    "c8_incremental_curation" ->
      s"""WITH RECURSIVE
         |$c8AdmissionCtes
         |$admissionFateSelect""".stripMargin,
    // c11: the same admission replay over the CAPPED shingle universe
    // (d24's history-df drop rule applied to banding, sizes, and
    // verification alike).
    "c11_admission_capped" ->
      s"""WITH RECURSIVE
         |${admissionCtes(capped = true)}
         |$admissionFateSelect""".stripMargin,
    // c13: the same admission replay with the quality gate swapped to
    // the per-source CALIBRATED threshold — history docs score through
    // the identical formula, each source's lower-median score becomes
    // its bar (row_number vs (n+1)//2, rank-exact), and the gate passes
    // score >= thr (raw > 0 fallback for threshold-less sources).
    "c13_admission_calibrated" ->
      s"""WITH RECURSIVE
         |${admissionCtes(capped = false,
            scCols = "source, ",
            preGate = s"""hq AS MATERIALIZED (
              |  SELECT doc_id, source,
              |    length(text) AS n_chars_len,
              |    CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens,
              |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
              |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
              |    CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS BIGINT) AS stop_cnt
              |  FROM documents, cut WHERE doc_id < cut.c),
              |hsc AS MATERIALIZED (SELECT doc_id, source,
              |    (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
              |      - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
              |      - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
              |      + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END)
              |      AS quality_score
              |  FROM hq),
              |calth AS MATERIALIZED (SELECT source, quality_score AS thr FROM (
              |    SELECT source, quality_score,
              |      row_number() OVER (PARTITION BY source
              |        ORDER BY quality_score, doc_id) AS rn,
              |      count(*) OVER (PARTITION BY source) AS n
              |    FROM hsc WHERE quality_score IS NOT NULL) t
              |  WHERE rn = (n + 1) // 2),
              |qp AS MATERIALIZED (SELECT sc.doc_id,
              |    coalesce(CASE WHEN t.thr IS NULL THEN sc.quality_score > 0
              |                  ELSE sc.quality_score >= t.thr END, FALSE) AS q_pass
              |  FROM sc LEFT JOIN calth t ON t.source = sc.source),
              |""".stripMargin,
            gatedCte = "gated AS MATERIALIZED (SELECT sc.doc_id, sc.text " +
              "FROM sc JOIN qp USING (doc_id) WHERE qp.q_pass)")}
         |SELECT sc.doc_id,
         |  CASE WHEN NOT qp.q_pass THEN 'low_quality'
         |       WHEN ex.eb < sc.doc_id THEN 'exact_dup'
         |       WHEN comp.component < sc.doc_id THEN 'near_dup'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN NOT qp.q_pass THEN NULL
         |       WHEN ex.eb < sc.doc_id THEN ex.eb
         |       WHEN comp.component < sc.doc_id THEN comp.component
         |       ELSE NULL END AS dup_of,
         |  sc.quality_score
         |FROM sc JOIN qp ON qp.doc_id = sc.doc_id
         |LEFT JOIN ex ON ex.doc_id = sc.doc_id
         |LEFT JOIN comp ON comp.doc_id = sc.doc_id
         |ORDER BY sc.doc_id""".stripMargin,
    // c10: c8's admission chain feeds the kept docs, the integer Lloyd
    // chain over HISTORY embeddings feeds the final-round centroids
    // (c2 = the centroids the round-3 assignment uses), and kept docs
    // assign by quantized argmin with the lower-cid tiebreak.
    "c10_admission_clusters" ->
      s"""WITH RECURSIVE
         |${admissionCtes(capped = false,
            cutCte = "SELECT (SELECT count(*) FROM embeddings) * 4 // 5 AS c",
            deltaPred = "doc_id < (SELECT count(*) FROM embeddings)")},
         |keptd AS MATERIALIZED (SELECT sc.doc_id FROM sc
         |  JOIN ex ON ex.doc_id = sc.doc_id
         |  JOIN comp ON comp.doc_id = sc.doc_id
         |  WHERE sc.quality_score > 0
         |    AND ex.eb = sc.doc_id AND comp.component = sc.doc_id),
         |hemb AS MATERIALIZED (SELECT e.vec_id, e.embedding
         |  FROM embeddings e, cut WHERE e.vec_id < cut.c),
         |${kmeansCtes("hemb")},
         |kqd AS MATERIALIZED (SELECT e.vec_id,
         |    CAST(generate_subscripts(e.embedding, 1) AS BIGINT) AS dim,
         |    CAST(floor((CAST(unnest(e.embedding) AS DOUBLE) + 1.0) * 1048576.0) AS BIGINT) AS v
         |  FROM embeddings e JOIN keptd k ON k.doc_id = e.vec_id),
         |dd AS MATERIALIZED (SELECT q.vec_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS dist
         |  FROM kqd q JOIN c2 c USING (dim) GROUP BY q.vec_id, c.cid)
         |SELECT vec_id AS doc_id, cid, CAST(dist AS BIGINT) AS dist FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY dist, cid) AS rn FROM dd)
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // c14: the admission chain (c10's window) feeds the kept docs, the
    // Lloyd chain over history embeddings the centroids, the quantized
    // argmin the assignment; then c7's tail verbatim — per-cluster
    // greedy budget cut over the DELTA's kept token mass, global
    // doc_id-ordered prefix sum into 2048-token sequences.
    "c14_admission_shard" ->
      s"""WITH RECURSIVE
         |${admissionCtes(capped = false,
            cutCte = "SELECT (SELECT count(*) FROM embeddings) * 4 // 5 AS c",
            deltaPred = "doc_id < (SELECT count(*) FROM embeddings)")},
         |keptd AS MATERIALIZED (SELECT sc.doc_id FROM sc
         |  JOIN ex ON ex.doc_id = sc.doc_id
         |  JOIN comp ON comp.doc_id = sc.doc_id
         |  WHERE sc.quality_score > 0
         |    AND ex.eb = sc.doc_id AND comp.component = sc.doc_id),
         |hemb AS MATERIALIZED (SELECT e.vec_id, e.embedding
         |  FROM embeddings e, cut WHERE e.vec_id < cut.c),
         |${kmeansCtes("hemb")},
         |kqd AS MATERIALIZED (SELECT e.vec_id,
         |    CAST(generate_subscripts(e.embedding, 1) AS BIGINT) AS dim,
         |    CAST(floor((CAST(unnest(e.embedding) AS DOUBLE) + 1.0) * 1048576.0) AS BIGINT) AS v
         |  FROM embeddings e JOIN keptd k ON k.doc_id = e.vec_id),
         |dd AS MATERIALIZED (SELECT q.vec_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS dist
         |  FROM kqd q JOIN c2 c USING (dim) GROUP BY q.vec_id, c.cid),
         |asg AS MATERIALIZED (SELECT vec_id AS doc_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cid) AS rn FROM dd)
         |  WHERE rn = 1),
         |cl AS MATERIALIZED (SELECT k.doc_id, asg.cid, sc.quality_score,
         |    q0.n_tokens
         |  FROM keptd k JOIN asg USING (doc_id)
         |  JOIN sc ON sc.doc_id = k.doc_id
         |  JOIN q0 ON q0.doc_id = k.doc_id),
         |bud AS MATERIALIZED (SELECT CAST(sum(n_tokens) // (2 * count(DISTINCT cid)) AS BIGINT)
         |  AS budget FROM cl),
         |r AS MATERIALIZED (SELECT cl.*, sum(n_tokens) OVER (PARTITION BY cid
         |    ORDER BY quality_score DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM cl),
         |sel AS MATERIALIZED (SELECT r.doc_id, r.cid, r.quality_score, r.n_tokens
         |  FROM r, bud WHERE r.cum <= bud.budget),
         |o AS MATERIALIZED (SELECT doc_id, cid, quality_score, n_tokens,
         |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
         |  FROM sel)
         |SELECT doc_id, cid, quality_score, n_tokens, start_off,
         |  start_off // 2048 AS seq_start,
         |  CASE WHEN n_tokens = 0 THEN start_off // 2048
         |       ELSE (start_off + n_tokens - 1) // 2048 END AS seq_end
         |FROM o ORDER BY doc_id""".stripMargin,
    // c12: c8's admission chain (over the embedded window, c10's cut)
    // extended with the semantic gate — kept survivors SRP-bucket
    // against history vectors AND each other (the zone's cross pairs
    // plus the delta-internal self-join), exact-cosine verified, and
    // resolved through a second recursive closure; a kept doc whose
    // semantic component minimum is smaller becomes semantic_dup.
    "c12_admission_semantic" ->
      s"""WITH RECURSIVE
         |${admissionCtes(capped = false,
            cutCte = "SELECT (SELECT count(*) FROM embeddings) * 4 // 5 AS c",
            deltaPred = "doc_id < (SELECT count(*) FROM embeddings)")},
         |keptd AS MATERIALIZED (SELECT sc.doc_id FROM sc
         |  JOIN ex ON ex.doc_id = sc.doc_id
         |  JOIN comp ON comp.doc_id = sc.doc_id
         |  WHERE sc.quality_score > 0
         |    AND ex.eb = sc.doc_id AND comp.component = sc.doc_id),
         |$srpBucketCtes,
         |scand AS MATERIALIZED (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
         |  FROM bucketed a JOIN bucketed b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id, cut
         |  WHERE b.vec_id IN (SELECT doc_id FROM keptd)
         |    AND (a.vec_id < cut.c OR a.vec_id IN (SELECT doc_id FROM keptd))),
         |sn AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |svp AS MATERIALIZED (SELECT va, vb FROM scand
         |  JOIN sn a ON a.vec_id = va JOIN sn b ON b.vec_id = vb
         |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $semanticCosThreshold),
         |sverts AS MATERIALIZED (SELECT doc_id FROM keptd
         |  UNION SELECT va FROM svp UNION SELECT vb FROM svp),
         |sedges AS MATERIALIZED (SELECT va AS src, vb AS dst FROM svp
         |  UNION ALL SELECT vb, va FROM svp),
         |closure2(a, b) AS (
         |  SELECT doc_id, doc_id FROM sverts
         |  UNION
         |  SELECT c.a, e.dst FROM closure2 c JOIN sedges e ON c.b = e.src),
         |comp2 AS MATERIALIZED (SELECT a AS doc_id, min(b) AS component
         |  FROM closure2 GROUP BY a)
         |SELECT sc.doc_id,
         |  CASE WHEN sc.quality_score IS NULL OR sc.quality_score <= 0 THEN 'low_quality'
         |       WHEN ex.eb < sc.doc_id THEN 'exact_dup'
         |       WHEN comp.component < sc.doc_id THEN 'near_dup'
         |       WHEN comp2.component < sc.doc_id THEN 'semantic_dup'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN sc.quality_score IS NULL OR sc.quality_score <= 0 THEN NULL
         |       WHEN ex.eb < sc.doc_id THEN ex.eb
         |       WHEN comp.component < sc.doc_id THEN comp.component
         |       WHEN comp2.component < sc.doc_id THEN comp2.component
         |       ELSE NULL END AS dup_of,
         |  sc.quality_score
         |FROM sc LEFT JOIN ex ON ex.doc_id = sc.doc_id
         |LEFT JOIN comp ON comp.doc_id = sc.doc_id
         |LEFT JOIN comp2 ON comp2.doc_id = sc.doc_id
         |ORDER BY sc.doc_id""".stripMargin,
    // c17: c12's chain + the media gate — m6's fingerprint chain
    // rebuilt bit-for-bit over decodable audio docs in the window,
    // all-pairs hamming filter restricted to pairs with a SEMANTIC-kept
    // member (pigeonhole recall is exact, d26's argument), a third
    // recursive closure, and media_dup appended to the fate CASE.
    "c17_admission_media" ->
      s"""WITH RECURSIVE
         |${admissionCtes(capped = false,
            cutCte = "SELECT (SELECT count(*) FROM embeddings) * 4 // 5 AS c",
            deltaPred = "doc_id < (SELECT count(*) FROM embeddings)")},
         |keptd AS MATERIALIZED (SELECT sc.doc_id FROM sc
         |  JOIN ex ON ex.doc_id = sc.doc_id
         |  JOIN comp ON comp.doc_id = sc.doc_id
         |  WHERE sc.quality_score > 0
         |    AND ex.eb = sc.doc_id AND comp.component = sc.doc_id),
         |$srpBucketCtes,
         |scand AS MATERIALIZED (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
         |  FROM bucketed a JOIN bucketed b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id, cut
         |  WHERE b.vec_id IN (SELECT doc_id FROM keptd)
         |    AND (a.vec_id < cut.c OR a.vec_id IN (SELECT doc_id FROM keptd))),
         |sn AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |svp AS MATERIALIZED (SELECT va, vb FROM scand
         |  JOIN sn a ON a.vec_id = va JOIN sn b ON b.vec_id = vb
         |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $semanticCosThreshold),
         |sverts AS MATERIALIZED (SELECT doc_id FROM keptd
         |  UNION SELECT va FROM svp UNION SELECT vb FROM svp),
         |sedges AS MATERIALIZED (SELECT va AS src, vb AS dst FROM svp
         |  UNION ALL SELECT vb, va FROM svp),
         |closure2(a, b) AS (
         |  SELECT doc_id, doc_id FROM sverts
         |  UNION
         |  SELECT c.a, e.dst FROM closure2 c JOIN sedges e ON c.b = e.src),
         |comp2 AS MATERIALIZED (SELECT a AS doc_id, min(b) AS component
         |  FROM closure2 GROUP BY a),
         |keptm AS MATERIALIZED (SELECT k.doc_id FROM keptd k
         |  JOIN comp2 c2m ON c2m.doc_id = k.doc_id
         |  WHERE c2m.component = k.doc_id),
         |aud AS MATERIALIZED (SELECT d2a.doc_id, 256 + d2a.doc_id % 1000 AS n
         |  FROM documents d2a, (SELECT count(*) AS e FROM embeddings) ee
         |  WHERE d2a.doc_id % 3 = 1 AND d2a.doc_id % 34 <> 0
         |    AND d2a.doc_id < ee.e),
         |audv AS MATERIALIZED (
         |  SELECT aud.doc_id, (r.i * 61) // aud.n AS seg,
         |         ((r.i * 2654435761 + aud.doc_id) % 65536) - 32768 AS s
         |  FROM aud, range(1256) r(i) WHERE r.i < aud.n),
         |aude AS MATERIALIZED (SELECT doc_id, seg, CAST(sum(s * s) AS BIGINT) AS energy
         |  FROM audv GROUP BY 1, 2),
         |audd AS MATERIALIZED (SELECT doc_id, seg, energy,
         |    lag(energy) OVER (PARTITION BY doc_id ORDER BY seg) AS prev
         |  FROM aude),
         |audh AS MATERIALIZED (SELECT doc_id,
         |    CAST(sum(CASE WHEN energy > prev THEN (CAST(1 AS BIGINT) << (seg - 1))
         |             ELSE 0 END) AS BIGINT) AS ahash
         |  FROM audd WHERE seg >= 1 GROUP BY doc_id),
         |mp AS MATERIALIZED (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM audh x JOIN audh y ON x.doc_id < y.doc_id, cut
         |  WHERE bit_count(xor(x.ahash, y.ahash)) <= $audioHammingMax
         |    AND y.doc_id IN (SELECT doc_id FROM keptm)
         |    AND (x.doc_id < cut.c OR x.doc_id IN (SELECT doc_id FROM keptm))),
         |mverts AS MATERIALIZED (SELECT doc_id FROM keptm
         |  UNION SELECT doc_a FROM mp UNION SELECT doc_b FROM mp),
         |medges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM mp
         |  UNION ALL SELECT doc_b, doc_a FROM mp),
         |closure3(a, b) AS (
         |  SELECT doc_id, doc_id FROM mverts
         |  UNION
         |  SELECT c.a, e.dst FROM closure3 c JOIN medges e ON c.b = e.src),
         |comp3 AS MATERIALIZED (SELECT a AS doc_id, min(b) AS component
         |  FROM closure3 GROUP BY a)
         |SELECT sc.doc_id,
         |  CASE WHEN sc.quality_score IS NULL OR sc.quality_score <= 0 THEN 'low_quality'
         |       WHEN ex.eb < sc.doc_id THEN 'exact_dup'
         |       WHEN comp.component < sc.doc_id THEN 'near_dup'
         |       WHEN comp2.component < sc.doc_id THEN 'semantic_dup'
         |       WHEN comp3.component < sc.doc_id THEN 'media_dup'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN sc.quality_score IS NULL OR sc.quality_score <= 0 THEN NULL
         |       WHEN ex.eb < sc.doc_id THEN ex.eb
         |       WHEN comp.component < sc.doc_id THEN comp.component
         |       WHEN comp2.component < sc.doc_id THEN comp2.component
         |       WHEN comp3.component < sc.doc_id THEN comp3.component
         |       ELSE NULL END AS dup_of,
         |  sc.quality_score
         |FROM sc LEFT JOIN ex ON ex.doc_id = sc.doc_id
         |LEFT JOIN comp ON comp.doc_id = sc.doc_id
         |LEFT JOIN comp2 ON comp2.doc_id = sc.doc_id
         |LEFT JOIN comp3 ON comp3.doc_id = sc.doc_id
         |ORDER BY sc.doc_id""".stripMargin,
    // c9: all K rounds of the admission loop replayed in ONE statement
    // by slice-tagging every stage — a doc's history is every doc in an
    // EARLIER slice (the zones as left by prior rounds: ingested
    // coverage, any quality), its exact-dedup peers are the gated docs
    // of its OWN slice, candidate pairs require the b-side to be an
    // exact-survivor of the slice and the a-side to be earlier-ingested
    // or a same-slice survivor, and the recursive closure runs per
    // slice (closure rows carry the slice tag). Matching hashes prove
    // the looped zone state answers exactly like batch-through-k.
    "c9_admission_loop" ->
      s"""WITH RECURSIVE
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM documents),
         |sl AS MATERIALIZED (SELECT doc_id, text,
         |    (CASE WHEN doc_id >= n * 1 // 5 THEN 1 ELSE 0 END
         |     + CASE WHEN doc_id >= n * 2 // 5 THEN 1 ELSE 0 END
         |     + CASE WHEN doc_id >= n * 3 // 5 THEN 1 ELSE 0 END
         |     + CASE WHEN doc_id >= n * 4 // 5 THEN 1 ELSE 0 END) AS s
         |  FROM documents, nn),
         |q0 AS MATERIALIZED (
         |  SELECT doc_id, text, s,
         |    length(text) AS n_chars_len,
         |    CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens,
         |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
         |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
         |    CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS BIGINT) AS stop_cnt
         |  FROM sl WHERE s >= 1),
         |sc AS MATERIALIZED (SELECT doc_id, text, s,
         |    (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
         |      - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
         |      - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
         |      + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END)
         |      AS quality_score
         |  FROM q0),
         |gated AS MATERIALIZED (SELECT doc_id, s, text FROM sc WHERE quality_score > 0),
         |allm AS MATERIALIZED (SELECT doc_id, s, md5(text) AS m FROM sl),
         |hist AS MATERIALIZED (SELECT g.doc_id, min(a.doc_id) AS hk
         |  FROM gated g JOIN allm a ON a.m = md5(g.text) AND a.s < g.s
         |  GROUP BY 1),
         |dmin AS MATERIALIZED (SELECT s, md5(text) AS m, min(doc_id) AS dk
         |  FROM gated GROUP BY 1, 2),
         |ex AS MATERIALIZED (SELECT g.doc_id, g.s,
         |    CASE WHEN h.hk IS NULL THEN d.dk ELSE least(h.hk, d.dk) END AS eb
         |  FROM gated g JOIN dmin d ON d.s = g.s AND d.m = md5(g.text)
         |  LEFT JOIN hist h ON h.doc_id = g.doc_id),
         |sv AS MATERIALIZED (SELECT doc_id, s FROM ex WHERE eb = doc_id),
         |$grams3M,
         |hashed AS MATERIALIZED (SELECT doc_id, ${h60sql.format("shingle")} % 1073741824 AS h FROM grams),
         |mh AS MATERIALIZED (SELECT doc_id, s, min((h * (2 * s + 1) + (s * 12345 + 678)) % 1073741824) AS m
         |  FROM hashed, range(16) r(s) GROUP BY 1, 2),
         |bands AS MATERIALIZED (SELECT doc_id, s // 4 AS band, md5(string_agg(m, ':' ORDER BY s)) AS bh
         |  FROM mh GROUP BY doc_id, s // 4),
         |cand AS MATERIALIZED (SELECT DISTINCT v.s AS s, a.doc_id AS doc_a, b2.doc_id AS doc_b
         |  FROM bands a JOIN bands b2
         |    ON a.band = b2.band AND a.bh = b2.bh AND a.doc_id < b2.doc_id
         |  JOIN sv v ON v.doc_id = b2.doc_id
         |  JOIN sl sa ON sa.doc_id = a.doc_id
         |  LEFT JOIN sv va ON va.doc_id = a.doc_id
         |  WHERE sa.s < v.s OR va.doc_id IS NOT NULL),
         |sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
         |common AS MATERIALIZED (SELECT c.s, c.doc_a, c.doc_b, count(*) AS nc
         |  FROM cand c JOIN grams ga ON ga.doc_id = c.doc_a
         |  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.shingle = ga.shingle
         |  GROUP BY 1, 2, 3),
         |vp AS MATERIALIZED (SELECT s, doc_a, doc_b FROM common
         |  JOIN sizes sa2 ON sa2.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(nc AS DOUBLE) / (sa2.n + sb.n - nc) >= 0.8),
         |verts AS MATERIALIZED (SELECT s, doc_id FROM sv
         |  UNION SELECT s, doc_a FROM vp UNION SELECT s, doc_b FROM vp),
         |edges AS MATERIALIZED (SELECT s, doc_a AS src, doc_b AS dst FROM vp
         |  UNION ALL SELECT s, doc_b, doc_a FROM vp),
         |closure(s, a, b) AS (
         |  SELECT s, doc_id, doc_id FROM verts
         |  UNION
         |  SELECT c.s, c.a, e.dst FROM closure c JOIN edges e ON e.s = c.s AND e.src = c.b),
         |comp AS MATERIALIZED (SELECT s, a AS doc_id, min(b) AS component FROM closure GROUP BY 1, 2)
         |SELECT sc.doc_id, CAST(sc.s - 1 AS BIGINT) AS round,
         |  CASE WHEN sc.quality_score IS NULL OR sc.quality_score <= 0 THEN 'low_quality'
         |       WHEN ex.eb < sc.doc_id THEN 'exact_dup'
         |       WHEN comp.component < sc.doc_id THEN 'near_dup'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN sc.quality_score IS NULL OR sc.quality_score <= 0 THEN NULL
         |       WHEN ex.eb < sc.doc_id THEN ex.eb
         |       WHEN comp.component < sc.doc_id THEN comp.component
         |       ELSE NULL END AS dup_of,
         |  sc.quality_score
         |FROM sc LEFT JOIN ex ON ex.doc_id = sc.doc_id
         |LEFT JOIN comp ON comp.doc_id = sc.doc_id AND comp.s = sc.s
         |ORDER BY sc.doc_id""".stripMargin,
    "d4_simhash" ->
      s"""WITH $simhashCtes
         |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin,
    "d11_simhash_pairs" ->
      // The oracle checks the SEMANTICS (all pairs within the Hamming
      // bound): pigeonhole candidate generation is recall-exact for
      // chunks > maxHamming, so the engine's chunk-join result must equal
      // the all-pairs filter.
      s"""WITH $simhashCtes
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d5_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) /
        |  (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |   sqrt(list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])))) AS cos_sim
        |FROM embeddings e, q
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "d6_ann_lsh" -> lshTopKOracleSql(10),
    // d19 serves the SAME query from the persisted index zone — the
    // storage change must be invisible in the result.
    "d19_ann_index_zone" -> lshTopKOracleSql(10),
    // d21: the OPTIMIZEd zone must also be invisible in the result.
    "d21_ann_index_optimized" -> lshTopKOracleSql(10),
    // x24: both engines synthesize the identical HTML fixture from
    // doc_id/source, then replay the BS4 fallback chain as regexes —
    // DuckDB's regexp_extract returns NULL where Spark returns '', so
    // every chain test coalesces.
    "x24_scrape_extract" ->
      """WITH pg AS (SELECT doc_id,
        |    '<html><head><title>' || source || ' proposal ' || CAST(doc_id AS VARCHAR)
        |      || '</title></head><body>'
        |      || CASE WHEN doc_id % 11 = 7 THEN ''
        |           WHEN doc_id % 2 = 0 THEN
        |             '<a class="author-name text-truncate"'
        |               || CASE WHEN doc_id % 5 = 0
        |                    THEN ' title="Title applicant_' || CAST(doc_id % 97 AS VARCHAR) || '"'
        |                    ELSE '' END
        |               || '>applicant_' || CAST(doc_id % 97 AS VARCHAR) || '</a>'
        |           ELSE '<div class="member-list-dropdown"><a href="#">'
        |               || CASE WHEN doc_id % 3 = 0
        |                    THEN '<strong>lead_' || CAST(doc_id % 89 AS VARCHAR) || '</strong> (lead)'
        |                    ELSE 'lead_' || CAST(doc_id % 89 AS VARCHAR) END
        |               || '</a><a href="#">member_x</a></div>' END
        |      || '<section id="team">'
        |      || (SELECT string_agg('<h4>team_' || CAST(doc_id % 83 AS VARCHAR) || '_'
        |                              || CAST(i AS VARCHAR) || '</h4>', '' ORDER BY i)
        |          FROM range(3) r(i) WHERE i <= doc_id % 3)
        |      || '</section></body></html>' AS html
        |  FROM documents),
        |ex AS (SELECT doc_id, html,
        |    coalesce(regexp_extract(html,
        |      '<a class="author-name text-truncate" title="([^"]*)"', 1), '') AS t1,
        |    coalesce(regexp_extract(html,
        |      '<a class="author-name text-truncate"[^>]*>([^<]*)</a>', 1), '') AS t2,
        |    coalesce(regexp_extract(html,
        |      '<div class="member-list-dropdown"><a[^>]*>(.*?)</a>', 1), '') AS fa,
        |    coalesce(regexp_extract(html, '<section id="team">(.*?)</section>', 1), '') AS ts
        |  FROM pg),
        |ex2 AS (SELECT doc_id, html, t1, t2, ts,
        |    coalesce(regexp_extract(fa, '<strong>([^<]*)</strong>', 1), '') AS st,
        |    trim(regexp_replace(fa, '<[^>]+>', '', 'g')) AS sa
        |  FROM ex),
        |tm AS (SELECT doc_id, regexp_extract_all(ts, '<h4>([^<]*)</h4>', 1) AS team FROM ex2)
        |SELECT e.doc_id,
        |  regexp_extract(e.html, '<title>([^<]*)</title>', 1) AS page_title,
        |  CASE WHEN e.t1 <> '' THEN e.t1 WHEN e.t2 <> '' THEN e.t2
        |       WHEN e.st <> '' THEN e.st WHEN e.sa <> '' THEN e.sa
        |       ELSE NULL END AS applicant,
        |  CAST(len(t.team) AS BIGINT) AS n_team,
        |  array_to_string(t.team, ',') AS team_csv
        |FROM ex2 e JOIN tm t USING (doc_id)
        |ORDER BY e.doc_id""".stripMargin,
    // x26: identical fixture links from doc_id; the reference chain
    // (strip → prefix test → first segment) replayed in SQL, including
    // the scheme-prefixed quirk ('https://…' → 'https:').
    "x26_github_profile" ->
      """WITH f AS (SELECT doc_id,
        |    CASE doc_id % 7
        |      WHEN 0 THEN 'github.com/user_' || CAST(doc_id % 53 AS VARCHAR)
        |                    || '/repo_' || CAST(doc_id % 13 AS VARCHAR)
        |      WHEN 1 THEN 'github.com/user_' || CAST(doc_id % 53 AS VARCHAR)
        |      WHEN 2 THEN 'github.com/user_' || CAST(doc_id % 53 AS VARCHAR) || '/'
        |      WHEN 3 THEN 'https://github.com/user_' || CAST(doc_id % 53 AS VARCHAR)
        |      WHEN 4 THEN '  github.com/user_' || CAST(doc_id % 53 AS VARCHAR) || '  '
        |      WHEN 5 THEN ''
        |      ELSE NULL END AS company_link
        |  FROM documents)
        |SELECT doc_id, company_link,
        |  CASE WHEN company_link IS NULL OR trim(company_link) = '' THEN ''
        |       ELSE split_part(
        |         CASE WHEN starts_with(trim(company_link), 'github.com/')
        |              THEN substring(trim(company_link), 12)
        |              ELSE trim(company_link) END, '/', 1) END AS github_profile
        |FROM f ORDER BY doc_id""".stripMargin,
    // x27: identical fixture links; the prefix chain and the 55-arm
    // first-match suffix CASE generated from the same Seq the engine
    // folds — quirks (the fused '.xyz/.earth' dead entry) included.
    "x27_company_extract" ->
      s"""WITH f AS (SELECT doc_id,
         |    CASE doc_id % 11
         |      WHEN 0 THEN 'https://www.corp' || CAST(doc_id % 47 AS VARCHAR) || '.com'
         |      WHEN 1 THEN 'https://corp' || CAST(doc_id % 47 AS VARCHAR) || '.io/'
         |      WHEN 2 THEN 'https://github.com/corp' || CAST(doc_id % 47 AS VARCHAR) || '/'
         |      WHEN 3 THEN 'https://www.corp' || CAST(doc_id % 47 AS VARCHAR) || '.com/en/'
         |      WHEN 4 THEN 'https://www.corp' || CAST(doc_id % 47 AS VARCHAR) || '.com.br/'
         |      WHEN 5 THEN 'corp' || CAST(doc_id % 47 AS VARCHAR) || '.xyz/'
         |      WHEN 6 THEN 'corp' || CAST(doc_id % 47 AS VARCHAR) || '.earth'
         |      WHEN 7 THEN '  https://corp' || CAST(doc_id % 47 AS VARCHAR) || '.ai  '
         |      WHEN 8 THEN 'corp' || CAST(doc_id % 47 AS VARCHAR) || '.co.jp'
         |      WHEN 9 THEN ''
         |      ELSE NULL END AS company_link
         |  FROM documents),
         |p AS (SELECT doc_id, company_link,
         |    CASE WHEN starts_with(trim(company_link), 'https://www.')
         |           THEN substring(trim(company_link), 13)
         |         WHEN starts_with(trim(company_link), 'https://')
         |           THEN substring(trim(company_link), 9)
         |         ELSE trim(company_link) END AS c
         |  FROM f)
         |SELECT doc_id, company_link,
         |  CASE WHEN company_link IS NULL OR trim(company_link) = '' THEN ''
         |       ELSE $companySuffixCaseSql END AS company
         |FROM p ORDER BY doc_id""".stripMargin,
    // x28: identical fixture pages; the dl→span→join('\n' over stripped
    // <p>) chain replayed — missing dl/span → NULL but a zero-<p> span
    // → '' (the reference's unconditional join once the span is found;
    // DuckDB's array_to_string is NULL on an empty list, hence the
    // coalesce — Spark's array_join gives '').
    "x28_scrape_feasibility" ->
      """WITH pg AS (SELECT doc_id,
        |    '<html><body><h2>Idea ' || CAST(doc_id AS VARCHAR) || '</h2>'
        |      || CASE WHEN doc_id % 7 <= 4 THEN
        |           '<dl id="custom-field-section-4027"><dt>Feasibility</dt><dd>'
        |           || CASE WHEN doc_id % 7 <= 3 THEN
        |                '<span class="ql-editor ql-render">'
        |                || CASE doc_id % 7
        |                     WHEN 0 THEN '<p>  feas_' || CAST(doc_id % 71 AS VARCHAR) || '_0 </p>'
        |                                   || '<p>  feas_' || CAST(doc_id % 71 AS VARCHAR) || '_1 </p>'
        |                     WHEN 1 THEN '<p>  feas_' || CAST(doc_id % 71 AS VARCHAR) || '_0 </p>'
        |                     WHEN 2 THEN '<p>  feas_' || CAST(doc_id % 71 AS VARCHAR) || '_0 </p><p></p>'
        |                                   || '<p>  feas_' || CAST(doc_id % 71 AS VARCHAR) || '_2 </p>'
        |                     ELSE 'pending review' END
        |                || '</span>'
        |              ELSE '<em>no preview</em>' END
        |           || '</dd></dl>'
        |         ELSE '<dl id="other-section"><dt>x</dt></dl>' END
        |      || '</body></html>' AS html
        |  FROM documents),
        |ex AS (SELECT doc_id,
        |    regexp_extract(html, '<dl id="custom-field-section-4027">(.*?)</dl>', 1) AS dl
        |  FROM pg),
        |ex2 AS (SELECT doc_id, dl,
        |    regexp_extract(dl, '<span class="ql-editor ql-render">(.*?)</span>', 1) AS sp
        |  FROM ex)
        |SELECT doc_id,
        |  CASE WHEN dl = '' OR sp = '' THEN NULL
        |       ELSE coalesce(array_to_string(list_transform(
        |              regexp_extract_all(sp, '<p>([^<]*)</p>', 1),
        |              x -> trim(x)), chr(10)), '') END AS feasibility
        |FROM ex2 ORDER BY doc_id""".stripMargin,
    // x29: identical fixture anchors; the href-or-stripped-text chain
    // replayed for both selectors, Python's falsy `or` (empty href
    // falls to text) included.
    "x29_scrape_links" ->
      """WITH pg AS (SELECT doc_id,
        |    '<html><body>'
        |      || CASE doc_id % 4
        |           WHEN 0 THEN '<a class="unfurl-url classic-link" href="https://corp_'
        |                         || CAST(doc_id % 43 AS VARCHAR) || '.com">corp_'
        |                         || CAST(doc_id % 43 AS VARCHAR) || ' home</a>'
        |           WHEN 1 THEN '<a class="unfurl-url classic-link">  corp_'
        |                         || CAST(doc_id % 43 AS VARCHAR) || ' site  </a>'
        |           WHEN 2 THEN '<a class="unfurl-url classic-link" href="">corp_'
        |                         || CAST(doc_id % 43 AS VARCHAR) || ' fallback</a>'
        |           ELSE '' END
        |      || '<p>between</p>'
        |      || CASE doc_id % 5
        |           WHEN 0 THEN '<a class="sc-ffb617e7-0 fTVUpX" href="https://site_'
        |                         || CAST(doc_id % 41 AS VARCHAR) || '.org">site_'
        |                         || CAST(doc_id % 41 AS VARCHAR) || '</a>'
        |           WHEN 1 THEN '<a class="sc-ffb617e7-0 fTVUpX"> site_'
        |                         || CAST(doc_id % 41 AS VARCHAR) || ' </a>'
        |           WHEN 2 THEN '<a class="sc-ffb617e7-0 fTVUpX" href="">site_'
        |                         || CAST(doc_id % 41 AS VARCHAR) || ' page</a>'
        |           WHEN 3 THEN '<a class="sc-ffb617e7-0 fTVUpX" href="https://site_'
        |                         || CAST(doc_id % 41 AS VARCHAR) || '.net"></a>'
        |           ELSE '' END
        |      || '</body></html>' AS html
        |  FROM documents),
        |ex AS (SELECT doc_id,
        |    regexp_extract(html, '<a class="unfurl-url classic-link"[^>]*>[^<]*</a>', 0) AS cw,
        |    regexp_extract(html, '<a class="unfurl-url classic-link"[^>]*href="([^"]*)"[^>]*>', 1) AS ch,
        |    trim(regexp_extract(html, '<a class="unfurl-url classic-link"[^>]*>([^<]*)</a>', 1)) AS ct,
        |    regexp_extract(html, '<a class="sc-ffb617e7-0 fTVUpX"[^>]*>[^<]*</a>', 0) AS ww,
        |    regexp_extract(html, '<a class="sc-ffb617e7-0 fTVUpX"[^>]*href="([^"]*)"[^>]*>', 1) AS wh,
        |    trim(regexp_extract(html, '<a class="sc-ffb617e7-0 fTVUpX"[^>]*>([^<]*)</a>', 1)) AS wt
        |  FROM pg)
        |SELECT doc_id,
        |  CASE WHEN cw = '' THEN NULL WHEN ch <> '' THEN ch ELSE ct END AS company_link,
        |  CASE WHEN ww = '' THEN NULL WHEN wh <> '' THEN wh ELSE wt END AS website_link
        |FROM ex ORDER BY doc_id""".stripMargin,
    // x30: identical fixture pages; the case-insensitive label
    // contains-test and next-sibling strip replayed — whitespace-only
    // sibling, wrong label, and no-h3 all land NULL like the
    // reference's None.
    "x30_scrape_applicant_pc" ->
      """WITH pg AS (SELECT doc_id,
        |    '<html><body>'
        |      || CASE doc_id % 6
        |           WHEN 0 THEN '<h3>[General] Name and Surname of main applicant</h3>pc_applicant_'
        |                         || CAST(doc_id % 61 AS VARCHAR) || '<div class="sep">|</div>'
        |           WHEN 1 THEN '<h3>[general] name and surname of main applicant</h3>  pc_applicant_'
        |                         || CAST(doc_id % 61 AS VARCHAR) || '  <p>next</p>'
        |           WHEN 2 THEN '<h3>Q1: [GENERAL] NAME AND SURNAME OF MAIN APPLICANT *</h3>pc_applicant_'
        |                         || CAST(doc_id % 61 AS VARCHAR) || '<br>'
        |           WHEN 3 THEN '<h3>[general] name and surname of main applicant</h3>   <div>x</div>'
        |           WHEN 4 THEN '<h3>Budget breakdown</h3>someone'
        |           ELSE '<p>no headings here</p>' END
        |      || '</body></html>' AS html
        |  FROM documents)
        |SELECT doc_id, CASE WHEN t = '' THEN NULL ELSE t END AS applicant
        |FROM (SELECT doc_id, trim(regexp_extract(html,
        |    '(?i)<h3>[^<]*\[general\] name and surname of main applicant[^<]*</h3>([^<]*)',
        |    1)) AS t FROM pg)
        |ORDER BY doc_id""".stripMargin,
    "x23_quality_calibration" ->
      """WITH q AS (
        |  SELECT doc_id, source,
        |    length(text) AS n_chars_len,
        |    CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS stop_cnt
        |  FROM documents),
        |s AS (SELECT doc_id, source,
        |    (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
        |      - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
        |      - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
        |      + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END)
        |      AS quality_score
        |  FROM q)
        |SELECT doc_id, source, quality_score,
        |  percent_rank() OVER (PARTITION BY source
        |    ORDER BY quality_score ASC NULLS LAST, doc_id) AS calibrated
        |FROM s ORDER BY doc_id""".stripMargin,
    // c6: d6's candidate derivation (k widened to 20) + x18's chunk
    // tiling over the candidates only + exact integer term hits — the
    // hybrid rank reproduces the engine's two-stage retrieval
    "c6_hybrid_retrieval" ->
      ("WITH cand AS (SELECT * FROM (" + lshTopKOracleSql(20) + ")),\n" +
        hybridTailSql),
    // c15: c6's lexical leg + fusion verbatim, the candidate leg from
    // the d32 refined chain (top-20 by exact cosine for query 0).
    "c15_retrieval_refined" ->
      (s"""WITH $ivfPqRefinedCtes,
          |cand AS (SELECT vec_id, cos_sim FROM (
          |    SELECT *, row_number() OVER (PARTITION BY q_id
          |      ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)
          |  WHERE q_id = 0 AND rn <= 20),
          |""".stripMargin + hybridTailSql),

    "d13_batch_ann" ->
      s"""WITH np AS (
         |  SELECT coalesce(min(p), 24) AS np FROM range(25) r(p)
         |  WHERE p >= 4 AND (CAST(32 AS BIGINT) << p) >= (SELECT count(*) FROM embeddings)),
         |planes AS (
         |  SELECT p, list((${h60sql.format("'plane' || p || ':' || i")} % 2001 - 1000) / 1000.0
         |                 ORDER BY i) AS w
         |  FROM range(24) rp(p), range(64) ri(i), np WHERE p < np.np GROUP BY p),
         |n AS (
         |  SELECT vec_id,
         |         (SELECT sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), pl.w) >= 0
         |                          THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
         |          FROM planes pl) AS bucket,
         |         CAST(embedding AS DOUBLE[]) AS v,
         |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings e),
         |probes AS (
         |  SELECT n.vec_id, n.v, n.nrm,
         |         CASE WHEN r.p = np.np THEN n.bucket
         |              ELSE xor(n.bucket, CAST(1 AS BIGINT) << r.p) END AS pb
         |  FROM n, np, range(25) r(p) WHERE r.p <= np.np),
         |pairs AS (
         |  SELECT a.vec_id, b.vec_id AS neighbor_id,
         |         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_sim
         |  FROM probes a JOIN n b ON a.pb = b.bucket AND a.vec_id <> b.vec_id),
         |ranked AS (
         |  SELECT vec_id, neighbor_id, cos_sim,
         |         CAST(row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS nn_rank
         |  FROM pairs)
         |SELECT vec_id, nn_rank, neighbor_id, cos_sim
         |FROM ranked WHERE nn_rank <= 3 ORDER BY vec_id, nn_rank""".stripMargin,
    "x1_token_stats" ->
      """SELECT doc_id, length(text) AS n_chars_len,
        |  CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(regexp_extract_all(lower(text), '\w+'))) AS BIGINT) AS n_uniq_tokens,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) /
        |    len(regexp_extract_all(lower(text), '\w+')) AS avg_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x2_lang_id" ->
      """SELECT doc_id, lang AS labeled_lang,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS hits_en,
        |  CAST(len(regexp_extract_all(lower(text), '\b(el|la|de|que|los|una)\b')) AS BIGINT) AS hits_es,
        |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ein|mit)\b')) AS BIGINT) AS hits_de,
        |  CAST(len(regexp_extract_all(lower(text), '\b(le|les|des|une|est|dans)\b')) AS BIGINT) AS hits_fr,
        |  CAST(len(regexp_extract_all(lower(text), '\b(的|是|不|在|了)\b')) AS BIGINT) AS hits_zh,
        |  CASE
        |    WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_zh THEN 'en'
        |    WHEN hits_es >= hits_de AND hits_es >= hits_fr AND hits_es >= hits_zh THEN 'es'
        |    WHEN hits_de >= hits_fr AND hits_de >= hits_zh THEN 'de'
        |    WHEN hits_fr >= hits_zh THEN 'fr'
        |    ELSE 'zh' END AS predicted_lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    // d18: the same three integer Lloyd rounds as a generated CTE chain
    // — one loop bound feeds both engines (the q58 discipline)
    "d18_kmeans" -> kmeansOracleSql,
    // d28/d29: the IVF chain replayed exactly — d18's Lloyd CTEs give
    // the fitted cells (c3) and every vector's home list (a3); each
    // query ranks cells by (integer sqdist, cid) and probes the top
    // nprobe=2; exact cosine over probed lists; top-10 per query.
    // One oracle for both storage postures (d21/d19 discipline).
    "d28_ivf_topk" -> ivfTopKOracleSql,
    "d29_ivf_optimized" -> ivfTopKOracleSql,
    // d30/d31: the PQ chain (eight per-subspace Lloyd chains + code
    // table + query LUTs) replayed exactly; d31 additionally replays
    // d28's router and restricts the ADC scan to probed cells.
    "d30_pq_topk" -> pqTopKOracleSql,
    "d31_ivf_pq" -> ivfPqOracleSql,
    "d32_ivf_pq_refined" -> ivfPqRefinedOracleSql,
    "c16_reindex_loop" -> reindexLoopOracleSql,
    // d33: sliding-window hashes per position, corpus-wide dup test,
    // running-max-end island merge — all exact integer arithmetic.
    "d33_substring_dedup" -> substringDedupOracleSql,
    "x25_substring_clean" -> substringCleanOracleSql,
    // d34: the same span chain, restricted to delta documents — the
    // incremental rule (stored + delta counts >= 2) IS d33's rule.
    "d34_incremental_substring" -> incrSubstringOracleSql,
    // c7: every stage replayed — x3 scoring, exact-dedup window,
    // survivor-scoped IVF pairs + recursive closure, the seeded k-means
    // chain over keepers, the per-cluster budget window, and x12's
    // prefix-sum packing — one hash-compared per-document relation.
    "c7_curation_pipeline" ->
      s"""WITH RECURSIVE q0 AS MATERIALIZED (
         |  SELECT doc_id, text,
         |    length(text) AS n_chars_len,
         |    CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens,
         |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
         |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
         |    CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS BIGINT) AS stop_cnt
         |  FROM documents),
         |sc AS MATERIALIZED (SELECT q0.*,
         |    (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
         |      - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
         |      - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
         |      + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END)
         |      AS quality_score
         |  FROM q0),
         |kept0 AS MATERIALIZED (SELECT * FROM sc WHERE quality_score > 0),
         |ex AS MATERIALIZED (SELECT doc_id, quality_score, n_tokens FROM (
         |    SELECT k.*, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
         |    FROM kept0 k) WHERE doc_id = keeper),
         |semb AS MATERIALIZED (SELECT e.vec_id, e.embedding FROM embeddings e
         |  JOIN ex ON ex.doc_id = e.vec_id),
         |ncell AS MATERIALIZED (SELECT coalesce(min(c), 4096) AS nc FROM range(4097) r(c)
         |  WHERE c >= 8 AND c*c*64 >= (SELECT count(*) FROM semb)),
         |centroids AS MATERIALIZED (
         |  SELECT c, list((${h60sql.format("'cent' || c || ':' || i")} % 2001 - 1000) / 1000.0
         |                 ORDER BY i) AS w
         |  FROM range(4096) rc(c), range(64) ri(i), ncell WHERE c < ncell.nc GROUP BY c),
         |nv AS MATERIALIZED (SELECT vec_id,
         |         (SELECT c FROM centroids
         |          ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), w) DESC, c
         |          LIMIT 1) AS cell,
         |         CAST(embedding AS DOUBLE[]) AS v,
         |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM semb e),
         |vp AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM nv a JOIN nv b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $semanticCosThreshold),
         |edges AS MATERIALIZED (SELECT va AS src, vb AS dst FROM vp
         |          UNION ALL SELECT vb, va FROM vp),
         |closure(a, b) AS (
         |  SELECT doc_id, doc_id FROM ex
         |  UNION
         |  SELECT c.a, e.dst FROM closure c JOIN edges e ON c.b = e.src),
         |comp AS MATERIALIZED (SELECT a AS doc_id, min(b) AS component FROM closure GROUP BY a),
         |keepers AS MATERIALIZED (SELECT doc_id FROM comp WHERE doc_id = component),
         |kemb AS MATERIALIZED (SELECT e.vec_id, e.embedding FROM embeddings e
         |  JOIN keepers k ON k.doc_id = e.vec_id),
         |${kmeansCtes("kemb")},
         |cl AS MATERIALIZED (SELECT x.doc_id, a3.cid, x.quality_score, x.n_tokens
         |  FROM ex x JOIN keepers k USING (doc_id) JOIN a3 ON a3.vec_id = x.doc_id),
         |bud AS MATERIALIZED (SELECT CAST(sum(n_tokens) // (2 * count(DISTINCT cid)) AS BIGINT)
         |  AS budget FROM cl),
         |r AS MATERIALIZED (SELECT cl.*, sum(n_tokens) OVER (PARTITION BY cid
         |    ORDER BY quality_score DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM cl),
         |sel AS MATERIALIZED (SELECT r.doc_id, r.cid, r.quality_score, r.n_tokens
         |  FROM r, bud WHERE r.cum <= bud.budget),
         |o AS MATERIALIZED (SELECT doc_id, cid, quality_score, n_tokens,
         |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
         |  FROM sel)
         |SELECT doc_id, cid, quality_score, n_tokens, start_off,
         |  start_off // 2048 AS seq_start,
         |  CASE WHEN n_tokens = 0 THEN start_off // 2048
         |       ELSE (start_off + n_tokens - 1) // 2048 END AS seq_end
         |FROM o ORDER BY doc_id""".stripMargin,
    // c5: x3's score formula + per-source greedy budget cut; the budget
    // derives from the corpus (half the mean per-source token mass)
    "c5_training_mix" ->
      """WITH q AS (
        |  SELECT doc_id, source,
        |    length(text) AS n_chars_len,
        |    CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS stop_cnt
        |  FROM documents),
        |s AS (SELECT q.*,
        |    (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
        |      - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
        |      - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
        |      + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END)
        |      AS quality_score
        |  FROM q),
        |b AS (SELECT CAST(sum(n_tokens) // (2 * count(DISTINCT source)) AS BIGINT)
        |        AS budget FROM s),
        |r AS (SELECT source, doc_id, n_tokens, quality_score,
        |        sum(n_tokens) OVER (PARTITION BY source
        |          ORDER BY quality_score DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM s)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS mix_tokens,
        |  min(quality_score) AS cut_quality
        |FROM r, b WHERE r.cum <= b.budget
        |GROUP BY source ORDER BY source""".stripMargin,
    "x3_quality_score" ->
      """SELECT doc_id, length(text) AS n_chars_len,
        |  CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_cnt,
        |  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_cnt,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS stop_cnt,
        |  CAST(punct_cnt AS DOUBLE) / n_chars_len AS punct_ratio,
        |  CAST(digit_cnt AS DOUBLE) / n_chars_len AS digit_ratio,
        |  CAST(stop_cnt AS DOUBLE) / n_tokens AS stop_ratio,
        |  (CAST(stop_cnt AS DOUBLE) / n_tokens) * 5.0
        |    - (CAST(punct_cnt AS DOUBLE) / n_chars_len) * 3.0
        |    - (CAST(digit_cnt AS DOUBLE) / n_chars_len) * 2.0
        |    + (CASE WHEN n_chars_len BETWEEN 100 AND 400 THEN 0.5 ELSE 0.0 END) AS quality_score
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x4_fingerprint" ->
      s"""SELECT d.doc_id AS doc_id,
         |  sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp_sha,
         |  CAST(coalesce(fp.fp_roll, 0) AS BIGINT) AS fp_roll
         |FROM documents d LEFT JOIN (
         |  SELECT doc_id,
         |    CAST(sum(CAST(i AS BIGINT) * (${h60sql.format("w")} % 2147483647)) % 2147483647 AS BIGINT) AS fp_roll
         |  FROM (SELECT doc_id, generate_subscripts(t, 1) AS i, unnest(t) AS w
         |        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents))
         |  GROUP BY doc_id) fp ON fp.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin)
}
