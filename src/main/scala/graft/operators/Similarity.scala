package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and sign-random-
  * projection LSH bucketing as the scale path.
  *
  * Scale design: brute-force is a broadcast of the QUERY vectors (never
  * the corpus) over a narrow map — linear scan, no shuffle, top-k via
  * TakeOrderedAndProject. The LSH path prunes the scan to one bucket per
  * query: bucket assignment is a narrow projection, the bucket join is
  * hash-partitioned on the (small-cardinality) bucket key. At 100 TB the
  * corpus side stays partition-parallel in both paths.
  *
  * Dot products run through [[graft.functions.DotProduct]] — a codegen'd
  * Catalyst expression whose sequential accumulation is bit-identical to
  * a fold-left and to DuckDB's `list_dot_product` over DOUBLE[] (oracle
  * parity), ~8x faster than the interpreted higher-order-function
  * formulation kept in [[dotFold]] for reference/testing.
  */
object Similarity {

  /** Register the custom vector expressions on the session (idempotent);
    * called internally by every entry point that sees a session.
    */
  def ensure(spark: SparkSession): Unit = VectorExpressions.register(spark)

  /** Codegen'd sequential dot product (see [[graft.functions.DotProduct]]). */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotp(a, b)

  /** Reference implementation: interpreted fold — same result bit-for-bit,
    * kept for parity tests and for sessions without registration.
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector (given as a 1-row
    * DataFrame with column `qvec`). Query side is broadcast; corpus scan
    * stays narrow.
    */
  def bruteForceTopK(corpus: DataFrame, query: DataFrame, k: Int): DataFrame = {
    ensure(corpus.sparkSession)
    corpus.crossJoin(broadcast(query))
      .select(col("vec_id"), cosine(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane, computed driver-side from
    * md5 (identical to the SQL-oracle derivation: first 15 hex digits of
    * md5("plane<p>:<dim>") mod 2001, mapped to [-1, 1]). Materialized as
    * an array literal so bucket assignment is one codegen'd dot per
    * plane — nothing broadcast, every executor sees the same constant.
    */
  private[graft] def planeWeights(p: Int, dims: Int): Seq[Double] =
    (0 until dims).map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"plane$p:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      (h % 2001 - 1000).toDouble / 1000.0
    }

  /** Sign-random-projection bucket id: one bit per hyperplane (1 if
    * v·plane >= 0). Narrow projection — no shuffle.
    */
  def srpBucket(vec: Column, nPlanes: Int, dims: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val plane = array(planeWeights(p, dims).map(lit): _*)
      when(dot(vec, plane) >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic pseudo-random centroid for the IVF-style coarse
    * quantizer — same md5 derivation family as [[planeWeights]] (seed
    * string "cent<c>:<i>"), so any engine (and the SQL oracle) recomputes
    * the identical centroids. Materialized as array literals: cell
    * assignment is nCentroids codegen'd dots per row, no broadcast state,
    * no shuffle.
    */
  private[graft] def centroidWeights(c: Int, dims: Int): Seq[Double] =
    (0 until dims).map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cent$c:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      (h % 2001 - 1000).toDouble / 1000.0
    }

  /** Coarse-quantizer cell id: argmax over centroid dot products (ties →
    * smallest centroid index, so assignment is total and deterministic).
    * The struct-max trick keeps the argmax inside one codegen'd
    * projection: max over (score, -index) structs orders by score first,
    * then prefers the smaller index.
    */
  def coarseCell(vec: Column, nCentroids: Int, dims: Int): Column = {
    val scored = (0 until nCentroids).map { c =>
      val centroid = array(centroidWeights(c, dims).map(lit): _*)
      struct(dot(vec, centroid).as("score"), lit(-c).as("negc"))
    }
    (greatest(scored: _*).getField("negc") * -1).cast("int")
  }

  /** Smallest plane count `p` in [minPlanes, maxPlanes] such that the
    * EXPECTED bucket population n / 2^p is at most `targetBucketSize` —
    * i.e. ceil(log2(n / target)), computed in exact integer arithmetic
    * (an FP log2 can round an exact power of two across the ceil
    * boundary, and the SQL oracle must re-derive the identical count).
    * This is the batch-ANN twin of sequence packing's corpus-derived
    * `packBucketCount`: with a FIXED plane count, sum(bucket²) join cost
    * is quadratic in the corpus; deriving planes from one cheap count()
    * keeps expected per-bucket membership — and so per-bucket join
    * cost — constant as the corpus grows.
    */
  def derivePlanes(n: Long, targetBucketSize: Long = 32,
      minPlanes: Int = 4, maxPlanes: Int = 24): Int = {
    require(targetBucketSize > 0 && minPlanes >= 0 && maxPlanes >= minPlanes,
      s"bad plane bounds: target=$targetBucketSize min=$minPlanes max=$maxPlanes")
    var p = minPlanes
    while (p < maxPlanes && (targetBucketSize << p) < n) p += 1
    p
  }

  /** IVF coarse-cell count derived from the corpus: smallest c in
    * [minCells, maxCells] with c²·dims ≥ n — i.e. c ≈ √(n/dims), the
    * point where the quantizer's two cost terms balance. Flat argmax
    * assignment costs n·c·dims (every row dots every centroid) and the
    * within-cell self-join costs ~n²/c; a FIXED cell count lets the
    * join term grow quadratically with the corpus (the flaw
    * [[derivePlanes]] fixes for SRP buckets), while cells ∝ n would
    * blow up the assignment term instead. √(n/dims) grows both
    * sub-linearly: at 5k vectors it lands on 9 cells, at 1B on ~4000.
    * Exact integer arithmetic (no FP sqrt whose rounding could disagree
    * across engines) — the SQL oracle re-derives the identical count
    * with the same smallest-c search. Past maxCells a real deployment
    * stops flat-assigning and trains a hierarchical quantizer; the
    * clamp marks that boundary explicitly.
    */
  def deriveCells(n: Long, dims: Int = 64,
      minCells: Int = 8, maxCells: Int = 4096): Int = {
    require(dims > 0 && minCells >= 1 && maxCells >= minCells,
      s"bad cell bounds: dims=$dims min=$minCells max=$maxCells")
    var c = minCells
    while (c < maxCells && c.toLong * c * dims < n) c += 1
    c
  }

  /** Batch ANN: EVERY vector gets its k nearest neighbors among the
    * vectors in its own SRP bucket or any Hamming-1 neighbor bucket —
    * the corpus-wide similarity-search workload (retrieval indexing,
    * embedding-level near-dup mining) rather than [[lshTopK]]'s single
    * query vector. The plane count derives from the corpus size via
    * [[derivePlanes]] (one cheap count()); pass `maxBucket` to drop
    * pathologically dense buckets (near-duplicate pileups — the
    * stop-shingle cap's ANN analogue) before any pairwise work.
    */
  def batchTopK(corpus: DataFrame, k: Int, dims: Int = 64,
      targetBucketSize: Long = 32, minPlanes: Int = 4, maxPlanes: Int = 24,
      maxBucket: Option[Long] = None, knownCount: Option[Long] = None): DataFrame = {
    // knownCount skips the derivation scan when the caller already knows
    // the corpus size (table stats, a prior action) — the derivation is
    // log-scaled, so an approximate count lands on the same plane count
    // unless it is off by ~2x.
    val n = knownCount.getOrElse(corpus.count())
    val planes = derivePlanes(n, targetBucketSize, minPlanes, maxPlanes)
    batchTopKWithPlanes(corpus, planes, k, dims, maxBucket)
  }

  /** [[batchTopK]] with an explicit plane count (spec/verification seam).
    *
    * Scale design: the all-pairs formulation is quadratic and dies at
    * corpus scale; SRP bucketing turns it into ONE hash-partitioned
    * join (`shuffle_hash` hint — neither side of a corpus self-join may
    * broadcast) whose per-bucket cost is bounded because [[derivePlanes]]
    * holds expected bucket size constant. Cross-bucket recall comes from
    * MULTI-PROBE: each vector probes its own bucket plus the nPlanes
    * Hamming-1 buckets (each plane bit flipped), so a true neighbor on
    * the far side of ONE hyperplane is still found; the probe side is
    * amplified (nPlanes+1)× ≈ log2(corpus)× — logarithmic, not
    * quadratic, and the index side shuffles exactly once. Each (vector,
    * neighbor) pair arises from exactly one probe (the neighbor's single
    * bucket), so no dedup is needed.
    *
    * Top-k is TWO-LEVEL so the pair stream never re-shuffles at corpus
    * scale: the first window keys `(pb, vec_id)` — leading with the join
    * key lets it REUSE the join's hash partitioning (partition-local
    * sort only, no Exchange; pinned by PlanShapeSpec) — and prunes each
    * probe's candidates to k; the second window re-ranks per vec_id over
    * at most (nPlanes+1)·k surviving rows per vector, so its Exchange
    * carries k·log(corpus) rows per vector, not the pair stream. Global
    * top-k over a union equals top-k over per-group top-k's, so the
    * two-level result is exact. Norms are computed once per vector,
    * never per pair; the bucketed projection is persisted (tracked) so
    * the corpus is scanned once, not once per join side.
    */
  def batchTopKWithPlanes(corpus: DataFrame, nPlanes: Int, k: Int, dims: Int = 64,
      maxBucket: Option[Long] = None): DataFrame = {
    ensure(corpus.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val bucketed0 = corpus.select(
      col("vec_id"),
      srpBucket(col("embedding"), nPlanes, dims).as("bucket"),
      col("embedding"),
      norm(col("embedding")).as("nrm"))
    // Optional stop-bucket cap: a bucket holding f vectors costs f² join
    // rows; dropping over-dense buckets bounds the worst case the same
    // way Dedup.capShingles bounds shingle buckets.
    val bucketed = maxBucket.fold(bucketed0) { m =>
      bucketed0
        .withColumn("bcnt", count(lit(1)).over(Window.partitionBy(col("bucket"))))
        .filter(col("bcnt") <= m).drop("bcnt")
    }
    val n = graft.core.Caches.persistTracked(bucketed)
    // own bucket last so the common case (match in own bucket) is intact
    val probeCols = (0 until nPlanes).map(p =>
      col("bucket").bitwiseXOR(lit(1L << p))) :+ col("bucket")
    val a = n.select(col("vec_id"), explode(array(probeCols: _*)).as("pb"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = n.select(col("bucket").as("bb"), col("vec_id").as("neighbor_id"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val pairs = a.hint("shuffle_hash")
      .join(b, col("pb") === col("bb") && col("vec_id") =!= col("neighbor_id"))
      .select(col("pb"), col("vec_id"), col("neighbor_id"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos_sim"))
    val wLocal = Window.partitionBy(col("pb"), col("vec_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val local = pairs.withColumn("lr", row_number().over(wLocal))
      .filter(col("lr") <= k).drop("lr")
    val wGlobal = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    local.withColumn("nn_rank", row_number().over(wGlobal).cast("long"))
      .filter(col("nn_rank") <= k)
      .select(col("vec_id"), col("nn_rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** ANN via SRP-LSH with multi-probe: the exact cosine scan is
    * restricted to the query's bucket PLUS its Hamming-1 neighbor
    * buckets (each plane bit flipped) — same recall recovery as
    * [[batchTopKWithPlanes]], at (planes+1)/2^planes expected corpus
    * fraction scanned. The plane count derives from the corpus size
    * ([[derivePlanes]]) so the scanned fraction shrinks as the corpus
    * grows; the probe list is query-side (tiny) and broadcast, the
    * corpus never shuffles. Each corpus vector lives in exactly one
    * bucket, so probes never duplicate a candidate.
    */
  def lshTopK(corpus: DataFrame, query: DataFrame, k: Int,
      dims: Int = 64, targetBucketSize: Long = 32,
      minPlanes: Int = 4, maxPlanes: Int = 24,
      knownCount: Option[Long] = None): DataFrame = {
    ensure(corpus.sparkSession)
    val planes = derivePlanes(knownCount.getOrElse(corpus.count()),
      targetBucketSize, minPlanes, maxPlanes)
    val bucketed = corpus.withColumn("bucket", srpBucket(col("embedding"), planes, dims))
    val probes = query.withColumn("qbucket", srpBucket(col("qvec"), planes, dims))
      .select(col("qvec"), explode(array(
        (0 until planes).map(p => col("qbucket").bitwiseXOR(lit(1L << p))) :+
          col("qbucket"): _*)).as("pb"))
    bucketed.join(broadcast(probes), col("bucket") === col("pb"))
      .select(col("vec_id"), cosine(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic integer k-means (Lloyd) over the embedding column —
    * the PARTITIONAL clustering the curation stack lacks: d15's
    * connected components give transitive near-dup groups, k-means
    * gives a fixed-k semantic partition (topic bucketing for mixture
    * weights, per-cluster sampling quotas, coverage audits). Float
    * k-means can never hash-match an oracle (mean order, FP distance
    * ties), so everything runs in exact integer space:
    * vectors quantize to longs via `floor((x + 1) * 2^20)` (the +1
    * shift keeps every value positive, so floor ≡ the truncation both
    * engines apply and centroid division cannot straddle zero; 2^20 is
    * a power of two, so the double multiply is IEEE-exact), distances
    * are exact long sums of squared diffs, centroids recompute as
    * `sum div count`, and assignment ties break on the lower cluster
    * id. The `x >= -1` quantization precondition is CHECKED (one
    * `min(array_min(...))` agg folded into the seeding pass): an
    * out-of-range value would yield negative quantized longs, where
    * Scala's truncating centroid division diverges from a SQL oracle's
    * floor `//` — a silent cross-engine drift; it must fail loudly.
    *
    * Initialization is deterministic distance-weighted sampling (the
    * k-means‖ idea with hash randomness, so any engine replays it):
    * seed 0 maximizes a per-vector uniform `u_0 in (0,1]` derived from
    * md5(vec_id); each next seed maximizes
    * `sqdist_to_nearest_chosen · u_i` — far vectors are favored
    * (k-means++'s D² weighting) but a hashed draw keeps a single
    * extreme outlier from always winning. Each seeding pass is one
    * narrow corpus scan ending in a TakeOrdered(1) — no shuffle, no
    * join; k passes total. Ties break on the lower vec_id; a corpus
    * with fewer distinct vectors than k degenerates to repeated picks,
    * which COLLAPSE (distinct-by-vec_id) so both engines land on the
    * same <=k centroid set. Cluster ids are the seeds' vec_id rank —
    * the oracle's dense_rank ordering.
    *
    * Scale shape: the per-iteration hot path is ONE narrow scan — the
    * k distance expressions are [[graft.functions.LongSqDist]] native
    * codegen'd primitive loops (NOT interpreted zip_with/aggregate
    * folds — a higher-order function breaks whole-stage codegen, which
    * compounds at k expressions per row per round; bit-equality with
    * the fold is pinned in KmeansSpec) against LITERAL centroid arrays
    * (k·dims longs, rebuilt on the driver each round exactly like a
    * watermark read), so the corpus
    * never shuffles for assignment; the centroid recompute is a
    * posexplode + partial-aggregated groupBy(cid, dim) whose exchange
    * carries k·dims rows per partition, and the k·dims result rows
    * come back to the driver (KBs). Empty clusters keep their previous
    * centroid. `iters` is fixed (Lloyd converges fast and the oracle
    * CTE chain is generated from the same bound, the q58 discipline).
    */
  def kmeans(embeddings: DataFrame, k: Int = 8, iters: Int = 3): DataFrame =
    kmeansAssign(embeddings, k, iters)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), sum(col("dist")).as("ssd"))
      .orderBy(col("cid"))

  /** Per-vector uniform draw in (0,1] from md5 — bit-identical to the
    * oracle's `(h60('seed<i>:' || vec_id) % 2^20 + 1) / 2^20.0`.
    */
  private def seedDraw(i: Int): Column =
    ((graft.operators.TextOps.h60(
      concat(lit(s"seed$i:"), col("vec_id").cast("string"))) % 1048576L + 1L)
      .cast("double") / 1048576.0)

  /** [[kmeans]]'s per-vector assignment: (vec_id, dist, cid) after
    * `iters` Lloyd rounds — the seam pipelines consume for per-cluster
    * quotas (c7) while [[kmeans]] itself reports the cluster summary.
    * Composition of [[kmeansFit]] (the model) and [[assignToCentroids]]
    * (the projection), factored so an incremental pipeline can PERSIST
    * the fitted centroids ([[saveCentroids]]) and assign later deltas
    * without re-running Lloyd (c10's posture).
    */
  def kmeansAssign(embeddings: DataFrame, k: Int = 8, iters: Int = 3): DataFrame =
    assignToCentroids(embeddings, kmeansFit(embeddings, k, iters))

  /** Run the seeding + `iters` Lloyd rounds and return the FINAL
    * centroids — the ones the round-`iters` assignment uses (after
    * `iters - 1` recomputes), so
    * `assignToCentroids(emb, kmeansFit(emb))` ≡ the one-shot
    * [[kmeansAssign]] bit for bit (KmeansSpec pins it).
    */
  def kmeansFit(embeddings: DataFrame, k: Int = 8, iters: Int = 3): Seq[Array[Long]] = {
    require(k > 0, s"kmeans needs k > 0 clusters (got $k)")
    require(iters > 0, s"kmeans needs iters > 0 rounds (got $iters)")
    ensure(embeddings.sparkSession)
    // persistTracked: the quantized projection feeds k seeding scans +
    // iters assignment scans + (iters-1) centroid recomputes — without
    // the cache the transform() quantization re-runs on every one of
    // those ~k+2·iters jobs (the cached frame is vec_id + dims longs)
    val q = graft.core.Caches.persistTracked(
      embeddings.select(col("vec_id"),
        expr("transform(embedding, x -> floor((CAST(x AS DOUBLE) + 1.0D) * 1048576.0D))")
          .as("qv")))
    // --- seeding: k narrow scans, each a TakeOrdered(1) / 1-row agg ---
    val first = q
      .agg(
        min(array_min(col("qv"))).as("gmn"),
        max_by(struct(col("vec_id"), col("qv")),
          struct(seedDraw(0).as("score"), (col("vec_id") * -1L).as("tie"))).as("s"))
      .head()
    // an empty corpus yields one all-null agg row — fail readably
    // before getLong would throw an opaque NPE (callers like c7 reach
    // here when an upstream filter leaves zero surviving embeddings)
    require(!first.isNullAt(0),
      "kmeans needs a non-empty embeddings frame (the input produced zero rows)")
    require(first.getLong(0) >= 0L,
      s"kmeans quantization precondition violated: embedding value < -1 " +
        s"(min quantized = ${first.getLong(0)}) — truncating centroid division " +
        "would silently diverge from the oracle's floor division")
    val s0 = first.getStruct(1)
    var chosen: Seq[(Long, Array[Long])] =
      Seq(s0.getLong(0) -> s0.getSeq[Long](1).toArray)
    for (i <- 1 until k) {
      val dists = chosen.map { case (_, c) =>
        VectorExpressions.sqdist(col("qv"), array(c.toSeq.map(lit(_)): _*))
      }
      // least() rejects a single argument — step 1 has one centroid
      val nd = if (dists.size == 1) dists.head else least(dists: _*)
      val next = q
        .select(col("vec_id"), col("qv"),
          (nd.cast("double") * seedDraw(i)).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(1).head()
      chosen = chosen :+ (next.getLong(0) -> next.getSeq[Long](1).toArray)
    }
    // collapse degenerate repeats, assign cids by seed vec_id rank
    var cents: Seq[Array[Long]] = chosen.toMap.toSeq.sortBy(_._1).map(_._2)
    for (it <- 1 until iters) {
      val sums = assignedTo(q, cents)
        .select(col("cid"), posexplode(col("qv")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byC = sums.groupBy(_.getLong(0))
      cents = cents.zipWithIndex.map { case (old, cid) =>
        byC.get(cid.toLong).fold(old) { rows =>
          val next = old.clone()
          rows.foreach(r => next(r.getInt(1)) = r.getLong(2) / r.getLong(3))
          next
        }
      }
    }
    cents
  }

  /** The literal-centroid argmin over a quantized frame — k codegen'd
    * [[graft.functions.LongSqDist]] primitive loops per row against
    * literal arrays; ZERO shuffle, the corpus never moves.
    */
  private def assignedTo(q: DataFrame, cents: Seq[Array[Long]]): DataFrame = {
    val best = array_min(array(cents.zipWithIndex.map { case (c, cid) =>
      val lc = array(c.toSeq.map(lit(_)): _*)
      struct(
        VectorExpressions.sqdist(col("qv"), lc).as("dist"),
        lit(cid.toLong).as("cid"))
    }: _*))
    q.select(col("vec_id"), col("qv"),
      best.getField("dist").as("dist"), best.getField("cid").as("cid"))
  }

  /** Assign ANY embedding frame to fixed centroids: (vec_id, dist, cid).
    * This is c10's per-delta admission step — the centroids are
    * literals (k·dims longs, the watermark altitude), so assignment is
    * one narrow codegen'd projection over the delta with zero shuffle
    * and zero history reads.
    */
  def assignToCentroids(embeddings: DataFrame,
      cents: Seq[Array[Long]]): DataFrame = {
    ensure(embeddings.sparkSession)
    val q = embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> floor((CAST(x AS DOUBLE) + 1.0D) * 1048576.0D))")
        .as("qv"))
    assignedTo(q, cents).select(col("vec_id"), col("dist"), col("cid"))
  }

  /** Persist fitted centroids as a k-row zone (cid, centroid) — the
    * model artifact the incremental loop reads back ([[loadCentroids]],
    * a k·dims driver read) to assign each admitted delta without
    * re-running Lloyd. Corpus-level REFRESH rebuilds it (the c8
    * boundary: quotas move when the whole mix moves).
    */
  def saveCentroids(spark: SparkSession, cents: Seq[Array[Long]],
      dir: String): Unit = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)
  }

  /** k·dims driver read, served from the fingerprint-guarded cache
    * ([[graft.core.MetaReads]]): the loops re-read centroids per
    * trigger by contract, and the fingerprint key preserves exactly
    * that — a refresh cutover lands new part files, so the next
    * trigger's read misses and picks up the re-fit.
    */
  def loadCentroids(spark: SparkSession, dir: String): Seq[Array[Long]] =
    graft.core.MetaReads.rows(spark, dir)
      .sortBy(_.getAs[Long]("cid"))
      .map(_.getAs[scala.collection.Seq[Long]]("centroid").toArray).toSeq
}
