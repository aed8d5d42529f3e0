package graft.operators

import graft.SparkSpec

/** Semantics of [[Similarity.kmeans]] beyond the oracle hash: cluster
  * sizes partition the corpus, Lloyd's objective is (rounding-slack)
  * monotone across rounds, results are deterministic across runs, and
  * the assignment hot path never joins or shuffles the corpus.
  */
class KmeansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("cluster sizes partition the corpus; ssd monotone; deterministic") {
    val n = emb.count()
    def run(iters: Int) = Similarity.kmeans(emb, 8, iters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val r3 = run(3)
    assert(r3.map(_._2).sum == n, "members must partition the corpus")
    assert(r3.map(_._1).distinct.size == r3.size)
    // Lloyd monotonicity with integer-centroid slack: each round's
    // floored mean is within 1 of the true minimizer per dimension, so
    // the objective can exceed exact-Lloyd's by at most ~n·dims
    val ssd = (1 to 3).map(i => run(i).map(_._3).sum)
    val slack = n * 64
    assert(ssd(1) <= ssd(0) + slack, s"round 2 ssd ${ssd(1)} > ${ssd(0)} + $slack")
    assert(ssd(2) <= ssd(1) + slack, s"round 3 ssd ${ssd(2)} > ${ssd(1)} + $slack")
    assert(run(3) == r3, "re-run must reproduce identical clusters")
  }

  test("fit + persisted-centroid assignment ≡ one-shot kmeansAssign; zone round-trips") {
    import org.apache.spark.sql.functions.col
    // the c10 factorization must be invisible: fitting once, persisting
    // the centroids, loading them back, and assigning is bit-identical
    // to the one-shot path — for the fit corpus AND for a disjoint
    // delta assigned later (here: the same frame split by id)
    val cents = Similarity.kmeansFit(emb)
    val zone = tmpDir("centzone") + "/z"
    Similarity.saveCentroids(spark, cents, zone)
    val loaded = Similarity.loadCentroids(spark, zone)
    assert(loaded.map(_.toSeq) == cents.map(_.toSeq), "zone round-trip changed centroids")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    val oneShot = rows(Similarity.kmeansAssign(emb))
    assert(rows(Similarity.assignToCentroids(emb, loaded)) == oneShot,
      "persisted-centroid assignment diverged from the one-shot path")
    // a later delta assigns against the SAME centroids — no Lloyd re-run
    val cutId = emb.count() * 4L / 5L
    val delta = emb.filter(col("vec_id") >= cutId)
    assert(rows(Similarity.assignToCentroids(delta, loaded)) ==
      oneShot.filter(_._1 >= cutId),
      "delta assignment diverged from the corpus assignment's restriction")
  }

  test("clusters equal an in-memory Lloyd reference (quantize, assign, recompute)") {
    // triple pin: the Spark result, the DuckDB oracle, and this
    // in-memory fold must all agree — replicate the operator's exact
    // contract (positive-shift quantization, distance-weighted hashed
    // seeding, long squared distances, lower-cid tiebreak,
    // sum-div-count centroids, empty keeps old)
    val raw = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    val q = raw.map { case (id, v) =>
      id -> v.map(x => math.floor((x.toDouble + 1.0) * 1048576.0).toLong)
    }
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def draw(i: Int, id: Long): Double =
      (h60(s"seed$i:$id") % 1048576L + 1L).toDouble / 1048576.0
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum
    var chosen = Seq(q.maxBy { case (id, _) => (draw(0, id), -id) })
    for (i <- 1 until 8) {
      chosen = chosen :+ q.maxBy { case (id, v) =>
        (chosen.map(c => sqd(v, c._2)).min.toDouble * draw(i, id), -id)
      }
    }
    var cents = chosen.toMap.toSeq.sortBy(_._1).map(_._2.clone()).toArray
    var assign: Map[Long, (Int, Long)] = Map.empty
    for (it <- 1 to 3) {
      assign = q.map { case (id, v) =>
        val byDist = cents.zipWithIndex.map { case (c, cid) =>
          (v.zip(c).map { case (a, b) => val d = a - b; d * d }.sum, cid)
        }
        val (d, cid) = byDist.min
        id -> (cid, d)
      }.toMap
      if (it < 3) {
        cents = cents.zipWithIndex.map { case (old, cid) =>
          val members = q.filter { case (id, _) => assign(id)._1 == cid }
          if (members.isEmpty) old
          else {
            val n = members.length
            Array.tabulate(64)(d => members.map(_._2(d)).sum / n)
          }
        }
      }
    }
    val expected = assign.values.groupBy(_._1).map { case (cid, m) =>
      cid.toLong -> (m.size.toLong, m.map(_._2).sum)
    }
    val got = Similarity.kmeans(emb, 8, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("LongSqDist equals the interpreted fold bit-for-bit on every corpus vector") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorExpressions.register(spark)
    val q = emb.selectExpr("vec_id",
      "transform(embedding, x -> floor((CAST(x AS DOUBLE) + 1.0D) * 1048576.0D)) AS qv")
    val c = q.orderBy(col("vec_id")).limit(1).collect()(0).getSeq[Long](1)
    val lc = array(c.map(lit(_)): _*)
    val mismatch = q.select(
      graft.functions.VectorExpressions.sqdist(col("qv"), lc).as("native"),
      aggregate(zip_with(col("qv"), lc, (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x).as("fold"))
      .filter(col("native") =!= col("fold")).count()
    assert(mismatch == 0)
  }

  test("assignment path has no Join and no corpus-sized Exchange") {
    val p = Similarity.kmeans(emb, 8, 3).queryExecution.executedPlan.toString
    // distances are literal-centroid folds over a narrow scan: the
    // corpus is never joined; the only exchanges are the k-row final
    // aggregate and the k-row output sort
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }
}
