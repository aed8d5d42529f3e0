package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cluster resolution over near-dup pairs: components must collapse
  * non-transitive pair chains, keepers must be the component minimum,
  * and the fixpoint must be exact (not iteration-capped).
  */
class DedupClusterSpec extends SparkSpec {

  private def cc(vertices: Seq[Long], pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    Dedup.connectedComponents(
        vertices.toDF("doc_id"),
        pairs.toDF("doc_a", "doc_b"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
  }

  test("jaccardPairs uncapped exact mode stays available and equals a no-op cap") {
    // d2 ships the capped universe (scale guard); the fully uncapped
    // exact mode is the explicit None opt-in — pin that it still works
    // and that the cap is a pure shingle-universe filter (a cap no
    // shingle reaches changes nothing).
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"), 3)
    val uncapped = Dedup.jaccardPairs(sh, 0.8, maxDocFreq = None)
      .orderBy("doc_a", "doc_b").collect()
    val noopCap = Dedup.jaccardPairs(sh, 0.8, maxDocFreq = Some(Long.MaxValue))
      .orderBy("doc_a", "doc_b").collect()
    assert(uncapped.nonEmpty)
    assert(uncapped.sameElements(noopCap))
  }

  test("deriveDocFreqCap: floored at 50, then ceil(sqrt n) — the oracle's SQL formula") {
    assert(Dedup.deriveDocFreqCap(0) == 50)
    assert(Dedup.deriveDocFreqCap(500) == 50)   // sf0.01
    assert(Dedup.deriveDocFreqCap(2500) == 50)  // boundary: sqrt = exactly 50
    assert(Dedup.deriveDocFreqCap(2501) == 51)
    assert(Dedup.deriveDocFreqCap(5000) == 71)  // sf0.1
    assert(Dedup.deriveDocFreqCap(1000000000L) == 31623) // 100 TB-ish corpus
  }

  test("qualityKeeper keeps exactly the highest-quality member per cluster (id tiebreak)") {
    import spark.implicits._
    // clusters: {1,2,3} (component 1), {7,8} (component 7), singleton 9
    val clusters = Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L), (9L, 9L, 1L))
      .toDF("doc_id", "component", "cluster_size")
    // doc 2 wins component 1 on score; 7 and 8 tie → min id 7 wins
    val quality = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.7),
      (7L, 0.4), (8L, 0.4), (9L, -1.0))
      .toDF("doc_id", "quality_score")
    val got = Dedup.qualityKeeper(clusters, quality)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(4))).toSeq
    assert(got == Seq(
      (1L, false), (2L, true), (3L, false),
      (7L, true), (8L, false), (9L, true)))
  }

  test("chain of pairs collapses to one component with min-id keeper") {
    // 1-2, 2-3, 3-4 is a chain: near-dup is not transitive but the
    // cluster must still be one component keyed by its min id.
    val got = cc(Seq(1L, 2L, 3L, 4L, 9L), Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got == Seq(
      (1L, 1L, 4L, true), (2L, 1L, 4L, false), (3L, 1L, 4L, false),
      (4L, 1L, 4L, false), (9L, 9L, 1L, true)))
  }

  test("long path needs diameter rounds — fixpoint still exact") {
    // a 12-vertex path: min label must travel the whole path.
    val n = 12L
    val verts = (0L until n)
    val path = (0L until n - 1).map(i => (i, i + 1))
    val got = cc(verts, path)
    assert(got.forall { case (_, comp, size, _) => comp == 0L && size == n })
    assert(got.count(_._4) == 1)
  }

  test("disjoint clusters stay disjoint; singletons are their own keeper") {
    val got = cc(Seq(1L, 2L, 5L, 6L, 7L), Seq((1L, 2L), (5L, 6L)))
    val byDoc = got.map(t => t._1 -> t).toMap
    assert(byDoc(1L) == (1L, 1L, 2L, true))
    assert(byDoc(2L) == (2L, 1L, 2L, false))
    assert(byDoc(5L) == (5L, 5L, 2L, true))
    assert(byDoc(6L) == (6L, 5L, 2L, false))
    assert(byDoc(7L) == (7L, 7L, 1L, true))
  }

  test("d20 bucketed iteration equals d9's in-memory resolution exactly") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.SparkEntry.queries("d9_dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    val b = graft.SparkEntry.queries("d20_cc_bucketed")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("d20 per-round join reads the bucketed edge scan with no edge-side Exchange") {
    val dir = "/root/testdata/sf0.001"
    val tbl = graft.queries.TrainingData.ccEdgeTable(spark, dir)
    val edges = spark.table(tbl)
    val labels = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("dst"), col("doc_id").as("ncomp"))
    // one fixpoint round's neighbor-min aggregate, exactly as ccResolve
    // builds it: labels is the shuffle_hash build side, the edge scan
    // must stream from its buckets unmoved
    val nmin = edges.join(labels.hint("shuffle_hash"), "dst")
      .groupBy(col("src").as("doc_id"))
      .agg(min(col("ncomp")).as("nmin"))
    val p = nmin.queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"), p)
    assert("Exchange hashpartitioning\\(dst".r.findAllIn(p).size == 1, p)
    assert(p.contains("ShuffledHashJoin"), p)
  }
}
