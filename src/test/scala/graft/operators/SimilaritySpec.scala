package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the corpus-wide batch ANN ([[Similarity.batchTopK]]):
  * the in-bucket top-k must equal a brute-force per-bucket all-pairs
  * ranking, neighbors never cross buckets, and ranks are dense from 1.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64
  private lazy val corpus = {
    // Deterministic small corpus: 40 vectors derived from their id.
    val rows = (0 until 40).map { id =>
      (id.toLong, (0 until dims).map(i => ((id * 31 + i * 7) % 19 - 9).toFloat / 9f).toArray)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("batchTopK equals per-bucket brute force and never crosses buckets") {
    val k = 3
    val nPlanes = 2
    val got = Similarity.batchTopK(corpus, nPlanes, k, dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    // Reference: bucket every vector, all pairs within bucket, rank by
    // (cos desc, id) — computed with the interpreted fold (bit-identical
    // to the codegen'd DotProduct by VectorExpressionsSpec).
    val bucketed = corpus.select(
      col("vec_id"),
      Similarity.srpBucket(col("embedding"), nPlanes, dims).as("bucket"),
      col("embedding"))
    val a = bucketed.select(col("bucket"), col("vec_id"), col("embedding").as("ea"))
    val b = bucketed.select(col("bucket").as("bb"), col("vec_id").as("nb"), col("embedding").as("eb"))
    val ref = a.join(b, col("bucket") === col("bb") && col("vec_id") =!= col("nb"))
      .select(col("vec_id"), col("nb"),
        Similarity.cosine(col("ea"), col("eb")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (vid, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex.map {
          case ((_, nb, cos), i) => (vid, (i + 1).toLong, nb, cos)
        }
      }.sortBy(t => (t._1, t._2))

    assert(got.toSeq == ref)
    // dense ranks from 1 per vector
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length.toLong))
    }
    // no self-pairs
    assert(got.forall(t => t._1 != t._3))
  }
}
