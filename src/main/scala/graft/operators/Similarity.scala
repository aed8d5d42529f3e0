package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * All arithmetic is double fold-left in array order (`aggregate` over
  * `zip_with`), bit-reproducible in any engine that folds sequentially
  * (DuckDB `list_dot_product` over DOUBLE[] does).
  */
object Similarity {

  /** Sequential-fold dot product of two float/double array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector (given as a 1-row
    * DataFrame with column `qvec`). Query side is broadcast; corpus scan
    * stays narrow.
    */
  def bruteForceTopK(corpus: DataFrame, query: DataFrame, k: Int): DataFrame =
    corpus.crossJoin(broadcast(query))
      .select(col("vec_id"), cosine(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)

  /** Deterministic pseudo-random hyperplane component: text-hash mapped
    * to [-1000, 1000] / 1000. Same construction is expressible in the
    * SQL oracle, so LSH bucketing is verifiable cross-engine.
    */
  private def planeWeight(plane: Int, dim: Column): Column =
    (TextOps.h60(concat(lit(s"plane$plane:"), dim)) % 2001 - 1000).cast("double") / 1000.0

  /** Sign-random-projection bucket id: one bit per hyperplane (1 if
    * v·plane >= 0). Narrow projection — no shuffle, no data-dependent
    * state; planes are derived from hashes so every executor computes
    * them identically with nothing broadcast.
    */
  def srpBucket(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        transform(vec, (x, i) => x.cast("double") * planeWeight(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via SRP-LSH: restrict the exact cosine scan to the query's
    * bucket. Recall < 1 by construction (that is the trade); the bucketed
    * scan touches corpus/2^nPlanes of the data in expectation.
    */
  def lshTopK(corpus: DataFrame, query: DataFrame, nPlanes: Int, k: Int): DataFrame = {
    val bucketed = corpus.withColumn("bucket", srpBucket(col("embedding"), nPlanes))
    val q = query.withColumn("qbucket", srpBucket(col("qvec"), nPlanes))
    bucketed.join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col("vec_id"), cosine(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }
}
