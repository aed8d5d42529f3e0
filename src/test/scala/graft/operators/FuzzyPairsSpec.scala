package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Dedup.fuzzyPairs]]: blocked edit-distance semantics — candidate
  * generation (first-token blocks), the degenerate-block cap, the
  * length lower-bound prefilter, and the distance threshold.
  */
class FuzzyPairsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], maxDist: Int, maxBlock: Int) =
    Dedup.fuzzyPairs(rows.toDF("id", "t"), col("id"), col("t"), maxDist, maxBlock)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("close titles in one block pair up with their exact distance") {
    val got = pairs(Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamba"),     // one substitution from #1
      (3L, "alpha zzzzzzzz gamma"), // dist 8 from #1 -> beyond maxDist 3
      (4L, "omega beta gamma")),    // different block, never compared
      maxDist = 3, maxBlock = 10)
    assert(got == Set((1L, 2L, 1L)))
  }

  test("degenerate blocks above the cap are dropped entirely") {
    val big = (1L to 5L).map(i => (i, s"stop word$i"))
    assert(pairs(big, maxDist = 3, maxBlock = 4).isEmpty)
    assert(pairs(big, maxDist = 3, maxBlock = 5).nonEmpty)
  }

  test("length lower bound never drops a pair the distance threshold would keep") {
    // |len diff| = 4 > maxDist 3 -> prefiltered; true distance is also 4,
    // so the prefilter is consistent with the threshold (lower bound).
    val got = pairs(Seq((1L, "key ab"), (2L, "key abcdef")), maxDist = 3, maxBlock = 10)
    assert(got.isEmpty)
    // and a same-length rewrite within the threshold still lands
    val got2 = pairs(Seq((1L, "key abcdef"), (2L, "key abcxyz")), maxDist = 3, maxBlock = 10)
    assert(got2 == Set((1L, 2L, 3L)))
  }
}
