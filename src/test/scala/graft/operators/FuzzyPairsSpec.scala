package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Dedup.fuzzyPairs]]: blocked edit-distance semantics — candidate
  * generation (first/last/second-token blocking passes), the
  * degenerate-block cap per pass, the length lower-bound prefilter, and
  * the banded distance threshold.
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
      (4L, "omega beta gamma")),    // shares #1's LAST token; dist 4 -> out
      maxDist = 3, maxBlock = 10)
    assert(got == Set((1L, 2L, 1L)))
  }

  test("later passes recover pairs whose FIRST token — or BOTH end tokens — were edited") {
    // Single-pass first-token blocking can never produce (1,2): the edit
    // is inside the block key. The last-token pass co-blocks them. And
    // (1,3) differs in BOTH end tokens — which the second-token pass
    // reaches (middle within deletion distance 0).
    val got = pairs(Seq(
      (1L, "cat beta gamma"),
      (2L, "car beta gamma"),   // first-token edit, dist 1
      (3L, "cut beta gamms")),  // first+last BOTH edited: dist 2 from #1
      maxDist = 3, maxBlock = 10)
    assert(got.contains((1L, 2L, 1L)), got)
    assert(got.contains((1L, 3L, 2L)), got)
    // pair found by SEVERAL passes (edit in the middle) appears exactly once
    val both = pairs(Seq((1L, "key mid gamma"), (2L, "key mud gamma")),
      maxDist = 3, maxBlock = 10)
    assert(both == Set((1L, 2L, 1L)))
  }

  test("deletion-key pass reaches ALL-three-tokens-edited pairs (maxDist 3 completeness)") {
    // Formerly the documented recall hole: one edit per token, dist 3.
    // Neither end token survives, but "betx" is one deletion from
    // "beta"'s neighborhood ("bet" is shared), so pass three co-blocks
    // them. At maxDist <= 3 on aligned three-token titles a missed pair
    // would need >= 1+2+1 = 4 edits — blocking is complete.
    val allThree = pairs(Seq(
      (1L, "cat beta gamma"),
      (2L, "cut betx gamms")),  // dist 3, every token edited
      maxDist = 3, maxBlock = 10)
    assert(allThree == Set((1L, 2L, 3L)), allThree)
    // middle token INSERTION (length change) also shares a deletion key
    val ins = pairs(Seq(
      (1L, "cat beta gamma"),
      (2L, "cut betta gamms")), // dist 3: tok2 via insertion
      maxDist = 3, maxBlock = 10)
    assert(ins == Set((1L, 2L, 3L)), ins)
  }

  test("negative pin of the NEW boundary: middle >= 2 edits with both ends edited is unreachable") {
    // dist 4 (1+2+1), maxDist 4: within the verify threshold, but no
    // pass can block it — first and last tokens edited, second token at
    // edit distance 2 (deletion-1 neighborhoods of "beta" and "bexx"
    // are disjoint). If a pass regression widens or narrows blocking,
    // this assertion moves, so the documented boundary stays honest.
    val got = pairs(Seq(
      (1L, "cat beta gamma"),
      (2L, "cut bexx gamms")),
      maxDist = 4, maxBlock = 10)
    assert(got.isEmpty, got)
  }

  test("degenerate blocks above the cap are dropped entirely, per pass") {
    // first tokens identical (block of 5); last tokens all distinct ->
    // pass 2 sees only singleton blocks, so the cap decides everything.
    val big = (1L to 5L).map(i => (i, s"stop word$i"))
    assert(pairs(big, maxDist = 3, maxBlock = 4).isEmpty)
    assert(pairs(big, maxDist = 3, maxBlock = 5).nonEmpty)
    // cap binds on the LAST-token pass independently: shared last token,
    // distinct first tokens.
    val bigLast = (1L to 5L).map(i => (i, s"word$i stop"))
    assert(pairs(bigLast, maxDist = 3, maxBlock = 4).isEmpty)
    assert(pairs(bigLast, maxDist = 3, maxBlock = 5).nonEmpty)
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
