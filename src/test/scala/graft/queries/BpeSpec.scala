package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Bpe

/** x31/c18/x32: BPE tokenizer training, the trained-chain encode, and
  * the deterministic epoch shuffle.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def one(seq: String, l: String, r: String): String =
    Seq(seq).toDF("seq").select(Bpe.mergeOnce(col("seq"), l, r)).head.getString(0)

  test("mergeOnce fuses consecutive occurrences in one pass (x y x y -> xy xy)") {
    assert(one("x\ty\tx\ty", "x", "y") == "xy\txy")
  }

  test("mergeOnce is left-to-right non-overlapping (a a a -> aa a)") {
    assert(one("a\ta\ta", "a", "a") == "aa\ta")
    assert(one("a\ta\ta\ta", "a", "a") == "aa\taa")
  }

  test("mergeOnce anchors BOTH symbol boundaries (no prefix collisions)") {
    // (x, y) must not fire on the pair (x, yz) or (wx, y)
    assert(one("x\tyz", "x", "y") == "x\tyz")
    assert(one("wx\ty", "x", "y") == "wx\ty")
    // single-symbol and empty-pair-free sequences pass through
    assert(one("q", "x", "y") == "q")
  }

  test("train learns the hand-computed merge table with deterministic tiebreaks") {
    // words: low x5, lower x2, newest x3, aaa x3, banana x2, widest x3,
    // band x1. Step 1: (l,o)=7 ties (o,w)=7 -> lexicographic (l,o).
    // Step 2: (lo,w)=7. Step 3: three-way tie at 6 between (a,a)
    // [left-to-right within aaa: 2 per word], (e,s), (s,t) -> (a,a).
    val docs = Seq(
      (1L, "low low low low low lower lower newest newest aaa aaa banana"),
      (2L, "widest widest widest newest aaa banana band")).toDF("doc_id", "text")
    val m = Bpe.train(docs, col("text"), vocabTop = 1024, nMerges = 3)
    assert(m == Seq(
      Bpe.Merge(1, "l", "o", "lo", 7),
      Bpe.Merge(2, "lo", "w", "low", 7),
      Bpe.Merge(3, "a", "a", "aa", 6)))
  }

  test("applyMerges collapses a fully-learned word to one symbol") {
    val merges = Seq(
      Bpe.Merge(1, "l", "o", "lo", 0),
      Bpe.Merge(2, "lo", "w", "low", 0))
    val got = Seq("low").toDF("w")
      .select(Bpe.applyMerges(col("w"), merges)).head.getString(0)
    assert(got == "low")
    val partial = Seq("lower").toDF("w")
      .select(Bpe.applyMerges(col("w"), merges)).head.getString(0)
    assert(partial == "low\te\tr")
  }

  test("epochPermutation is a permutation, equals the naive global rank, and differs per epoch") {
    val docs = (1L to 97L).map(i => (i * 13L % 997L, s"d$i")).toDF("doc_id", "text")
    val n = docs.count()
    def naive(e: Int) = docs.select(col("doc_id"),
        graft.operators.TextOps.h60(
          concat(lit(s"epoch$e:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("pos", row_number().over(Window.orderBy(col("hk"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("pos"))
    for (e <- 0 to 1) {
      val got = TrainingData.epochPermutation(docs, e, n)
        .select(col("doc_id"), col("pos")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = naive(e).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"epoch $e diverges from the naive rank")
      assert(got.values.toSeq.sorted == (1L to n), s"epoch $e is not a permutation")
    }
    graft.core.Caches.release()
    val p0 = TrainingData.epochPermutation(docs, 0, n).collect().map(r => (r.getLong(1), r.getLong(2)))
    graft.core.Caches.release()
    val p1 = TrainingData.epochPermutation(docs, 1, n).collect().map(r => (r.getLong(1), r.getLong(2)))
    graft.core.Caches.release()
    assert(p0.toMap != p1.toMap, "different epochs must be different permutations")
  }
}
