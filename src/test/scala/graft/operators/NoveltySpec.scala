package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TrainingData

/** Semantics of [[TrainingData.ngramNovelty]] (x22) on hand-built
  * corpora where first-occurrence attribution is enumerable, plus the
  * conservation invariant any corpus must satisfy.
  */
class NoveltySpec extends SparkSpec {

  test("first copy scores 1.0, an exact re-crawl scores 0.0, partial overlap in between") {
    import spark.implicits._
    // trigram shingles: doc0 {a b c, b c d}; doc1 = exact dup of doc0;
    // doc2 {a b c, b c x, c x y, x y z} — one of four already seen.
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b c d"),
      (2L, "a b c x y z"))
      .toDF("doc_id", "text")
    val out = TrainingData.ngramNovelty(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 2L, 1.0),
      (1L, 2L, 0L, 0.0),
      (2L, 4L, 3L, 0.75)))
  }

  test("conservation: total novel shingles across docs = distinct shingles in the corpus") {
    import spark.implicits._
    val docs = Seq(
      (10L, "the quick brown fox jumps"),
      (11L, "the quick brown dog sleeps"),
      (12L, "a wholly different sentence here"),
      (13L, "the quick brown fox jumps")) // re-crawl of 10
      .toDF("doc_id", "text")
    val scored = TrainingData.ngramNovelty(docs)
    val totalNovel = scored.agg(sum($"n_novel")).as[Long].head()
    val distinctShingles = Dedup
      .shingles(docs, $"doc_id", $"text", 3)
      .select($"shingle").distinct().count()
    // every distinct shingle has exactly one first occurrence
    assert(totalNovel == distinctShingles)
    // the re-crawl contributes nothing new
    assert(scored.filter($"doc_id" === 13L)
      .select($"n_novel").as[Long].head() == 0L)
  }
}
