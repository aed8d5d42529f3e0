package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TrainingData

/** Semantics of [[TrainingData.passageDedup]] (d17) on hand-built
  * corpora where the expected survivor set is enumerable, plus the
  * global invariants any corpus must satisfy.
  */
class PassageDedupSpec extends SparkSpec {

  test("first occurrence survives, later copies removed, reassembly ordered") {
    import spark.implicits._
    // passageLen=2 tiles: doc0 = [a b][c d], doc1 = [a b][x y],
    // doc2 = [x y][a b] — "a b" first occurs at (0,0), "x y" at (1,1)
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b x y"),
      (2L, "x y a b"))
      .toDF("doc_id", "text")
    val out = TrainingData.passageDedup(docs, passageLen = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)]
      .collect()
      .toSeq
    assert(out == Seq(
      (0L, 2L, 0L, "a b c d"),
      (1L, 2L, 1L, "x y"),
      (2L, 2L, 2L, "")))
  }

  test("intra-document repetition dedups too (first tile wins)") {
    import spark.implicits._
    val docs = Seq((7L, "a b a b a b")).toDF("doc_id", "text")
    val out = TrainingData.passageDedup(docs, passageLen = 2)
      .as[(Long, Long, Long, String)]
      .collect()
      .toSeq
    assert(out == Seq((7L, 3L, 2L, "a b")))
  }

  test("randomized corpora: passageDedup equals an in-memory reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Array("a", "b", "c") // tiny vocab forces passage collisions
    for (trial <- 1 to 3) {
      val docs = (0L until 30L).map { id =>
        (id, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(3))).mkString(" "))
      }
      // reference: tile into 2-token passages, keep global first
      // occurrence by (doc, idx), reassemble in order
      val tiles = docs.flatMap { case (id, text) =>
        text.split(" ").grouped(2).zipWithIndex
          .map { case (ws, i) => (id, i.toLong, ws.mkString(" ")) }
      }
      val keeper = tiles.groupBy(_._3).view
        .mapValues(_.map(t => (t._1, t._2)).min).toMap
      val expected = tiles.groupBy(_._1).view.mapValues { ts =>
        val sorted = ts.sortBy(_._2)
        val kept = sorted.filter(t => keeper(t._3) == ((t._1, t._2)))
        (sorted.size.toLong, (sorted.size - kept.size).toLong,
          kept.map(_._3).mkString(" "))
      }.toMap
      val got = TrainingData.passageDedup(docs.toDF("doc_id", "text"), passageLen = 2)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == expected, s"trial $trial diverged")
    }
  }

  test("invariants on the real corpus: kept count = distinct passages, clean docs untouched") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val tiled = TrainingData.chunkSplit(docs, 4, 4)
    val distinctPassages = tiled.select(col("chunk")).distinct().count()
    val out = TrainingData.passageDedup(docs).cache()
    try {
      val (kept, tiles) = out
        .agg(sum(col("n_passages") - col("n_removed")), sum(col("n_passages")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).head
      assert(kept == distinctPassages,
        "survivors must be exactly one occurrence per distinct passage")
      assert(tiles == tiled.count())
      // a doc with nothing removed reassembles to exactly its own tiling
      val reassembled = tiled.groupBy(col("doc_id"))
        .agg(concat_ws(" ", transform(
          sort_array(collect_list(struct(col("chunk_idx"), col("chunk")))),
          s => s.getField("chunk"))).as("orig"))
      val mismatched = out.filter(col("n_removed") === 0)
        .join(reassembled, Seq("doc_id"))
        .filter(col("clean_text") =!= col("orig"))
        .count()
      assert(mismatched == 0)
    } finally out.unpersist()
  }
}
