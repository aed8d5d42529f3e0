package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of [[TrainingData.c5TrainingMix]] beyond the oracle hash:
  * the selection is exactly the maximal greedy prefix of each source's
  * quality-ordered document list under the corpus-derived token budget —
  * pinned against an in-memory reference built from x3's scores.
  */
class TrainingMixSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("c5 equals the in-memory greedy prefix per source") {
    val mix = TrainingData.c5TrainingMix(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // independent reference: x3's scored docs + the documents table's
    // source column, greedily folded in memory
    val scored = TrainingData.x3QualityScore(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source")), "doc_id")
      .collect().map(r => (r.getString(3), r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bySource = scored.groupBy(_._1)
    val budget = scored.map(_._3).sum / (2L * bySource.size)
    val expected = bySource.map { case (src, docs) =>
      val ordered = docs.sortBy(d => (-d._4, d._2))
      var cum = 0L
      val kept = ordered.takeWhile { d => cum += d._3; cum <= budget }
      src -> kept
    }
    for ((src, kept) <- expected) {
      // a source whose single best document exceeds the budget has an
      // EMPTY greedy prefix and is absent from c5's grouped output —
      // assert that correspondence first so a fixture where it occurs
      // fails readably instead of with NoSuchElementException below
      assert(mix.contains(src) == kept.nonEmpty,
        s"$src: output presence ${mix.contains(src)} != expected-prefix nonEmpty ${kept.nonEmpty}")
      if (kept.nonEmpty) {
        val (nDocs, tokens, cutQ) = mix(src)
        assert(nDocs == kept.length, s"$src: n_docs $nDocs != ${kept.length}")
        assert(tokens == kept.map(_._3).sum, s"$src: token mismatch")
        assert(cutQ == kept.map(_._4).min, s"$src: cut_quality mismatch")
        assert(tokens <= budget, s"$src: budget exceeded")
      }
      // maximality: the best unselected doc cannot fit
      val tokens = kept.map(_._3).sum
      val nextBest = bySource(src).sortBy(d => (-d._4, d._2)).drop(kept.length).headOption
      nextBest.foreach(d =>
        assert(tokens + d._3 > budget, s"$src: greedy prefix not maximal"))
    }
    assert(mix.keySet == expected.filter(_._2.nonEmpty).keySet)
  }

  test("x23 calibration is the exact per-source (rank-1)/(n-1) grid") {
    // independent of the oracle hash: within each source, the calibrated
    // values must be exactly the percent_rank grid positions under the
    // (score, doc_id) total order — 0 for the worst, 1 for the best,
    // uniform steps between (no ties exist: doc_id breaks them)
    val rows = TrainingData.x23QualityCalibration(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val n = docs.length
      docs.sortBy(d => (d._3, d._2)).zipWithIndex.foreach {
        case ((_, id, _, calib), i) =>
          val expect = if (n == 1) 0.0 else i.toDouble / (n - 1)
          assert(calib == expect, s"$src doc $id: calibrated $calib != $expect")
      }
    }
  }
}
