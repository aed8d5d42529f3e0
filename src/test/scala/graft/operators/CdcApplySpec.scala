package graft.operators

import graft.SparkSpec
import graft.queries.Relational

/** MERGE semantics of [[Relational.cdcApply]] (q57's seam) on fixtures
  * where every path is enumerable: update, delete, insert, untouched
  * base, no-op delete of a missing key, stale (lower-seq) change
  * ignored, and deterministic (key, seq) tie resolution.
  */
class CdcApplySpec extends SparkSpec {

  test("all MERGE paths: update, delete, insert, kept, no-op delete, stale ignored") {
    import spark.implicits._
    val base = Seq(
      (1L, 100L), // updated (seq 2 wins over stale seq 1 delete)
      (2L, 200L), // deleted
      (3L, 300L)) // untouched
      .toDF("key", "cents")
    val changes = Seq(
      (1L, 1L, "D", 0L),   // stale — superseded by seq 2
      (1L, 2L, "U", 111L),
      (2L, 1L, "D", 0L),
      (4L, 1L, "U", 444L), // key not in base -> insert
      (5L, 1L, "D", 0L))   // delete of missing key -> no-op
      .toDF("key", "seq", "op", "new_cents")
    val out = Relational.cdcApply(base, changes)
      .orderBy("key")
      .as[(Long, Long, String)]
      .collect()
      .toSeq
    assert(out == Seq(
      (1L, 111L, "updated"),
      (3L, 300L, "kept"),
      (4L, 444L, "inserted")))
  }

  test("(key, seq) tie resolves by lexicographic (seq, op, new_cents) max") {
    import spark.implicits._
    val base = Seq((1L, 100L), (2L, 200L)).toDF("key", "cents")
    val changes = Seq(
      (1L, 1L, "D", 0L), (1L, 1L, "U", 50L),  // 'U' > 'D' -> update wins
      (2L, 1L, "U", 10L), (2L, 1L, "U", 20L)) // higher cents wins
      .toDF("key", "seq", "op", "new_cents")
    val out = Relational.cdcApply(base, changes)
      .orderBy("key")
      .as[(Long, Long, String)]
      .collect()
      .toSeq
    assert(out == Seq((1L, 50L, "updated"), (2L, 20L, "updated")))
  }
}
