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

  test("randomized feeds: cdcApply equals an in-memory reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(58)
    for (trial <- 1 to 3) {
      val base = (0L to 15L).filter(_ => rnd.nextBoolean())
        .map(k => (k, 100L + rnd.nextInt(900)))
      val feed = (1 to 120).map { i =>
        (rnd.nextInt(21).toLong, 1L + rnd.nextInt(5),
          if (rnd.nextInt(4) == 0) "D" else "U", rnd.nextInt(1000).toLong)
      }
      // reference: lexicographic-max change per key, applied over base
      val latest = feed.groupBy(_._1).view
        .mapValues(_.maxBy(c => (c._2, c._3, c._4))).toMap
      val expected = ((base.map(_._1) ++ latest.keys).distinct.flatMap { k =>
        (base.toMap.get(k), latest.get(k)) match {
          case (Some(c), None) => Some(k -> (c, "kept"))
          case (_, Some((_, _, "D", _))) => None
          case (Some(_), Some((_, _, _, nc))) => Some(k -> (nc, "updated"))
          case (None, Some((_, _, _, nc))) => Some(k -> (nc, "inserted"))
          case (None, None) => None
        }
      }).toMap
      val got = Relational.cdcApply(
          base.toDF("key", "cents"), feed.toDF("key", "seq", "op", "new_cents"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      assert(got == expected, s"trial $trial diverged")
    }
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
