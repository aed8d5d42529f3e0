package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Relational

/** Semantics of [[Relational.intervalUnion]] (q63) on enumerable
  * interval sets: overlap must not double-count, gaps must not bridge,
  * abutting intervals chain, and the result is independent of input
  * row order.
  */
class IntervalUnionSpec extends SparkSpec {

  test("overlap merges, gaps split, abutting chains") {
    import spark.implicits._
    // user 1: [0,60) ∪ [30,90) ∪ [90,150) = one 150s island (overlap +
    //   abut), then [300,360) after a gap — 210s over 2 islands.
    // user 2: two disjoint slivers — 120s over 2 islands.
    // user 3: duplicate of the same interval — 60s, 1 island, 2 rows.
    val iv = Seq(
      (1L, 0L, 60L), (1L, 30L, 90L), (1L, 90L, 150L), (1L, 300L, 360L),
      (2L, 0L, 60L), (2L, 1000L, 1060L),
      (3L, 5L, 65L), (3L, 5L, 65L))
      .toDF("user_id", "s", "e")
    val out = Relational.intervalUnion(iv)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 2L, 210L),
      (2L, 2L, 2L, 120L),
      (3L, 2L, 1L, 60L)))
  }

  test("randomized intervals: intervalUnion equals an in-memory sweep reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(63)
    for (trial <- 1 to 3) {
      // dense variable-length intervals so ends arrive out of order
      // relative to starts — the case the running-max (not last-end)
      // formulation exists for
      val rows = (1 to 150).map { _ =>
        val s = rnd.nextInt(500).toLong
        (rnd.nextInt(5).toLong, s, s + 1 + rnd.nextInt(80))
      }
      val expected = rows.groupBy(_._1).view.mapValues { iv =>
        val sorted = iv.map(t => (t._2, t._3)).sorted
        var islands = List.empty[(Long, Long)] // head = current island
        for ((s, e) <- sorted) islands match {
          case (st, en) :: tail if s <= en =>
            islands = (st, math.max(en, e)) :: tail
          case _ => islands = (s, e) :: islands
        }
        (iv.size.toLong, islands.size.toLong,
          islands.map { case (st, en) => en - st }.sum)
      }.toMap
      val got = Relational.intervalUnion(rows.toDF("user_id", "s", "e"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("inverted intervals are dropped, zero-width intervals contribute nothing") {
    import spark.implicits._
    // user 1: a valid hour plus an INVERTED row (e < s) that, if
    // processed, would open its own island with a negative span
    // (coverage 60 - 50 = 10 would corrupt to ...); user 2: only
    // inverted rows — the user must vanish entirely, not appear with
    // garbage; user 3: a zero-width [s, s) row alongside a real one —
    // counted as an interval, covering nothing.
    val iv = Seq(
      (1L, 0L, 60L), (1L, 500L, 450L),
      (2L, 90L, 30L),
      (3L, 0L, 60L), (3L, 200L, 200L))
      .toDF("user_id", "s", "e")
    val out = Relational.intervalUnion(iv)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, 60L),
      (3L, 2L, 2L, 60L)))
  }

  test("result is independent of input row order") {
    import spark.implicits._
    val rows = Seq(
      (7L, 100L, 160L), (7L, 40L, 100L), (7L, 0L, 60L), (7L, 500L, 560L))
    val fwd = Relational.intervalUnion(rows.toDF("user_id", "s", "e"))
      .collect().toSeq
    val rev = Relational.intervalUnion(rows.reverse.toDF("user_id", "s", "e"))
      .collect().toSeq
    assert(fwd == rev)
    // [0,60)∪[40,100)∪[100,160) chain into one 160s island + the far one
    assert(fwd.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      == Seq((7L, 4L, 2L, 220L)))
  }
}
