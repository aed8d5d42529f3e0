package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[graft.queries.Relational.q61CappedRunningSum]]'s fold vs an
  * in-memory reference on randomized signed feeds — the clamp at both
  * edges, users whose history never clamps, and the (ts, event_id)
  * tie-break all land in random data; a crafted fixture pins the exact
  * arithmetic at each boundary.
  */
class CappedSumSpec extends SparkSpec {

  private val cap = 10000L

  private def reference(rows: Seq[(Long, Long, Long, Long)]): Map[Long, (Long, Long)] =
    rows.groupBy(_._1).view.mapValues { hs =>
      var bal = 0L; var clamps = 0L
      hs.sortBy(h => (h._2, h._3)).foreach { h =>
        val raw = bal + h._4
        if (raw > cap) { bal = cap; clamps += 1 }
        else if (raw < 0L) { bal = 0L; clamps += 1 }
        else bal = raw
      }
      (bal, clamps)
    }.toMap

  private def runSpark(rows: Seq[(Long, Long, Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val dir = tmpDir("cappedsum")
    rows.map { case (u, sec, eid, c) =>
      // reconstruct the events shape: value carries |c| and event_type
      // carries the sign, exactly as the query derives them
      (eid, u, new Timestamp(sec * 1000L),
        if (c < 0) "purchase" else "click", math.abs(c) / 100.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.queries.Relational.q61CappedRunningSum(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("boundary fixture: clamp high, clamp low, exact-cap landing, untouched user") {
    val rows = Seq(
      // user 1: 9900 + 200 -> clamp to cap; then -10100 -> clamp to 0
      (1L, 1L, 10L, 9900L), (1L, 2L, 11L, 200L), (1L, 3L, 12L, -10100L),
      // user 2: lands EXACTLY on cap — no clamp
      (2L, 1L, 20L, 4000L), (2L, 2L, 21L, 6000L),
      // user 3: drains to exactly 0 — no clamp
      (3L, 1L, 30L, 500L), (3L, 2L, 31L, -500L))
    assert(runSpark(rows) == Map(
      1L -> ((0L, 2L)), 2L -> ((cap, 0L)), 3L -> ((0L, 0L))))
  }

  test("randomized feeds: fold equals the in-memory reference") {
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 2) {
      val rows = (1 to 500).map { i =>
        ((rnd.nextInt(12).toLong, (1000 + rnd.nextInt(50)).toLong, i.toLong,
          (rnd.nextInt(8001) - 3000).toLong))
      }
      assert(runSpark(rows) == reference(rows), s"trial $trial diverged")
    }
  }
}
