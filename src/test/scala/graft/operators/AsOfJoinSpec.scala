package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of semantics: latest preceding, same-instant visible, none before -> null") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L), // after r1, before r2
      (1L, ts("2024-01-01 12:00:00"), 102L), // exactly at r2 -> sees r2
      (1L, ts("2024-01-01 08:00:00"), 103L), // before any right -> null
      (2L, ts("2024-01-01 10:00:00"), 201L)) // other key, no right rows -> null
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L),
      (1L, ts("2024-01-01 09:30:00"), 12L), // latest preceding for 101
      (1L, ts("2024-01-01 12:00:00"), 13L))
      .toDF("user_id", "ts", "event_id")

    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", Seq("event_id"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[java.lang.Long]("asof_event_id"))))
    assert(out.toSeq == Seq(
      101L -> Some(12L),
      102L -> Some(13L),
      103L -> None,
      201L -> None))
  }

  test("misuse fails fast: reserved _rts name and non-timestamp tolerance column") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "ts", "id")
    val rightRts = Seq((1L, ts("2024-01-01 09:00:00"), 2L, "x"))
      .toDF("k", "ts", "id", "_rts")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, rightRts, "k", "ts", "id", Seq("_rts"))
    }: Unit
    // tolerance requires a real TimestampType time column (unix_micros
    // over a long would fail deep inside analysis otherwise)
    val leftLong = Seq((1L, 10L, 1L)).toDF("k", "t", "id")
    val rightLong = Seq((1L, 9L, 2L)).toDF("k", "t", "id")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(leftLong, rightLong, "k", "t", "id", Seq("id"),
        toleranceMicros = Some(1000000L))
    }: Unit
  }

  test("all asof_* columns come from the SAME right row even when it carries nulls") {
    import spark.implicits._
    // r2 is the most recent right row but has a null in `b`; the output
    // must carry (a2, null), never mix r1's b with r2's a — the right row
    // travels as one struct through the window.
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, Some("a1"), Some("b1")),
      (1L, ts("2024-01-01 09:00:00"), 2L, Some("a2"), None: Option[String]))
      .toDF("user_id", "ts", "event_id", "a", "b")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", Seq("a", "b")).head()
    assert(out.getAs[String]("asof_a") == "a2")
    assert(out.getAs[String]("asof_b") == null)
  }

  test("forward direction: nearest FOLLOWING right row, same-instant visible, none after -> null") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L), // next right is r2 at 10:30
      (1L, ts("2024-01-01 12:00:00"), 102L), // exactly at r3 -> sees r3
      (1L, ts("2024-01-01 13:00:00"), 103L)) // after every right -> null
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L),
      (1L, ts("2024-01-01 10:30:00"), 12L),
      (1L, ts("2024-01-01 12:00:00"), 13L))
      .toDF("user_id", "ts", "event_id")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", Seq("event_id"),
        direction = "forward")
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[java.lang.Long]("asof_event_id"))))
    assert(out.toSeq == Seq(101L -> Some(12L), 102L -> Some(13L), 103L -> None))
  }

  test("tolerance nulls matches outside the window, keeps those inside") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L), // right 9:55 -> 5 min back, inside
      (1L, ts("2024-01-01 11:00:00"), 102L)) // nearest preceding 9:55 -> 65 min, outside
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts("2024-01-01 09:55:00"), 11L)).toDF("user_id", "ts", "event_id")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", Seq("event_id"),
        toleranceMicros = Some(600L * 1000000L))
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[java.lang.Long]("asof_event_id"))))
    assert(out.toSeq == Seq(101L -> Some(11L), 102L -> None))
  }

  test("ties among right rows at the same instant break on id (deterministic)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L),
      (1L, ts("2024-01-01 09:00:00"), 9L))
      .toDF("user_id", "ts", "event_id")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", Seq("event_id")).head()
    assert(out.getAs[Long]("asof_event_id") == 9L) // highest id at the tie instant
  }
}
