package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Stream-stream LEFT OUTER interval join: matched rows emit like the
  * inner join; an unmatched left row emits with nulls once the
  * watermark passes the point where a match could still arrive. The
  * inner variant is driver-checked (st4); the outer variant's
  * null-emission contract is watermark-timing-dependent, so it is
  * pinned here as properties rather than a hash oracle.
  */
class StreamOuterJoinSpec extends SparkSpec {

  test("left-outer interval join emits matches plus watermark-expired unmatched rows") {
    import spark.implicits._
    val src = tmpDir("oj_src")
    val out = tmpDir("oj_out") + "/data"
    val ckpt = tmpDir("oj_ckpt")

    def ev(rows: Seq[(Long, String, String, Long)]) =
      rows.toDF("user_id", "event_type", "ts_str", "event_id")
        .select(col("user_id"), col("event_type"),
          to_timestamp(col("ts_str")).as("ts"), col("event_id"))

    // File 1: one matched purchase (click 10 min before), one unmatched.
    // File 2: far-future events that push the watermark past file 1.
    ev(Seq(
      (1L, "click", "2024-01-01 09:50:00", 10L),
      (1L, "purchase", "2024-01-01 10:00:00", 11L),
      (2L, "purchase", "2024-01-01 10:00:00", 21L))) // no click -> unmatched
      .coalesce(1).write.mode("append").parquet(src)
    ev(Seq(
      (3L, "click", "2024-01-11 10:00:00", 30L),
      (3L, "purchase", "2024-01-11 10:05:00", 31L)))
      .coalesce(1).write.mode("append").parquet(src)
    // distinct mtimes -> file 1 feeds an earlier micro-batch than file 2
    val parts = new java.io.File(src).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(1700000000000L + i * 60000L): Unit
    }

    val schema = spark.read.parquet(src).schema
    def side(tpe: String, prefix: String) =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${prefix}_user"), col("event_id").as(s"${prefix}_id"),
          col("ts").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "10 minutes")

    val joined = side("purchase", "p").join(side("click", "c"),
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")

    val q = joined.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.read.schema(joined.schema).parquet(out)
      .select(col("p_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("c_id")))).toSet

    // matched rows equal the batch inner join
    assert(rows.contains((11L, Some(10L))), rows)
    assert(rows.contains((31L, Some(30L))), rows)
    // the file-1 unmatched purchase is 10 days below the final watermark:
    // its null row MUST have emitted
    assert(rows.contains((21L, None)), rows)
    // no phantom matches: every non-null pair is a true interval match
    assert(rows.collect { case (p, Some(c)) => (p, c) }.forall(
      Set((11L, 10L), (31L, 30L))), rows)
    // a purchase never emits both matched and null rows
    val nullPs = rows.collect { case (p, None) => p }
    assert(nullPs.forall(p => !rows.exists(r => r._1 == p && r._2.isDefined)), rows)
  }
}
