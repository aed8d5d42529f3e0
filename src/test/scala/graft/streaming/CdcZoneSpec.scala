package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[EventStream.cdcApplyBatch]] (st16's per-batch body): every MERGE
  * path across batch boundaries, the full-struct stale guard, tombstone
  * resurrection protection, and the replay no-op (snapshot files byte
  * identical when nothing applies).
  */
class CdcZoneSpec extends SparkSpec {

  private def changes(rows: (Long, Long, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("key", "seq", "op", "new_cents")
  }

  private def seed(snap: String, rows: (Long, Long)*): Unit = {
    import spark.implicits._
    rows.toSeq.map { case (k, c) => (k, c, 0L, "U") }
      .toDF("key", "cents", "seq", "op")
      .withColumn("kb", pmod(col("key"), lit(EventStream.cdcBuckets.toLong)).cast("int"))
      .write.partitionBy("kb").parquet(snap)
  }

  private def live(snap: String): Map[Long, Long] =
    spark.read.parquet(snap).filter(col("op") =!= "D")
      .select("key", "cents").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def snapFiles(snap: String): Map[String, Long] = {
    val root = new java.io.File(snap)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(root.getAbsolutePath) -> f.length()).toMap
  }

  test("update, insert, delete, stale-skip across two batches; replay is a byte-no-op") {
    val snap = graft.core.Scratch.dir("cdczone") + "/snap"
    seed(snap, 1L -> 100L, 2L -> 200L, 3L -> 300L)
    // batch 1: update k1, delete k2, insert k4
    val b1 = changes((1L, 2L, "U", 111L), (2L, 1L, "D", 0L), (4L, 1L, "U", 444L))
    assert(EventStream.cdcApplyBatch(b1, snap) == 3L)
    assert(live(snap) == Map(1L -> 111L, 3L -> 300L, 4L -> 444L))
    // batch 2: replay of batch 1 — every change is stale, snapshot untouched
    val before = snapFiles(snap)
    assert(EventStream.cdcApplyBatch(b1, snap) == 0L)
    assert(snapFiles(snap) == before, "replay must not rewrite any file")
    // batch 3: newer change wins, older loses, equal-seq tie breaks on struct
    val b3 = changes(
      (1L, 3L, "U", 122L), // newer than applied seq 2 -> applies
      (4L, 1L, "U", 400L), // equal seq, smaller struct than (1,U,444) -> stale
      (3L, 1L, "U", 333L)) // newer than base seq 0 -> applies
    assert(EventStream.cdcApplyBatch(b3, snap) == 2L)
    assert(live(snap) == Map(1L -> 122L, 3L -> 333L, 4L -> 444L))
  }

  test("tombstone blocks resurrection by a late stale update; newer change revives") {
    val snap = graft.core.Scratch.dir("cdczone2") + "/snap"
    seed(snap, 7L -> 700L)
    assert(EventStream.cdcApplyBatch(changes((7L, 5L, "D", 0L)), snap) == 1L)
    assert(live(snap).isEmpty)
    // a late replay of an OLDER update must not bring the key back
    assert(EventStream.cdcApplyBatch(changes((7L, 3L, "U", 777L)), snap) == 0L)
    assert(live(snap).isEmpty, "stale update resurrected a deleted key")
    // but a genuinely newer change revives it
    assert(EventStream.cdcApplyBatch(changes((7L, 6L, "U", 770L)), snap) == 1L)
    assert(live(snap) == Map(7L -> 770L))
  }

  test("randomized feeds and splits: maintained equals one-shot") {
    import spark.implicits._
    val rnd = new scala.util.Random(16)
    for (trial <- 1 to 2) {
      val baseRows = (0L to 12L).map(k => (k, 100L + rnd.nextInt(900)))
      val feed = (1 to 80).map { _ =>
        (rnd.nextInt(18).toLong, 1L + rnd.nextInt(4),
          if (rnd.nextInt(4) == 0) "D" else "U", rnd.nextInt(1000).toLong)
      }
      val oneShot = graft.queries.Relational
        .cdcApply(baseRows.toDF("key", "cents"),
          feed.toDF("key", "seq", "op", "new_cents"))
        .select("key", "cents").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val snap = graft.core.Scratch.dir(s"cdczone_rnd$trial") + "/snap"
      seed(snap, baseRows: _*)
      // three random contiguous batches (empty batches legal)
      val cut1 = rnd.nextInt(feed.size)
      val cut2 = cut1 + rnd.nextInt(feed.size - cut1)
      for (part <- Seq(feed.take(cut1), feed.slice(cut1, cut2), feed.drop(cut2))
           if part.nonEmpty)
        EventStream.cdcApplyBatch(changes(part: _*), snap): Unit
      assert(live(snap) == oneShot, s"trial $trial diverged")
    }
  }

  test("maintained snapshot equals one-shot batch apply whatever the batch split") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("key", "cents")
    val feed = Seq(
      (1L, 1L, "U", 11L), (1L, 2L, "D", 0L), (1L, 3L, "U", 13L),
      (2L, 1L, "D", 0L), (3L, 2L, "U", 33L), (5L, 1L, "U", 55L),
      (6L, 1L, "D", 0L))
    val oneShot = graft.queries.Relational
      .cdcApply(base, feed.toDF("key", "seq", "op", "new_cents"))
      .select("key", "cents").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (splitAt <- Seq(0, 3, 5, 7)) {
      val snap = graft.core.Scratch.dir(s"cdczone3_$splitAt") + "/snap"
      seed(snap, 1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L)
      val (a, b) = feed.splitAt(splitAt)
      for (part <- Seq(a, b) if part.nonEmpty)
        EventStream.cdcApplyBatch(changes(part: _*), snap): Unit
      assert(live(snap) == oneShot, s"split at $splitAt diverged")
    }
  }
}
