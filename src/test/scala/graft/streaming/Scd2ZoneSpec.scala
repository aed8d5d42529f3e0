package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the SCD2 zone's per-batch maintenance step
  * ([[EventStream.scd2ApplyBatch]]) that the st14 oracle hash cannot see:
  * replayed batches must leave the dim zone byte-untouched, a batch must
  * rewrite ONLY the key-buckets it touches, and a late-arriving change
  * row must SPLIT an already-collapsed run — the property that forces
  * the change log to exist (maintained-versions-only schemes collapse
  * away the history needed to split).
  */
class Scd2ZoneSpec extends SparkSpec {

  // UTC-pinned: Timestamp.valueOf would parse in the JVM default zone
  // while scd2Collapse renders in the UTC session zone — day strings
  // would shift on any JVM east of UTC
  private def ts(day: Int): Timestamp = Timestamp.from(
    java.time.LocalDate.of(2024, 2, day)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant)

  private def batchDf(rows: (Long, String, Int, Long)*) = {
    import spark.implicits._
    rows.toSeq.map { case (c, p, d, k) => (c, p, ts(d), k) }
      .toDF("o_custkey", "priority", "o_orderdate", "o_orderkey")
  }

  /** (file name → size) for every data file under the dim zone. */
  private def dimFiles(dim: String): Map[String, Long] = {
    val root = new java.io.File(dim)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(root.getAbsolutePath) -> f.length()).toMap
  }

  private def readDim(dim: String) =
    spark.read.parquet(dim)
      .select(col("o_custkey"), col("version"), col("priority"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("o_custkey"), col("version"))
      .collect().toSeq.map(_.toSeq)

  test("replayed batch inserts nothing and leaves every dim file byte-identical") {
    val root = tmpDir("scd2zone")
    val (log, dim) = (s"$root/log", s"$root/dim")
    val b1 = batchDf((1L, "A", 1, 10L), (1L, "B", 5, 11L), (2L, "A", 2, 12L))
    assert(EventStream.scd2ApplyBatch(b1, log, dim) == 3L)
    val before = dimFiles(dim)
    assert(EventStream.scd2ApplyBatch(b1, log, dim) == 0L) // full replay
    assert(dimFiles(dim) == before, "replay rewrote dim files")
  }

  test("a batch rewrites only the key-buckets it touches") {
    val root = tmpDir("scd2zone")
    val (log, dim) = (s"$root/log", s"$root/dim")
    // keys 0..7 cover all 8 buckets (scd2Buckets = 8)
    val b1 = batchDf((0L to 7L).map(c => (c, "A", 1, 100L + c)): _*)
    EventStream.scd2ApplyBatch(b1, log, dim)
    val before = dimFiles(dim)
    // key 11 lands in bucket 3 only
    EventStream.scd2ApplyBatch(batchDf((11L, "B", 2, 200L)), log, dim)
    val after = dimFiles(dim)
    val changed = (before.keySet ++ after.keySet).filter(k =>
      before.get(k) != after.get(k)).map(_.split("/").find(_.startsWith("kb=")).getOrElse("?"))
    assert(changed == Set("kb=3"), s"buckets rewritten: $changed")
    // and key 3 (also bucket 3) must have survived the bucket rewrite
    assert(readDim(dim).count(_.head == 3L) == 1)
  }

  test("partially replayed batch rebuilds only the DELTA's keys, not the batch's") {
    val root = tmpDir("scd2zone")
    val (log, dim) = (s"$root/log", s"$root/dim")
    // keys 1 (bucket 1) and 2 (bucket 2)
    EventStream.scd2ApplyBatch(
      batchDf((1L, "A", 1, 10L), (2L, "A", 1, 11L)), log, dim)
    val before = dimFiles(dim)
    // replay key 1's row verbatim + one genuinely new row for key 2:
    // key 1 contributed nothing to the merge delta, so bucket 1 must
    // not be rewritten (delta-keyed rebuild, not batch-keyed)
    assert(EventStream.scd2ApplyBatch(
      batchDf((1L, "A", 1, 10L), (2L, "B", 4, 12L)), log, dim) == 1L)
    val after = dimFiles(dim)
    val changed = (before.keySet ++ after.keySet).filter(k =>
      before.get(k) != after.get(k)).map(_.split("/").find(_.startsWith("kb=")).getOrElse("?"))
    assert(changed == Set("kb=2"), s"buckets rewritten: $changed")
  }

  test("late row inside a collapsed run splits it (the change log's reason to exist)") {
    val root = tmpDir("scd2zone")
    val (log, dim) = (s"$root/log", s"$root/dim")
    // day 1 and day 5 both 'A' → collapses to ONE open version
    EventStream.scd2ApplyBatch(batchDf((7L, "A", 1, 1L), (7L, "A", 5, 2L)), log, dim)
    assert(readDim(dim) == Seq(Seq(7L, 1L, "A", "2024-02-01", null, true)))
    // late 'B' on day 3 lands INSIDE the run: A[1,3) B[3,5) A[5,…)
    EventStream.scd2ApplyBatch(batchDf((7L, "B", 3, 3L)), log, dim)
    assert(readDim(dim) == Seq(
      Seq(7L, 1L, "A", "2024-02-01", "2024-02-03", false),
      Seq(7L, 2L, "B", "2024-02-03", "2024-02-05", false),
      Seq(7L, 3L, "A", "2024-02-05", null, true)))
  }
}
