package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Maintenance-edge invariants of the persisted zones: the
  * snapshot-scoped tombstone clear (a tombstone appended concurrently
  * with OPTIMIZE must survive the pass), the full cap-binding geometry
  * guard, empty-tombstone-dir tolerance, and ANN-index replay folding.
  */
class ZoneMaintenanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("tombstone appended between OPTIMIZE's snapshot and clear survives the clear") {
    import spark.implicits._
    val z = tmpDir("tombrace") + "/z"
    SignatureZone.build(spark, docs, z)
    // the interleaving the fix closes, emulated at the primitive level
    // (optimize = snapshot → fold → clear; the ingest path's delete can
    // land between the snapshot and the clear):
    SignatureZone.delete(Seq(1L).toDF("doc_id"), z)               // pre-snapshot
    val snap = graft.core.Fs.listFilePaths(spark, s"$z/tombstones")
    SignatureZone.delete(Seq(2L).toDF("doc_id"), z)               // concurrent
    graft.core.Fs.deleteFilesThenDirIfEmpty(spark, s"$z/tombstones", snap)
    // the concurrent tombstone (doc 2) must still be live: the dir
    // survived the clear because it was not empty, and readers drop 2
    assert(graft.core.Fs.hasParquetFiles(spark, s"$z/tombstones"),
      "snapshot-scoped clear discarded the concurrently-appended tombstone")
    val live = spark.read.parquet(s"$z/tombstones")
      .select(col("doc_id")).distinct().as[Long].collect().toSet
    assert(live == Set(2L), s"expected only the concurrent tombstone, got $live")
    // and the NEXT optimize folds it in for good
    val (fb, fa) = SignatureZone.optimize(spark, z)
    assert(fa <= fb && fa > 0)
    assert(!graft.core.Fs.exists(spark, s"$z/tombstones"),
      "quiescent optimize should clear the tombstone dir entirely")
    assert(spark.read.parquet(s"$z/bands")
      .filter(col("doc_id") === 2L).count() == 0,
      "the surviving tombstone was not folded by the next optimize")
  }

  test("capped-zone geometry guard compares the FULL (cap, df_dir) binding") {
    val root = tmpDir("capguard")
    val dfA = s"$root/dfA"
    val dfB = s"$root/dfB"
    val hist = docs.limit(50)
    ShingleDfZone.create(spark, dfA, 3)
    ShingleDfZone.append(hist, dfA, batchId = 0L)
    ShingleDfZone.create(spark, dfB, 3)
    ShingleDfZone.append(hist, dfB, batchId = 0L)
    val z = s"$root/z"
    SignatureZone.buildCapped(spark, hist, z, dfA, cap = 50L)
    // same-binding re-create stays idempotent
    SignatureZone.create(spark, z, capDf = Some((50L, dfA)))
    // same cap, DIFFERENT df zone: the silent-miss path the guard closes
    val e = intercept[IllegalArgumentException] {
      SignatureZone.create(spark, z, capDf = Some((50L, dfB)))
    }
    assert(e.getMessage.contains("binding"))
  }

  test("zone readers tolerate an existing-but-empty tombstone dir") {
    import spark.implicits._
    val root = tmpDir("emptytomb")
    val md5Zone = s"$root/md5"
    Dedup.md5ZoneAppend(docs, col("text"), col("doc_id"), md5Zone)
    val before = Dedup.md5ZoneRead(spark, md5Zone).count()
    // the state a snapshot-scoped clear can leave behind when it raced
    // a marker-only write: dir present, zero parquet files
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(md5Zone + ".tombstones")): Unit
    assert(Dedup.md5ZoneRead(spark, md5Zone).count() == before,
      "empty tombstone dir changed the md5 zone read")
    val z = s"$root/sig"
    SignatureZone.build(spark, docs.limit(50), z)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$z/tombstones")): Unit
    val delta = docs.filter(col("doc_id") < 10)
    assert(SignatureZone.incrementalPairs(docs, delta, z, 0.8).count() >= 0)
    val ann = s"$root/ann"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    AnnIndexZone.build(spark, emb, ann): Unit
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$ann/tombstones")): Unit
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    assert(AnnIndexZone.topK(emb, q, ann, 5).count() == 5,
      "empty tombstone dir broke the ANN zone read")
    graft.core.Caches.release()
  }

  test("AnnIndexZone.optimize folds replayed duplicate index rows") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val z = tmpDir("annfold") + "/z"
    AnnIndexZone.build(spark, emb, z): Unit
    AnnIndexZone.appendIndex(emb, z) // a full replay
    val n = emb.count()
    assert(spark.read.parquet(s"$z/index").count() == 2 * n)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val before = AnnIndexZone.topK(emb, q, z, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (fb, fa) = AnnIndexZone.optimize(spark, z)
    assert(fa <= fb && fa > 0)
    assert(spark.read.parquet(s"$z/index").count() == n,
      "optimize left replayed duplicate (vec_id, bucket) rows in the index")
    val after = AnnIndexZone.topK(emb, q, z, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, "replay folding changed the topK result")
    graft.core.Caches.release()
  }
}
