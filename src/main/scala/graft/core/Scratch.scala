package graft.core

import java.nio.file.{Files, Path, Paths}

/** Tracked scratch directories for queries that stage data (format
  * round-trips, partitioned copies for pruning demos). The returned
  * DataFrames read lazily from scratch, so the dirs can't be deleted when
  * the query function returns — they are removed at JVM exit instead,
  * which keeps repeated Bench/Verify sessions from accumulating staged
  * copies on disk. (Streaming scratch in `graft.streaming.EventStream`
  * has its own eager reaper because checkpoints CAN be deleted as soon as
  * the query finishes.)
  *
  * Scratch prefers RAM-backed storage (/dev/shm) when available — the
  * same election EventStream's checkpoint scratch made in round 13:
  * staged zones are many small parquet files, and on a disk-backed /tmp
  * their write+probe latency rides the host's noisy-neighbor disk queue
  * (the round-16 cross-window audit measured 2-4× swings on exactly the
  * zone-staging entries while CPU-bound entries stayed flat). On a real
  * cluster this is "put shuffle/scratch on local NVMe, not on the shared
  * network volume" — the standard deployment posture.
  */
object Scratch {
  private val dirs = scala.collection.mutable.ListBuffer.empty[Path]
  sys.addShutdownHook { dirs.synchronized { dirs.foreach(deleteTree) } }

  /** RAM-backed scratch base when present and writable, else the JVM
    * default temp dir. Shared by [[dir]] and the drivers' Spark
    * local-dir election ([[sparkLocalDir]]).
    */
  private lazy val base: Option[Path] = {
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm) else None
  }

  def dir(prefix: String): String = {
    val d = base.fold(Files.createTempDirectory(prefix))(
      b => Files.createTempDirectory(b, prefix))
    dirs.synchronized { dirs += d }
    d.toString
  }

  /** A scratch root for `spark.local.dir` (shuffle + broadcast spill):
    * the hottest small-file traffic a local-mode session produces, and
    * the other half of the disk-queue exposure the scaladoc describes.
    * Registered for JVM-exit cleanup like every scratch dir (Spark
    * also deletes its local dirs on clean shutdown; this covers the
    * unclean paths).
    */
  def sparkLocalDir(): String = dir("spark_local")

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      // Materialize before closing: an open walk stream holds a directory
      // handle, which on some filesystems makes the deletes below fail.
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverseIterator.foreach(f => Files.deleteIfExists(f))
    }
}
