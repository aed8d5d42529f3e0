package graft.core

import java.nio.file.{Files, Path}

/** Tracked scratch directories for queries that stage data (format
  * round-trips, partitioned copies for pruning demos). The returned
  * DataFrames read lazily from scratch, so the dirs can't be deleted when
  * the query function returns — they are removed at JVM exit instead,
  * which keeps repeated Bench/Verify sessions from accumulating staged
  * copies on disk. (Streaming scratch in `graft.streaming.EventStream`
  * has its own eager reaper because checkpoints CAN be deleted as soon as
  * the query finishes.)
  */
object Scratch {
  private val dirs = scala.collection.mutable.ListBuffer.empty[Path]
  sys.addShutdownHook { dirs.synchronized { dirs.foreach(deleteTree) } }

  def dir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    dirs.synchronized { dirs += d }
    d.toString
  }

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
