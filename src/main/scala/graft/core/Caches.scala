package graft.core

import org.apache.spark.sql.DataFrame

/** Tracked persists for multiply-consumed intermediates (shingle tables,
  * banded signatures). Operators stay lazy — the persist is part of the
  * returned plan, so consumers get the full optimized DAG — but every
  * cached frame is registered here, and drivers that run MANY queries in
  * one session (Verify, Bench, Profile) call [[release]] after
  * materializing each one. Relying on ContextCleaner GC instead leaks
  * cached corpus-sized tables until a major GC happens to collect the
  * plan reference.
  */
object Caches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist (MEMORY_AND_DISK — spills rather than OOMs at corpus scale)
    * and track for later [[release]].
    */
  def persistTracked(df: DataFrame): DataFrame = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    live.add(cached)
    cached
  }

  /** Unpersist every tracked frame. Call after the consuming action; a
    * frame released early is recomputed, never wrong.
    */
  def release(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist()
      df = live.poll()
    }
  }
}
