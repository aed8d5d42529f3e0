package graft.core

import java.lang.ref.WeakReference

import org.apache.spark.sql.DataFrame

/** Tracked persists for multiply-consumed intermediates (shingle tables,
  * banded signatures). Operators stay lazy — the persist is part of the
  * returned plan, so consumers get the full optimized DAG — but every
  * cached frame is registered here, and drivers that run MANY queries in
  * one session (Verify, Bench, Profile) call [[release]] after
  * materializing each one.
  *
  * Registration holds only a WEAK reference: a consumer that never calls
  * release() (a test suite, a library user composing operators) falls
  * back to the ContextCleaner GC path — once the plan is unreachable the
  * blocks are collectable — instead of this registry pinning them for
  * the JVM lifetime.
  *
  * Scope: the registry is process-global and [[release]] unpersists
  * EVERY tracked frame, which assumes one sequential driver per JVM
  * (the Verify/Bench/Profile shape). Concurrent drivers sharing a
  * SparkSession would release each other's in-flight intermediates —
  * correctness-safe (recompute), but a perf surprise; such callers
  * should skip release() and rely on the GC fallback.
  */
object Caches {
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[WeakReference[DataFrame]]()

  /** Persist (MEMORY_AND_DISK — spills rather than OOMs at corpus scale)
    * and track for later [[release]].
    */
  def persistTracked(df: DataFrame): DataFrame = {
    // Opportunistically drop queue nodes whose referents were collected,
    // so a long-lived session that never calls release() doesn't
    // accumulate empty nodes unboundedly.
    live.removeIf(_.get() == null)
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    live.add(new WeakReference(cached))
    cached
  }

  /** Unpersist every tracked frame still reachable. Call after the
    * consuming action; a frame released early is recomputed, never wrong.
    * `blocking = true` makes eviction complete before returning, so a
    * benchmark bills the cleanup to the query that persisted the data
    * rather than leaking it into the next timed window.
    */
  def release(blocking: Boolean = false): Unit = {
    var ref = live.poll()
    while (ref != null) {
      val df = ref.get()
      if (df != null) df.unpersist(blocking)
      ref = live.poll()
    }
  }
}
