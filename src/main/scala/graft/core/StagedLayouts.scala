package graft.core

import org.apache.spark.sql.SparkSession

/** Session-lifetime staged layouts (partitioned copies, bucketed
  * tables) keyed by (session, query, source dir): the layout write is
  * SETUP — the production analogue is a table that already lives
  * partitioned/bucketed on the lake — so it must happen once per
  * session, not inside every (timed) query run. Values are scratch
  * paths or warehouse table tags; scratch dirs are reaped at JVM exit
  * ([[Scratch]]), bucketed tables live in the session's scratch
  * warehouse.
  *
  * Keys embed the OWNING SESSION's identity: a managed table staged
  * under one session's catalog/warehouse does not exist for a fresh
  * session in the same JVM, so a JVM-global cache would hand the new
  * session a stale table name (TABLE_OR_VIEW_NOT_FOUND, or worse a
  * dropped path). Scratch paths are session-independent, but re-staging
  * them per session is only a small redundancy — correctness first.
  */
object StagedLayouts {

  // Weak identity keying on the session OBJECT, not
  // System.identityHashCode: identity hashes are not unique (a
  // collision, or hash reuse after an old session is GC'd, would hand
  // a fresh session another session's staged table/path — exactly the
  // stale-table bug this keying exists to prevent), and a string cache
  // would retain dead sessions' entries forever. The weak outer map
  // drops a session's entries when the session itself is collected.
  // Collections.synchronizedMap's computeIfAbsent is synchronized
  // (overridden since Java 8), so the two-level lookup stays atomic.
  private val staged = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  def once(spark: SparkSession, key: String)(build: () => String): String =
    staged
      .computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(key, _ => build())
}
