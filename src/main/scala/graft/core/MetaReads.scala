package graft.core

import org.apache.spark.sql.{Row, SparkSession}

/** Fingerprint-guarded driver cache for TINY (1..k-row) parquet reads —
  * zone meta rows, persisted centroids, trained merge tables.
  *
  * Every zone operation (append, probe, delete) re-reads its zone's
  * geometry or model rows; in the streamed loops that is several 1-row
  * Spark actions per micro-batch, each paying full analysis + planning +
  * scheduling for rows that never change between refreshes (geometry is
  * fixed at creation by the zones' own contracts; model zones change
  * only through an overwrite or [[graft.operators.ZoneRebuild]]'s rename
  * cutover — both land new part files). The round-17 JobProfile
  * measurement attributed a double-digit share of the loop entries' wall
  * to exactly these 1-row actions.
  *
  * The cache keys on the directory's listing fingerprint (relative
  * paths + sizes + mtimes — [[Fs.fingerprint]], one listing RPC, no
  * Spark job), so ANY rewrite misses and re-reads: semantics stay
  * read-per-call — the unchanged-content case is just served from
  * driver memory. The fingerprint is taken BEFORE the read (the
  * bucketedBandsTable TOCTOU direction): a write landing between
  * fingerprint and read can only make the NEXT call miss, never serve
  * it stale. This is driver metadata caching (the InMemoryFileIndex
  * discipline), not result caching: cached rows are k-row decision
  * state, never query output, and the JVM-lifetime map holds k rows per
  * zone directory.
  */
object MetaReads {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[Row])]()

  /** All rows of the tiny parquet dir (with schema, via Row.schema),
    * cached per listing fingerprint. Callers extract fields by name so
    * one cached read serves every projection of the same dir.
    */
  def rows(spark: SparkSession, dir: String): Seq[Row] = {
    val fp = Fs.fingerprint(spark, dir)
    val hit = cache.get(dir)
    if (hit != null && hit._1 == fp) hit._2
    else {
      val rs: Seq[Row] = spark.read.parquet(dir).collect().toSeq
      cache.put(dir, (fp, rs))
      rs
    }
  }

  /** The single row of a 1-row meta dir. */
  def row(spark: SparkSession, dir: String): Row = {
    val rs = rows(spark, dir)
    require(rs.size == 1, s"expected exactly one meta row under $dir, got ${rs.size}")
    rs.head
  }
}
