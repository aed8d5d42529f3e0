package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted daily-sketch zone — the STORAGE side of the sketch algebra
  * that `Relational.q44HllMerge` demonstrates in-memory. Per-day HLL
  * sketches land as a parquet table `(day, sk, n_events)`, maintained
  * incrementally by the same watermark discipline as the lake readers
  * (SURVEY S7/T7, `cardano/Lake.scala`): an append scans ONLY facts
  * beyond the stored max day, aggregates them into fixed-size sketch
  * rows, and appends. This is what keeps a 100 TB distinct-count
  * dashboard from ever rescanning the fact table — the nightly append
  * touches one day of facts; every window query unions KB-sized stored
  * sketch rows (`hll_union_agg`), and the union's estimate is EXACTLY
  * the estimate a direct scan would produce (the merge law, pinned with
  * the incremental append in ApproxAggSpec).
  *
  * The zone is day-append-only, so plain parquet `Append` mode is the
  * correct atomicity unit (one new day = one new file set; replaying a
  * failed append re-derives the same watermark and re-appends the same
  * days — duplicate-day protection comes from the watermark filter, the
  * same effectively-once argument as the reference's watermark loop).
  * `lgK` must be constant per zone; `hll_union_agg` is run with
  * `allowDifferentLgConfigK = false`, so a drifting writer fails loudly
  * at read instead of silently degrading accuracy.
  */
object SketchZone {

  /** Append per-day HLL sketches for every `facts` day STRICTLY beyond
    * the zone's stored max day; creates the zone when absent. `facts`
    * must expose `dayCol` (DateType) and `keyCol` (the distinct-counted
    * key). Returns the number of day rows appended (0 = up to date).
    */
  def appendDailySketches(spark: SparkSession, facts: DataFrame,
      dayCol: String, keyCol: String, zoneDir: String, lgK: Int = 12): Long = {
    val fresh = watermark(spark, zoneDir) match {
      case Some(maxDay) => facts.filter(col(dayCol) > lit(maxDay))
      case None => facts
    }
    val appended = fresh
      .groupBy(col(dayCol).as("day"))
      .agg(hll_sketch_agg(col(keyCol), lgK).as("sk"),
        count(lit(1)).as("n_events"))
      // day-level output is tiny (one row per day) — checkpoint so the
      // row count and the write don't each rescan the fresh facts
      .localCheckpoint()
    val n = appended.count()
    if (n > 0) appended.write.mode("append").parquet(zoneDir)
    n
  }

  /** Distinct estimate + event count over an inclusive day window,
    * answered from STORED sketch rows only — never the fact table.
    */
  def estimateRange(spark: SparkSession, zoneDir: String,
      from: java.sql.Date, to: java.sql.Date): DataFrame =
    spark.read.parquet(zoneDir)
      .filter(col("day").between(lit(from), lit(to)))
      .agg(
        hll_sketch_estimate(
          hll_union_agg(col("sk"), allowDifferentLgConfigK = false))
          .as("est_distinct"),
        sum(col("n_events")).as("n_events"))

  /** Driver-side watermark scalar (by design — SURVEY S9/Q1): the
    * zone's max stored day, None when the zone does not exist yet.
    */
  private def watermark(spark: SparkSession, zoneDir: String): Option[java.sql.Date] = {
    val (fs, p) = graft.core.Fs.resolve(spark, zoneDir)
    if (!fs.exists(p)) None
    else Option(spark.read.parquet(zoneDir)
      .agg(max(col("day"))).head().getDate(0))
  }
}
