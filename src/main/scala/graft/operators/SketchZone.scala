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
  * Each append is ATOMIC: the batch lands complete in a dot-prefixed
  * staging dir (hidden from Spark/Hadoop listings, so no reader or
  * watermark probe can observe it), then one directory rename publishes
  * it into the zone. A multi-day append that crashed mid-job-commit
  * under plain `Append` mode could leave a LATER day visible with an
  * earlier day missing — the next watermark would then skip the hole
  * forever; the rename protocol makes every append all-or-nothing, so
  * the watermark-replay argument ("a failed append re-derives the same
  * watermark and re-appends the same days") actually holds. Stale
  * hidden staging from a crash is reaped on the next append. `lgK`
  * must be constant per zone; `hll_union_agg` is run with
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
      dayCol: String, keyCol: String, zoneDir: String, lgK: Int = 12): Long =
    appendCore(spark, facts, dayCol, zoneDir,
      Seq(hll_sketch_agg(col(keyCol), lgK).as("sk"),
        count(lit(1)).as("n_events")))

  /** Theta-sketch zone: same watermark + atomic-publish discipline, but
    * the stored rows support SET ALGEBRA — [[retentionSeries]] derives
    * day-over-day retention/churn from the zone alone, the operation an
    * HLL zone cannot express (Relational.q48 is the in-memory twin).
    */
  def appendDailyTheta(spark: SparkSession, facts: DataFrame,
      dayCol: String, keyCol: String, zoneDir: String, lgK: Int = 12): Long = {
    graft.functions.SketchExpressions.register(spark)
    appendCore(spark, facts, dayCol, zoneDir,
      Seq(graft.functions.SketchExpressions.thetaSketch(col(keyCol), lgK).as("sk"),
        count(lit(1)).as("n_events")))
  }

  /** KLL quantile-sketch zone: stored per-day value distributions; any
    * window's percentiles re-derive from [[quantileRange]] without a
    * fact rescan (Relational.q49 is the in-memory twin).
    */
  def appendDailyKll(spark: SparkSession, facts: DataFrame,
      dayCol: String, valueCol: String, zoneDir: String, k: Int = 200): Long = {
    graft.functions.SketchExpressions.register(spark)
    appendCore(spark, facts, dayCol, zoneDir,
      Seq(graft.functions.SketchExpressions.kllSketch(col(valueCol), k).as("sk"),
        count(lit(1)).as("n_events")))
  }

  /** Append one BATCH's per-day theta rows unconditionally — the
    * STREAMING maintenance path (EventStream.streamSketchZone). A
    * micro-batch stream cannot use the day watermark: days split across
    * batches, so "beyond the stored max day" would drop a day's second
    * half. Instead every batch appends its own (day, sk) rows — possibly
    * several rows per day across batches — and correctness moves to the
    * READ side: [[retentionSeries]] unions per day first, and theta's
    * set semantics absorb both the split (union of halves = the day) and
    * any replayed rows (a set union is idempotent). No n_events column
    * here on purpose: under replay a row count would be wrong, and
    * unlike distinct-ness it has no set semantics to hide behind.
    */
  def appendThetaBatch(spark: SparkSession, batch: DataFrame,
      dayCol: String, keyCol: String, zoneDir: String, lgK: Int = 12): Long = {
    graft.functions.SketchExpressions.register(spark)
    appendCore(spark, batch, dayCol, zoneDir,
      Seq(graft.functions.SketchExpressions.thetaSketch(col(keyCol), lgK).as("sk")),
      useWatermark = false)
  }

  private def appendCore(spark: SparkSession, facts: DataFrame,
      dayCol: String, zoneDir: String, aggExprs: Seq[org.apache.spark.sql.Column],
      useWatermark: Boolean = true): Long = {
    val fresh = if (!useWatermark) facts else watermark(spark, zoneDir) match {
      case Some(maxDay) => facts.filter(col(dayCol) > lit(maxDay))
      case None => facts
    }
    val appended = fresh
      .groupBy(col(dayCol).as("day"))
      .agg(aggExprs.head, aggExprs.tail: _*)
      // day-level output is tiny (one row per day) — checkpoint so the
      // row count and the write don't each rescan the fresh facts
      .localCheckpoint()
    val n = appended.count()
    val (fs, zoneP) = graft.core.Fs.resolve(spark, zoneDir)
    // reap hidden staging a crashed append left behind (never
    // published, so deleting it is always safe)
    if (fs.exists(zoneP))
      fs.listStatus(zoneP)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".stg-"))
        .foreach(s => fs.delete(s.getPath, true))
    if (n > 0) {
      val tag = java.util.UUID.randomUUID().toString
      val staging = new org.apache.hadoop.fs.Path(zoneDir, s".stg-$tag")
      appended.write.parquet(staging.toString)
      // the atomic publish: one rename moves the complete batch into
      // reader visibility
      require(fs.rename(staging, new org.apache.hadoop.fs.Path(zoneDir, s"append-$tag")),
        s"sketch-zone publish rename failed: $staging")
    }
    n
  }

  /** Distinct estimate + event count over an inclusive day window,
    * answered from STORED sketch rows only — never the fact table.
    */
  def estimateRange(spark: SparkSession, zoneDir: String,
      from: java.sql.Date, to: java.sql.Date): DataFrame =
    readZone(spark, zoneDir)
      .filter(col("day").between(lit(from), lit(to)))
      .agg(
        hll_sketch_estimate(
          hll_union_agg(col("sk"), allowDifferentLgConfigK = false))
          .as("est_distinct"),
        sum(col("n_events")).as("n_events"))

  /** Day-over-day retention/churn answered from a THETA zone's stored
    * rows only — never the fact table: |active(d)|,
    * |active(d-1) ∩ active(d)| and |active(d-1) \ active(d)| as
    * sketch-on-sketch ops over KB-sized rows. Calendar-consecutive
    * pairing (a gap day pairs with nothing), same semantics as
    * Relational.q48's direct form. The day-level window is #days rows
    * forever — one tiny partition by construction.
    */
  def retentionSeries(spark: SparkSession, zoneDir: String,
      lgK: Int = 12): DataFrame = {
    import graft.functions.{SketchExpressions => SK}
    SK.register(spark)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    readZone(spark, zoneDir)
      // a day may hold SEVERAL stored rows (streaming appendThetaBatch:
      // split days, replayed batches) — union them first; for the
      // one-row-per-day batch zone this is a no-op pass-through. `lgK`
      // must match the writers': a smaller read-side union would
      // silently downsample exact-mode sketches (the same degradation
      // the HLL zone blocks with allowDifferentLgConfigK = false).
      .groupBy(col("day")).agg(SK.thetaUnion(col("sk"), lgK).as("sk"))
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("prev_sk", lag(col("sk"), 1).over(w))
      .filter(col("prev_sk").isNotNull && datediff(col("day"), col("prev_day")) === 1)
      .select(col("day"),
        SK.thetaEstimateCol(col("sk")).as("active"),
        SK.thetaIntersect(col("prev_sk"), col("sk")).as("retained"),
        SK.thetaANotB(col("prev_sk"), col("sk")).as("churned"))
      .orderBy(col("day"))
  }

  /** Rolling N-day active users (DAU→WAU/MAU) from a THETA zone's
    * stored rows only: per output day, the union of the trailing N
    * daily sketches — the sketch aggregate running as a WINDOW function
    * over a ROWS frame. Rolling distinct counts are the canonical
    * non-additive metric (a 7-day WAU is NOT the sum of 7 DAUs); with
    * stored sketches each output day costs an N-row union of KB-sized
    * binaries instead of a 7-day fact rescan. Frame memory is N sketch
    * rows; the series is #days rows forever — one tiny partition by
    * construction, like [[retentionSeries]].
    */
  def rollingActive(spark: SparkSession, zoneDir: String, nDays: Int,
      lgK: Int = 12): DataFrame = {
    import graft.functions.{SketchExpressions => SK}
    require(nDays >= 1, s"window must be >= 1 day, got $nDays")
    SK.register(spark)
    // RANGE over the epoch-day index, not ROWS over stored rows: a zone
    // with a gap day must NOT let the frame silently widen to extra
    // calendar days (trailing-7 means calendar days, not stored rows)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("day_idx")).rangeBetween(-(nDays - 1).toLong, 0L)
    readZone(spark, zoneDir)
      // per-day union first (streaming zones hold several rows per day)
      .groupBy(col("day")).agg(SK.thetaUnion(col("sk"), lgK).as("sk"))
      .withColumn("day_idx", datediff(col("day"), lit("1970-01-01")))
      .select(col("day"),
        SK.thetaEstimateCol(SK.thetaUnion(col("sk"), lgK).over(w))
          .as(s"active_${nDays}d"))
      .orderBy(col("day"))
  }

  /** Percentiles over an inclusive day window, answered from a KLL
    * zone's stored rows only. `ranks` → one `p<rank>` column each.
    */
  def quantileRange(spark: SparkSession, zoneDir: String,
      from: java.sql.Date, to: java.sql.Date,
      ranks: Seq[Double], k: Int = 200): DataFrame = {
    import graft.functions.{SketchExpressions => SK}
    SK.register(spark)
    val names = ranks.map(r => s"p${(r * 100).round}")
    require(names.distinct.size == names.size,
      s"quantile ranks collide after rounding to column names: " +
        s"${ranks.mkString(", ")} -> ${names.mkString(", ")}")
    val merged = readZone(spark, zoneDir)
      .filter(col("day").between(lit(from), lit(to)))
      .agg(SK.kllMerge(col("sk"), k).as("sk"), sum(col("n_events")).as("n_events"))
    ranks.zip(names).foldLeft(merged) { case (df, (r, name)) =>
      df.withColumn(name, SK.kllQuantileCol(col("sk"), r))
    }.drop("sk")
  }

  /** The zone is a directory of published `append-*` batch dirs —
    * recursive lookup flattens them; dot-prefixed staging stays hidden.
    */
  private def readZone(spark: SparkSession, zoneDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(zoneDir)

  /** Driver-side watermark scalar (by design — SURVEY S9/Q1): the
    * zone's max stored day, None when the zone does not exist yet.
    */
  private def watermark(spark: SparkSession, zoneDir: String): Option[java.sql.Date] = {
    val (fs, p) = graft.core.Fs.resolve(spark, zoneDir)
    val hasPublished = fs.exists(p) &&
      fs.listStatus(p).exists(s => s.isDirectory && s.getPath.getName.startsWith("append-"))
    if (!hasPublished) None
    else Option(readZone(spark, zoneDir)
      .agg(max(col("day"))).head().getDate(0))
  }
}
