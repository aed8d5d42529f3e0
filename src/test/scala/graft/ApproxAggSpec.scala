package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** Accuracy contracts for the approximate-aggregation family
  * (q29/q30/q44).
  * These queries have NO DuckDB oracle by construction — a different
  * engine's HLL/quantile sketch cannot hash-match — so the error bounds
  * are pinned here against the EXACT q14/q19 answers on real data.
  */
class ApproxAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q29: HLL distinct counts within 3·rsd of the exact q14 answers") {
    val exact = Relational.q14DistinctAgg(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Relational.q29ApproxDistinct(spark, dir).collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    val tol = 3 * 0.02 // 3 standard deviations at rsd = 2%
    approx.foreach { r =>
      val (nParts, nSupps) = exact(r.getString(0))
      val (aParts, aSupps) = (r.getLong(1), r.getLong(2))
      assert(math.abs(aParts - nParts).toDouble / nParts <= tol,
        s"${r.getString(0)}: n_parts approx $aParts vs exact $nParts")
      assert(math.abs(aSupps - nSupps).toDouble / nSupps <= tol,
        s"${r.getString(0)}: n_supps approx $aSupps vs exact $nSupps")
    }
  }

  test("q44: per-day HLL estimates accurate AND the union obeys the merge law") {
    import graft.core.Tables
    val events = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).cache()
    try {
      val exactByDay = events.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val exactTotal = events.select(col("user_id")).distinct().count()

      val out = Relational.q44HllMerge(spark, dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size == exactByDay.size + 1)
      // lgConfigK=12 -> rsd ~= 1.04/sqrt(2^12) ~= 1.6%; allow 3 sigma
      val tol = 3 * 1.04 / math.sqrt(1 << 12)
      exactByDay.foreach { case (day, n) =>
        assert(math.abs(out(day) - n).toDouble / n <= tol, s"$day: ${out(day)} vs exact $n")
      }
      assert(math.abs(out("TOTAL") - exactTotal).toDouble / exactTotal <= tol,
        s"TOTAL: ${out("TOTAL")} vs exact $exactTotal")

      // THE MERGE LAW: estimating the union of the stored daily sketches
      // must EQUAL the estimate of one sketch built directly over all
      // days — this is what makes the daily sketch table a valid partial
      // aggregate (no fact rescan for any window's distinct count)
      val direct = events
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("est"))
        .collect().head.getLong(0)
      assert(out("TOTAL") == direct,
        s"union-of-sketches ${out("TOTAL")} != direct sketch $direct")
    } finally { events.unpersist(); () }
  }

  test("sketch zone: stored sketches + incremental day-append == direct recompute") {
    import graft.core.Tables
    import graft.operators.SketchZone
    val events = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).cache()
    try {
      val days = events.select(col("day")).distinct()
        .orderBy(col("day")).collect().map(_.getDate(0))
      assert(days.length >= 3)
      val cut = days(days.length - 2) // hold out the last day
      val zone = tmpDir("skzone") + "/daily_users"

      // initial build: the historical prefix becomes the stored zone
      val n1 = SketchZone.appendDailySketches(
        spark, events.filter(col("day") <= lit(cut)), "day", "user_id", zone)
      assert(n1 == days.length - 1)
      // the nightly increment: full facts arrive, but the watermark
      // limits the scan-and-append to the ONE day the zone is missing
      val n2 = SketchZone.appendDailySketches(spark, events, "day", "user_id", zone)
      assert(n2 == 1, s"expected exactly the held-out day appended, got $n2")
      // replay safety: an immediate re-run appends nothing
      assert(SketchZone.appendDailySketches(spark, events, "day", "user_id", zone) == 0)
      val stored = spark.read.option("recursiveFileLookup", "true").parquet(zone)
      assert(stored.count() == days.length)
      // two atomic appends -> two published batch dirs, no staging left
      val batchDirs = new java.io.File(zone).listFiles().filter(_.isDirectory)
      assert(batchDirs.count(_.getName.startsWith("append-")) == 2)
      assert(!batchDirs.exists(_.getName.startsWith(".stg-")))
      // a crashed append's hidden staging is invisible to the watermark
      // and reaped by the next append instead of corrupting the zone
      val stale = new java.io.File(zone, ".stg-crashed")
      assert(stale.mkdir())
      assert(SketchZone.appendDailySketches(spark, events, "day", "user_id", zone) == 0)
      assert(!stale.exists(), "stale staging not reaped")

      // the merge law THROUGH STORAGE: union over the parquet-stored
      // sketch rows (built across two independent appends) estimates
      // EXACTLY what one direct sketch over all facts estimates
      val direct = events
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)))
        .head().getLong(0)
      val viaZone = SketchZone.estimateRange(spark, zone, days.head, days.last)
        .head()
      assert(viaZone.getLong(0) == direct,
        s"stored-union ${viaZone.getLong(0)} != direct $direct")
      assert(viaZone.getLong(1) == events.count())

      // window query from the zone alone: prefix window == direct over
      // prefix facts (any window, never a fact rescan)
      val prefixDirect = events.filter(col("day") <= lit(cut))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)))
        .head().getLong(0)
      assert(SketchZone.estimateRange(spark, zone, days.head, cut)
        .head().getLong(0) == prefixDirect)
    } finally { events.unpersist(); () }
  }

  test("theta zone: retention series from stored sketches == q48's direct form") {
    import graft.core.Tables
    import graft.operators.SketchZone
    val events = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).cache()
    try {
      val days = events.select(col("day")).distinct()
        .orderBy(col("day")).collect().map(_.getDate(0))
      val cut = days(days.length - 2)
      val zone = tmpDir("thzone") + "/daily_theta"
      // same incremental discipline as the HLL zone: historical build,
      // then the nightly one-day append
      assert(SketchZone.appendDailyTheta(
        spark, events.filter(col("day") <= lit(cut)), "day", "user_id", zone)
        == days.length - 1)
      assert(SketchZone.appendDailyTheta(spark, events, "day", "user_id", zone) == 1)
      // the zone-only retention series (built across two appends) equals
      // the direct in-memory q48 computation row for row — exact-mode
      // theta makes both sides exact, so this is equality, not tolerance
      val direct = graft.queries.Relational.q48ThetaRetention(spark, dir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val viaZone = SketchZone.retentionSeries(spark, zone).collect()
      assert(viaZone.length == direct.size && viaZone.nonEmpty)
      viaZone.foreach { r =>
        assert((r.getLong(1), r.getLong(2), r.getLong(3))
          == direct(r.getDate(0).toString), s"day ${r.getDate(0)}")
      }
    } finally { events.unpersist(); () }
  }

  test("theta zone: rolling 7-day actives from stored sketches == exact WAU") {
    import graft.core.Tables
    import graft.operators.SketchZone
    val events = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).cache()
    try {
      val zone = tmpDir("wauzone") + "/daily_theta"
      assert(SketchZone.appendDailyTheta(
        spark, events, "day", "user_id", zone) > 0)
      // exact trailing-7-calendar-day distinct per day, via a range join
      val days = events.select(col("day")).distinct()
      val exact = days.as("d").join(events.as("e"),
          col("e.day").between(date_sub(col("d.day"), 6), col("d.day")))
        .groupBy(col("d.day").as("day"))
        .agg(countDistinct(col("e.user_id")).as("wau"))
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val viaZone = SketchZone.rollingActive(spark, zone, 7).collect()
      assert(viaZone.length == exact.size && viaZone.nonEmpty)
      viaZone.foreach { r =>
        assert(r.getLong(1) == exact(r.getDate(0).toString),
          s"day ${r.getDate(0)}")
      }
    } finally { events.unpersist(); () }
  }

  test("theta zone: a GAP day does not widen the rolling frame (RANGE, not ROWS)") {
    import graft.operators.SketchZone
    import spark.implicits._
    // days 1,2,4 (day 3 missing): the trailing-2-day window at day 4
    // must cover {4} only in calendar terms... day 3 absent, day 2 is
    // OUTSIDE rangeBetween(-1, 0) — a ROWS frame would wrongly pull it in
    val rows = Seq(
      ("2024-03-01", 1L), ("2024-03-01", 2L),
      ("2024-03-02", 2L), ("2024-03-02", 3L),
      ("2024-03-04", 9L))
      .toDF("d", "user_id").select(to_date($"d").as("day"), $"user_id")
    val zone = tmpDir("gapzone") + "/daily_theta"
    assert(SketchZone.appendDailyTheta(spark, rows, "day", "user_id", zone) == 3)
    val out = SketchZone.rollingActive(spark, zone, 2).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out("2024-03-01") == 2L) // {1,2}
    assert(out("2024-03-02") == 3L) // {1,2} ∪ {2,3}
    assert(out("2024-03-04") == 1L) // {9} alone — 03-03 missing, 03-02 out of range
  }

  test("kll zone: window percentiles from stored sketches honor the rank bound") {
    import graft.core.Tables
    import graft.operators.SketchZone
    val events = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("value").cast("double").as("v"))
      .cache()
    try {
      val days = events.select(col("day")).distinct()
        .orderBy(col("day")).collect().map(_.getDate(0))
      val cut = days(days.length - 2)
      val zone = tmpDir("kllzone") + "/daily_value"
      assert(SketchZone.appendDailyKll(
        spark, events.filter(col("day") <= lit(cut)), "day", "v", zone)
        == days.length - 1)
      assert(SketchZone.appendDailyKll(spark, events, "day", "v", zone) == 1)
      val eps = org.apache.datasketches.kll.KllSketch
        .getNormalizedRankError(200, false)
      // full window AND a prefix window: merged stored sketches answer
      // both within the published rank error, no fact rescan
      Seq(days.last, cut).foreach { to =>
        val window = events.filter(col("day") <= lit(to)).cache()
        try {
          val n = window.count()
          val row = SketchZone.quantileRange(
            spark, zone, days.head, to, Seq(0.5, 0.95)).head()
          assert(row.getLong(0) == n)
          Seq((row.getDouble(1), 0.5), (row.getDouble(2), 0.95)).foreach {
            case (est, q) =>
              val rank = window.filter(col("v") <= est).count().toDouble / n
              assert(math.abs(rank - q) <= 2 * eps,
                s"to=$to p$q: $est true rank $rank")
          }
        } finally { window.unpersist(); () }
      }
    } finally { events.unpersist(); () }
  }

  test("q30: approx percentiles respect the rank-error guarantee") {
    // percentile_approx(accuracy = 10000) guarantees rank error
    // <= 1/accuracy; allow 100x slack (still 1%) so the test is immune
    // to off-by-one-rank effects on heavily tied integer columns.
    val eps = 0.01
    val li = graft.core.Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .cache()
    try {
      val approx = Relational.q30ApproxPercentile(spark, dir).collect()
      assert(approx.nonEmpty)
      def rankBounds(flag: String, c: String, v: Double): (Double, Double) = {
        val g = li.filter(col("l_returnflag") === flag)
        val n = g.count().toDouble
        val below = g.filter(col(c) < v).count() / n   // strictly below
        val atOrBelow = g.filter(col(c) <= v).count() / n
        (below, atOrBelow)
      }
      approx.foreach { r =>
        val flag = r.getString(0)
        for ((cname, idx, p) <- Seq(("l_quantity", 1, 0.25), ("l_quantity", 2, 0.5),
            ("l_extendedprice", 3, 0.9))) {
          val v = r.get(idx) match {
            case d: java.lang.Double => d.doubleValue()
            case d: java.math.BigDecimal => d.doubleValue()
            case l: java.lang.Long => l.doubleValue()
            case x => x.toString.toDouble
          }
          val (lo, hi) = rankBounds(flag, cname, v)
          assert(lo - eps <= p && p <= hi + eps,
            s"$flag $cname p=$p: approx value $v has rank window [$lo, $hi]")
        }
      }
    } finally { li.unpersist(); () }
  }
}
