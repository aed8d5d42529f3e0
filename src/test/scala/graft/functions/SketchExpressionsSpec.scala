package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{SketchExpressions => SK}

/** Contracts for the theta / KLL sketch algebra. Theta's exact-mode
  * guarantee (estimates — including intersections and differences — are
  * EXACT below 2^lgK retained hashes) is what q48's full DuckDB oracle
  * rides on, so it is pinned here on constructed sets with known
  * cardinalities, through real shuffles (repartitioned input exercises
  * the partial-aggregate serialize/merge path, not just a single
  * buffer). The degraded (past-capacity) mode and the KLL rank-error +
  * merge laws are the q29/q30/q44-style spec-pinned contracts.
  */
class SketchExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("theta: exact-mode estimate equals exact distinct through a real shuffle") {
    // 10k rows, 1000 distinct, spread over 8 partitions so partial
    // buffers must serialize and merge across the exchange
    val df = spark.range(10000).select((col("id") % 1000).as("k"))
      .repartition(8)
    val est = df.agg(SK.thetaEstimateCol(SK.thetaSketch(col("k"))).as("e"))
      .head().getLong(0)
    assert(est === 1000L)
  }

  test("theta: intersection and A-not-B are exact on known overlapping sets") {
    // A = multiples of 2 in [0, 6000), B = multiples of 3 in [0, 6000)
    // |A| = 3000, |B| = 2000, |A ∩ B| = |multiples of 6| = 1000,
    // |A \ B| = 2000
    val a = spark.range(3000).select((col("id") * 2).as("k"), lit("a").as("s"))
    val b = spark.range(2000).select((col("id") * 3).as("k"), lit("b").as("s"))
    val sk = a.unionAll(b).repartition(8)
      .groupBy(col("s")).agg(SK.thetaSketch(col("k")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(SK.thetaEstimate(sk("a")) === 3000L)
    assert(SK.thetaEstimate(sk("b")) === 2000L)
    assert(SK.thetaIntersectEstimate(sk("a"), sk("b")) === 1000L)
    assert(SK.thetaANotBEstimate(sk("a"), sk("b")) === 2000L)
    assert(SK.thetaANotBEstimate(sk("b"), sk("a")) === 1000L)
  }

  test("theta: every declared input type sketches correctly (int, string, binary)") {
    val ints = spark.range(2000)
      .select((col("id") % 700).cast("int").as("k"))
      .agg(SK.thetaEstimateCol(SK.thetaSketch(col("k"))).as("e"))
      .head().getLong(0)
    assert(ints === 700L)
    val strings = spark.range(3000)
      .select(concat(lit("u"), (col("id") % 900)).as("k"))
      .agg(SK.thetaEstimateCol(SK.thetaSketch(col("k"))).as("e"))
      .head().getLong(0)
    assert(strings === 900L)
    val binaries = spark.range(2000)
      .select(sha2((col("id") % 800).cast("string"), 256).cast("binary").as("k"))
      .agg(SK.thetaEstimateCol(SK.thetaSketch(col("k"))).as("e"))
      .head().getLong(0)
    assert(binaries === 800L)
  }

  test("theta: union over STORED sketches equals the direct build (merge law)") {
    val parts = spark.range(9000)
      .select((col("id") % 3).as("part"), (col("id") % 1500).as("k"))
    val stored = parts.groupBy(col("part"))
      .agg(SK.thetaSketch(col("k")).as("sk"))
    val unioned = stored
      .agg(SK.thetaEstimateCol(SK.thetaUnion(col("sk"))).as("e"))
      .head().getLong(0)
    assert(unioned === 1500L)
  }

  test("property: exact-mode theta set algebra equals exact set arithmetic") {
    // the law every theta oracle (q48/q50/st13) rides on: for ARBITRARY
    // key sets below capacity, estimate/intersect/anotb are exactly
    // |A|, |A ∩ B|, |A \ B| — driver-side sketches, no Spark job, so
    // 60 random set pairs stay cheap
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.datasketches.theta.{SetOperation, UpdateSketch}
    val pairs = Gen.listOfN(60,
        Gen.zip(
          Gen.listOf(Gen.choose(0L, 5000L)).map(_.toSet),
          Gen.listOf(Gen.choose(0L, 5000L)).map(_.toSet)))
      .apply(Gen.Parameters.default, Seed(48L)).getOrElse(Nil)
    assert(pairs.nonEmpty)
    def sk(s: Set[Long]): Array[Byte] = {
      val u = UpdateSketch.builder().setLogNominalEntries(13).build()
      s.foreach(u.update)
      u.compact().toByteArray
    }
    pairs.foreach { case (a, b) =>
      val (ba, bb) = (sk(a), sk(b))
      assert(SK.thetaEstimate(ba) == a.size.toLong)
      assert(SK.thetaIntersectEstimate(ba, bb) == (a & b).size.toLong, s"∩ $a $b")
      assert(SK.thetaANotBEstimate(ba, bb) == (a -- b).size.toLong, s"\\ $a $b")
    }
  }

  test("theta: past capacity the estimate stays within published error bounds") {
    // lgK=10 (1024 nominal entries) against 100k distinct: deep in
    // sampling mode. Theta RSE <= 1/sqrt(k); allow 3.5 sigma.
    val est = spark.range(100000).repartition(8)
      .agg(SK.thetaEstimateCol(SK.thetaSketch(col("id"), lgK = 10)).as("e"))
      .head().getLong(0)
    val tol = 3.5 / math.sqrt(1024.0)
    assert(math.abs(est - 100000L).toDouble / 100000.0 <= tol,
      s"theta estimate $est outside ${tol * 100}% of 100000")
  }

  test("wrong-typed SQL input fails at ANALYSIS, not mid-job on an executor") {
    // the SQL path has no Column-API casts in front of it — a typed
    // mistake must be an AnalysisException, never a ClassCastException
    // after the scan has started
    Seq(
      s"SELECT ${SK.KllAggName}(id, 200) FROM range(10)", // long, not double
      s"SELECT ${SK.FreqAggName}(id, 64) FROM range(10)", // long, not string
      s"SELECT ${SK.ThetaEstimateName}(id) FROM range(10)", // long, not binary
      s"SELECT ${SK.ThetaAggName}(CAST(id AS DOUBLE), 12) FROM range(10)"
    ).foreach { sql =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getMessage.contains("requires"), s"$sql => ${e.getMessage}")
    }
  }

  test("theta: sketch parameters must be integer literals") {
    SK.register(spark)
    val e = intercept[Exception] {
      spark.range(10)
        .agg(call_function(SK.ThetaAggName, col("id"), col("id"))).collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("kll: quantiles honor the normalized rank-error bound through a shuffle") {
    // Uniform 0..99999 → true rank of value v is v/100000. k=200's
    // published single-sided normalized rank error ~1.65%; assert the
    // estimated quantile's TRUE rank is within 2x of it.
    val n = 100000
    val skBytes = spark.range(n).repartition(8)
      .agg(SK.kllSketch(col("id").cast("double")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(200, false)
    Seq(0.05, 0.25, 0.5, 0.75, 0.95, 0.99).foreach { q =>
      val est = SK.kllQuantile(skBytes, q)
      val trueRank = est / n
      assert(math.abs(trueRank - q) <= 2 * eps,
        s"p$q: estimate $est has true rank $trueRank, outside 2x$eps")
    }
  }

  test("kll: merge over STORED sketches honors the same bound (merge law)") {
    val n = 120000
    val stored = spark.range(n)
      .select((col("id") % 4).as("part"), col("id").cast("double").as("v"))
      .groupBy(col("part")).agg(SK.kllSketch(col("v")).as("sk"))
    val merged = stored.agg(SK.kllMerge(col("sk")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(200, false)
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val est = SK.kllQuantile(merged, q)
      assert(math.abs(est / n - q) <= 2 * eps,
        s"merged p$q: $est true rank ${est / n}")
    }
  }

  test("kll: empty sketch yields NaN, never throws") {
    val skBytes = spark.range(10)
      .agg(SK.kllSketch(lit(null).cast("double")).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(SK.kllQuantile(skBytes, 0.5).isNaN)
  }

  test("q48: retention/churn series equals the exact distinct-set arithmetic") {
    val dir = "/root/testdata/sf0.01"
    val du = graft.core.Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct().cache()
    try {
      val act = du.groupBy(col("day")).agg(count(lit(1)).as("active"))
      val ret = du.as("a").join(du.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.day") === date_sub(col("a.day"), 1))
        .groupBy(col("a.day").as("day")).agg(count(lit(1)).as("retained"))
      val prev = act.select(col("day").as("p_day"), col("active").as("p_active"))
      val retR = ret.select(col("day").as("r_day"), col("retained"))
      val exact = act
        .join(prev, col("p_day") === date_sub(col("day"), 1))
        .join(retR, col("r_day") === col("day"), "left")
        .select(col("day"), col("active"),
          coalesce(col("retained"), lit(0L)).as("retained"),
          (col("p_active") - coalesce(col("retained"), lit(0L))).as("churned"))
        .collect()
        .map(r => r.getDate(0).toString ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val out = graft.queries.Relational.q48ThetaRetention(spark, dir).collect()
      assert(out.length === exact.size && out.nonEmpty)
      out.foreach { r =>
        assert((r.getLong(1), r.getLong(2), r.getLong(3)) === exact(r.getString(0)),
          s"day ${r.getString(0)}")
      }
    } finally du.unpersist()
  }

  test("q49: stored-sketch percentiles within rank-error of the exact answers") {
    val dir = "/root/testdata/sf0.01"
    val values = graft.core.Tables.events(spark, dir)
      .select(col("value").cast("double").as("v")).cache()
    try {
      val n = values.count()
      val eps = org.apache.datasketches.kll.KllSketch
        .getNormalizedRankError(200, false)
      val total = graft.queries.Relational.q49KllMerge(spark, dir)
        .filter(col("day") === "TOTAL").head()
      assert(total.getLong(3) === n)
      Seq((total.getDouble(1), 0.5), (total.getDouble(2), 0.95)).foreach {
        case (est, q) =>
          val rank = values.filter(col("v") <= est).count().toDouble / n
          assert(math.abs(rank - q) <= 2 * eps,
            s"p$q estimate $est has true rank $rank")
      }
    } finally values.unpersist()
  }

  test("freq: exact mode through a shuffle — counts equal the exact group-by") {
    // 40 distinct items, map of 512: no purge ever happens, so every
    // estimate is the exact count and lb == est == ub
    val df = spark.range(10000)
      .select(concat(lit("w"), (col("id") % 40)).as("w")).repartition(8)
    val exact = df.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val items = df.agg(SK.freqSketch(col("w"), 512).as("sk"))
      .select(explode(SK.freqTopItemsCol(col("sk"))).as("f"))
      .select(col("f.item"), col("f.est"), col("f.lb"), col("f.ub"))
      .collect()
    assert(items.length == 40)
    items.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)))
      assert(r.getLong(2) == r.getLong(1) && r.getLong(3) == r.getLong(1))
    }
  }

  test("freq: past capacity keeps every true heavy hitter within bounds") {
    // Zipf-ish: item h<i> appears 2000 times each (5 hitters), 20k
    // singletons flood a 64-counter map far past its purge threshold
    val hitters = spark.range(10000)
      .select(concat(lit("h"), (col("id") % 5)).as("w"))
    val noise = spark.range(20000)
      .select(concat(lit("n"), col("id")).as("w"))
    val items = hitters.unionAll(noise).repartition(8)
      .agg(SK.freqSketch(col("w"), 64).as("sk"))
      .select(explode(SK.freqTopItemsCol(col("sk"))).as("f"))
      .select(col("f.item"), col("f.est"), col("f.lb"), col("f.ub"))
      .collect()
    val byItem = items.map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (0 until 5).foreach { i =>
      // NO_FALSE_NEGATIVES: every true heavy hitter is present, and its
      // true count lies inside the sketch's own [lb, ub]
      val (_, lb, ub) = byItem.getOrElse(s"h$i",
        fail(s"true heavy hitter h$i missing from the frequent-items read"))
      assert(lb <= 2000L && 2000L <= ub, s"h$i: true 2000 outside [$lb, $ub]")
    }
  }

  test("freq: merging partial sketches preserves the heavy hitters") {
    val df = spark.range(30000)
      .select((col("id") % 3).as("part"),
        concat(lit("w"), (col("id") % 10)).as("w"))
    // the 3-way repartition forces one partial sketch per partition, so
    // the final counts only come out right if ItemsSketch.merge is
    // exercised across the exchange
    val items = df.repartition(3, col("part"))
      .agg(SK.freqSketch(col("w"), 256).as("sk"))
      .select(explode(SK.freqTopItemsCol(col("sk"))).as("f"))
      .select(col("f.item"), col("f.est")).collect()
    assert(items.length == 10)
    items.foreach(r => assert(r.getLong(1) == 3000L))
  }

  test("theta/kll: registered via GraftExtensions (SQL-visible)") {
    // SparkSpec's session wires graft.functions.GraftExtensions — the
    // sketch functions must resolve from plain SQL with no imperative
    // register() call.
    val est = spark.sql(
      s"""SELECT ${SK.ThetaEstimateName}(${SK.ThetaAggName}(id, 12)) AS e
         |FROM range(3000)""".stripMargin).head().getLong(0)
    assert(est === 3000L)
  }
}
