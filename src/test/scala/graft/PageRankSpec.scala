package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** q64's disk-bucketed PageRank iteration: the layout must be invisible
  * in the result (bucketed ≡ in-memory q58), the per-round join must
  * consume the bucketed scan with ZERO Exchange on the edge side (the
  * plan property the on-disk layout exists for — q58's in-memory persist
  * evaporates on executor loss), and the convergence-delta stop must
  * actually stop on its own condition.
  */
class PageRankSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q64 bucketed iteration equals q58's in-memory iteration exactly") {
    val a = SparkEntry.queries("q58_pagerank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = SparkEntry.queries("q64_pagerank_bucketed")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("per-round join reads the bucketed edge scan with no edge-side Exchange") {
    val tbl = Relational.pagerankEdgeTable(spark, dir)
    val edges = spark.table(tbl)
    val ranks = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("src"))
      .withColumn("rank", lit(1000000000000L))
    // one iteration's contribution aggregate, exactly as pageRankRounds
    // builds it
    val totals = edges
      .join(ranks.hint("shuffle_hash"), Seq("src"))
      .select(col("dst"), expr("rank div outdeg").as("contrib"))
      .groupBy(col("dst")).agg(sum(col("contrib")).as("total"))
    val p = totals.queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"), p)
    // exactly ONE src Exchange — the vertex-sized ranks side; the edge
    // table's src layout comes from the buckets
    assert("Exchange hashpartitioning\\(src".r.findAllIn(p).size == 1, p)
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("convergence-delta stop halts before the cap and satisfies its own bound") {
    val tbl = Relational.pagerankEdgeTable(spark, dir)
    val verts = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("part_id"))
    val tol = 1000000000L // 0.1% of the 1e12 rank scale
    val (ranks, rounds) =
      Relational.pageRankRounds(spark.table(tbl), verts, maxIters = 50,
        tol = Some(tol))
    assert(rounds < 50, s"did not converge in 50 rounds")
    assert(rounds >= 2, s"suspiciously instant convergence ($rounds)")
    // independent re-check of the EXACT delta the stop fired on: the
    // condition is |rank_rounds − rank_{rounds−1}| ≤ tol (not the pair
    // one round later — integer rounding does not guarantee monotone
    // deltas), so rebuild both sides with fixed-K runs and re-measure
    val (cur, _) = Relational.pageRankRounds(spark.table(tbl), verts,
      maxIters = rounds, tol = None)
    val (prev, _) = Relational.pageRankRounds(spark.table(tbl), verts,
      maxIters = rounds - 1, tol = None)
    val delta = cur.join(prev.withColumnRenamed("rank", "prev"), Seq("part_id"))
      .agg(max(abs(col("rank") - col("prev")))).head().getLong(0)
    assert(delta <= tol, s"stop condition violated: delta $delta > tol $tol")
    // the stop must also be TIGHT: one round earlier the delta exceeded
    // tol, or the loop stopped later than it had to
    if (rounds > 2) {
      val (prev2, _) = Relational.pageRankRounds(spark.table(tbl), verts,
        maxIters = rounds - 2, tol = None)
      val before = prev.join(prev2.withColumnRenamed("rank", "prev"), Seq("part_id"))
        .agg(max(abs(col("rank") - col("prev")))).head().getLong(0)
      assert(before > tol, s"loop overshot: delta $before already <= tol $tol")
    }
    // and the tol-run's ranks equal the fixed-K run at the same K
    val a = ranks.orderBy(col("part_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = cur.orderBy(col("part_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }
}
