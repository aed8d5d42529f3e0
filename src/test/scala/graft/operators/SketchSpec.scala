package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sketch support (Datasketches HLL via Spark's built-in
  * hll_sketch_agg / hll_union_agg / hll_sketch_estimate): the operator a
  * 100 TB distinct-count needs — partial sketches per partition/group,
  * register-wise union, one small state per group instead of an exact
  * distinct expansion. No DuckDB oracle (different sketch
  * implementations), so the spec pins the two properties that matter:
  * merge-invariance (sketching the whole == unioning per-group sketches,
  * exactly) and bounded estimation error vs the exact count.
  */
class SketchSpec extends SparkSpec {

  test("HLL: union of group sketches equals the global sketch; estimate near exact") {
    import spark.implicits._
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")

    val exact = events.select(countDistinct($"user_id")).head().getLong(0)
    val global = events
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
      .head().getLong(0)
    val mergedFromGroups = events
      .groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .head().getLong(0)

    // Register-wise max makes union associative/commutative: sketching
    // everything at once must equal merging per-group sketches EXACTLY.
    assert(global == mergedFromGroups)
    // HLL error at default lgConfigK is ~1-2%; allow 5%.
    assert(math.abs(global - exact).toDouble / exact < 0.05,
      s"estimate $global vs exact $exact")
  }
}
