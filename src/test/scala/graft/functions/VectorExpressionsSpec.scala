package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Similarity

class VectorExpressionsSpec extends SparkSpec {

  test("codegen dot product is bit-identical to the fold formulation") {
    Similarity.ensure(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val both = e.crossJoin(broadcast(q)).select(
      Similarity.dot(col("embedding"), col("qvec")).as("fast"),
      Similarity.dotFold(col("embedding"), col("qvec")).as("fold"))
    assert(both.filter(col("fast") =!= col("fold")).count() == 0)
    assert(both.count() == 500)
  }

  test("null and length-mismatch behavior") {
    Similarity.ensure(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 99.0))), // extra elems ignored
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(VectorExpressions.dotp(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    Similarity.ensure(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val df = e.crossJoin(broadcast(q))
      .select(Similarity.dot(col("embedding"), col("qvec")).as("d"))
    df.collect() // AQE finalizes the physical plan only on execution
    val plan = df.queryExecution.executedPlan.toString
    // The codegen'd Project shows as "*(n) Project [dotproduct(...)]" —
    // the star marks the WholeStageCodegen stage containing it.
    assert(plan.linesIterator.exists(l => l.contains("dotproduct") && l.contains("*(")),
      s"dotproduct not inside a WholeStageCodegen stage:\n$plan")
  }
}
