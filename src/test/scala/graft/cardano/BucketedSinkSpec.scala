package graft.cardano

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed merge target: correctness (idempotent double-load) AND the
  * plan property that justifies the layout — the existing (big) side of
  * the PK anti-join must come out of the bucketed scan with no shuffle;
  * only the incoming batch gets an Exchange.
  */
class BucketedSinkSpec extends SparkSpec {

  private def freshTable(): String =
    "bucketed_merge_" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)

  test("bucketed upsert: double load inserts zero; overlap inserts only fresh keys") {
    import spark.implicits._
    val t = freshTable()
    try {
      val batch = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk", "v")
      val first = IdempotentSink.upsertBucketed(spark, batch, t, Seq("pk"))
      assert(first.inserted == 3)
      val second = IdempotentSink.upsertBucketed(spark, batch, t, Seq("pk"))
      assert(second.inserted == 0 && second.conflictSkipped == 3)
      val third = IdempotentSink.upsertBucketed(spark,
        Seq((3L, "C"), (4L, "d")).toDF("pk", "v"), t, Seq("pk"))
      assert(third.inserted == 1)
      assert(spark.table(t).count() == 4)
      // conflict-skip kept the original value for pk=3
      assert(spark.table(t).filter($"pk" === 3L).select("v").head().getString(0) == "c")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("merge anti-join shuffles ONLY the incoming batch (bucketed side moves nothing)") {
    import spark.implicits._
    val t = freshTable()
    // Pin the plan: no broadcast (a 100 TB target can't broadcast anyway)
    // and no AQE wrapper, so the static plan is inspectable.
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      IdempotentSink.upsertBucketed(spark,
        (1L to 100L).map(i => (i, s"v$i")).toDF("pk", "v"), t, Seq("pk"))
      val staged = (50L to 150L).map(i => (i, s"w$i")).toDF("pk", "v")
      val merged = IdempotentSink.mergeBatch(staged, spark.table(t), Seq("pk"))
      val shuffles = merged.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // Staged side: one Exchange for dropDuplicates, (at most) one more
      // to line up with the bucket count. The bucketed table side must
      // contribute ZERO — that is the point of the layout.
      assert(shuffles.nonEmpty && shuffles.size <= 2,
        s"expected only staged-side shuffles, got ${shuffles.size}:\n" +
          merged.queryExecution.executedPlan)
      val planStr = merged.queryExecution.executedPlan.toString
      assert(planStr.contains("Bucketed: true"),
        s"existing side did not use the bucketed scan:\n$planStr")
      assert(merged.orderBy("pk").collect().map(_.getLong(0)).toSeq == (101L to 150L))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
