package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.queries.TrainingData

/** Contract of [[TrainingData.groupSampleTopK]]: the histogram-pruned
  * window must equal the naive full-sort formulation EXACTLY (the prune
  * is an optimization, not an approximation), and every stratum yields
  * exactly min(k, n) rows. Exercised over adversarial stratum shapes —
  * singleton strata, strata smaller than k, one dominant stratum — and
  * randomized doc-id universes, since the histogram cutoff's edge cases
  * are "cumulative count reaches k exactly at a bucket boundary" and
  * "whole stratum below k", neither of which sf fixtures guarantee.
  */
class GroupSampleSpec extends SparkSpec {

  private def naive(docs: org.apache.spark.sql.DataFrame, k: Int) = {
    val hk = TextOps.h60(concat(lit("gs:"), col("doc_id").cast("string")))
    docs.select(col("doc_id"), col("lang"), col("source"))
      .withColumn("hk", hk)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("hk"), col("doc_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("lang"), col("source"), col("doc_id"), col("rk"))
      .orderBy(col("lang"), col("source"), col("rk"))
  }

  private def checkEqual(docs: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val pruned = TrainingData.groupSampleTopK(docs, k).collect().toSeq
    val full = naive(docs, k).collect().toSeq
    assert(pruned == full, s"pruned != naive for k=$k")
  }

  test("pruned sample equals the naive full-sort sample on randomized strata") {
    import spark.implicits._
    val rnd = new scala.util.Random(8451)
    for (trial <- 1 to 3) {
      val langs = Seq("en", "es", "de")
      val sources = Seq("web", "book")
      // skewed sizes: one dominant stratum, several tiny ones, one singleton
      val rows = (1 to 4000).map { i =>
        val (l, s) =
          if (rnd.nextInt(100) < 70) ("en", "web")
          else (langs(rnd.nextInt(3)), sources(rnd.nextInt(2)))
        (i.toLong * trial, l, s)
      } :+ (9999990L + trial, "fr", "manual") // singleton stratum
      val docs = rows.toDF("doc_id", "lang", "source")
      checkEqual(docs, k = 5)
      checkEqual(docs, k = 1)
    }
  }

  test("every stratum yields exactly min(k, n) rows; strata below k keep all rows") {
    import spark.implicits._
    val docs = ((1 to 300).map(i => (i.toLong, "en", "web")) ++
      (1 to 3).map(i => (1000L + i, "es", "web"))).toDF("doc_id", "lang", "source")
    val out = TrainingData.groupSampleTopK(docs, k = 7)
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("en", "web")) == 7L)
    assert(out(("es", "web")) == 3L) // n < k: the whole stratum, unpruned
    checkEqual(docs, k = 7)
  }

  test("null strata sample like any other stratum (null-safe cutoff join)") {
    import spark.implicits._
    val rows: Seq[(Long, String, String)] =
      (1 to 50).map(i => (i.toLong, null.asInstanceOf[String], "web")) ++
        (1 to 50).map(i => (100L + i, "en", null.asInstanceOf[String])) ++
        (1 to 50).map(i => (200L + i, "en", "web"))
    val docs = rows.toDF("doc_id", "lang", "source")
    val out = TrainingData.groupSampleTopK(docs, k = 4)
      .groupBy("lang", "source").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out((null, "web")) == 4L)
    assert(out(("en", null)) == 4L)
    assert(out(("en", "web")) == 4L)
    checkEqual(docs, k = 4)
  }

  test("cutoff lands exactly at a bucket boundary: still exact") {
    import spark.implicits._
    // ENGINEER the boundary: recompute each id's h60 top byte in plain
    // Scala (same md5 formula as TextOps.h60) and set k to the exact
    // cumulative count at the smallest occupied byte — the cutoff rule
    // `cum >= least(k, n)` then fires at cum == k precisely, the
    // off-by-one-prone edge (`cum > k` there would drop a bucket and
    // lose sample rows)
    def topByte(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"gs:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) >>> 52).toInt
    }
    val pool = (1 to 5000).map(_.toLong)
    val minByte = pool.map(topByte).min
    val kAtBoundary = pool.count(topByte(_) == minByte)
    assert(kAtBoundary >= 2, "fixture degenerate: need a multi-row first bucket")
    val docs = pool.map((_, "en", "web")).toDF("doc_id", "lang", "source")
    checkEqual(docs, k = kAtBoundary)   // cum == k exactly at the first bucket
    checkEqual(docs, k = kAtBoundary + 1) // and one past it, crossing into the next
  }
}
