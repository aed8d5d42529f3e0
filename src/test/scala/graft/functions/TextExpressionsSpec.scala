package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextOps

/** Parity guard: the codegen'd [[WordTokens]] scan must reproduce
  * `regexp_extract_all(lower(text), '\w+')` byte-for-byte — every text
  * oracle re-derives tokens via regex in DuckDB, so any divergence here
  * fails the correctness gate.
  */
class TextExpressionsSpec extends SparkSpec {

  test("tokenize matches the regex formulation on edge cases") {
    import spark.implicits._
    val cases = Seq(
      "Hello, World!",
      "",
      "   ",
      "a",
      "snake_case and CamelCase and digits123 4ever",
      "tabs\tand\nnewlines\r\nmixed",
      "punct!!!only???",
      "_leading and trailing_",
      "unicode: café naïve 中文 Über straße",
      "Kelvin sign", // U+212A lowercases to ASCII 'k'
      "a-b a.b a_b a b",
      "123 0x1f 1_000",
      "ALLCAPS MiXeD lower")
    val df = cases.toDF("text")
    val diff = df.select(
        TextOps.tokens(col("text")).as("fast"),
        TextOps.tokensRegex(col("text")).as("ref"))
      .filter(not(col("fast") === col("ref")))
    assert(diff.count() == 0, diff.collect().mkString("\n"))
  }

  test("tokenize matches the regex formulation on the documents corpus") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
        TextOps.tokens(col("text")).as("fast"),
        TextOps.tokensRegex(col("text")).as("ref"))
      .filter(not(col("fast") === col("ref")))
    assert(diff.count() == 0)
  }

  test("simhash60 matches the h60 explode/vote formulation on the corpus") {
    // The reference formulation SimHash60 replaced: explode distinct
    // tokens, h60 each, majority-vote the 60 bits through two
    // aggregations. Any hash or vote drift breaks the d4/d11 oracles,
    // so pin bit-identity here on real data. The corpus is augmented
    // with token-less documents (empty / punctuation-only text) and the
    // comparison is a FULL OUTER join: the explode formulation — and the
    // DuckDB oracle's unnest — emit NO row for such docs, so
    // Dedup.simhash must not either; an inner join would silently accept
    // a row-set divergence (a doc present on only one side).
    import spark.implicits._
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (900001L, ""), (900002L, "   "), (900003L, "!!! ??? ..."),
        (900004L, "still has words")).toDF("doc_id", "text"))
    val fast = graft.operators.Dedup.simhash(docs, col("doc_id"), col("text"))
    val ref = docs
      .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .withColumn("h", TextOps.h60(col("tok")))
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(59))).as("bit"))
      .withColumn("vote", when(expr("(h >> bit) & 1") === 1, 1).otherwise(-1))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
        .otherwise(lit(0L))).as("ref_simhash"))
    val diff = fast.join(ref, Seq("doc_id"), "full_outer")
      .filter(col("simhash").isNull || col("ref_simhash").isNull ||
        col("simhash") =!= col("ref_simhash"))
    assert(diff.count() == 0, diff.take(5).mkString("\n"))
    // the explode side really did drop the three token-less docs
    assert(ref.count() == fast.count())
    assert(fast.filter(col("doc_id") >= 900001L).count() == 1)
    // and the raw expression still hashes an empty array to 0 (all
    // negative votes) — the row-DROP lives in Dedup.simhash, by design
    val empty = Seq("", "!!!").toDF("text")
      .select(TextExpressions.simhashOf(array_distinct(TextOps.tokens(col("text")))))
      .collect().map(_.getLong(0))
    assert(empty.toSeq == Seq(0L, 0L))
  }

  test("simhash60 follows SQL null tolerance on arrays with null elements") {
    import spark.implicits._
    // Registered as session SQL function graft_simhash60: arbitrary user
    // arrays may contain nulls — skip them (vote as if absent), never NPE.
    val viaSql = spark.sql(
      s"SELECT ${TextExpressions.SimHashName}(array('alpha', CAST(NULL AS STRING), 'beta')) AS h, " +
        s"${TextExpressions.SimHashName}(array('alpha', 'beta')) AS ref, " +
        s"${TextExpressions.SimHashName}(array(CAST(NULL AS STRING), CAST(NULL AS STRING))) AS all_null")
      .collect().head
    assert(viaSql.getLong(0) == viaSql.getLong(1)) // nulls skipped
    assert(viaSql.getLong(2) == 0L)                // all-null == empty
    // interpreted (non-codegen) path takes the same branch
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[AnyRef](org.apache.spark.unsafe.types.UTF8String.fromString("alpha"), null))
    val ref = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[AnyRef](org.apache.spark.unsafe.types.UTF8String.fromString("alpha")))
    assert(TextExpressions.simhash60(arr) == TextExpressions.simhash60(ref))
  }
}
