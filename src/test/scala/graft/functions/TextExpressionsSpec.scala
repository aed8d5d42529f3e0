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
    // so pin bit-identity here on real data.
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val fast = docs.select(col("doc_id"),
      TextExpressions.simhashOf(array_distinct(TextOps.tokens(col("text")))).as("simhash"))
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
    val diff = fast.join(ref, "doc_id")
      .filter(col("simhash") =!= col("ref_simhash"))
    assert(diff.count() == 0, diff.take(3).mkString("\n"))
    // and the empty token array hashes to all-negative votes = 0
    import spark.implicits._
    val empty = Seq("", "!!!").toDF("text")
      .select(TextExpressions.simhashOf(array_distinct(TextOps.tokens(col("text")))))
      .collect().map(_.getLong(0))
    assert(empty.toSeq == Seq(0L, 0L))
  }
}
