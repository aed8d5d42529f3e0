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
}
