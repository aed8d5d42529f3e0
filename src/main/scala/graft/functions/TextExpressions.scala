package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word tokenization — the hot inner loop
  * of every text operator (shingles, SimHash, vocab, token stats).
  *
  * Semantics are EXACTLY `regexp_extract_all(lower(text), '\w+')`: the
  * input is Unicode-lowercased first (same `UTF8String.toLowerCase` the
  * built-in `lower` uses, so even exotic case mappings like U+212A KELVIN
  * SIGN → 'k' agree), then split into maximal ASCII `[a-z0-9_]` runs.
  * Java regex and RE2 both default `\w` to the ASCII class, and UTF-8
  * multibyte units are all ≥ 0x80, so a plain byte scan reproduces the
  * regex byte-for-byte — without the regex engine's backtracking
  * machinery and per-row matcher allocation (~3x on tokenization-bound
  * queries). Parity is pinned by TextExpressionsSpec against the regex
  * formulation, and every text-operator oracle re-derives tokens via
  * regex in DuckDB — the correctness gate would catch any divergence.
  */
case class WordTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextExpressions.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {

  val TokensName = "graft_tokens"

  /** Maximal ASCII word-char runs of the lowercased input. Called from
    * both interpreted eval and generated code.
    */
  def tokenize(s: UTF8String): GenericArrayData = {
    val bytes = s.toLowerCase.getBytes
    val out = new java.util.ArrayList[AnyRef]()
    var start = -1
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      val isWord = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
      if (isWord) {
        if (start < 0) start = i
      } else if (start >= 0) {
        out.add(UTF8String.fromBytes(bytes, start, i - start))
        start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromBytes(bytes, start, bytes.length - start))
    new GenericArrayData(out.toArray)
  }

  /** Idempotent per-session registration (temp function registry); the
    * deployment route is `GraftExtensions` via `spark.sql.extensions`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TokensName,
      { exprs: Seq[Expression] => WordTokens(exprs.head) },
      "built-in")

  /** Codegen'd tokenizer; the session must have graft functions wired
    * (GraftExtensions or [[register]]).
    */
  def toks(text: Column): Column = call_function(TokensName, text)
}
