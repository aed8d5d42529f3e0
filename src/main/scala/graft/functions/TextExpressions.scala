package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

/** Native Catalyst expression for the 60-bit SimHash of a token array:
  * per token, the [[TextOps.h60]]-equivalent md5-prefix hash (top 60
  * bits of the digest — bit-identical to
  * `conv(substring(md5(tok), 1, 15), 16, 10)`, parity pinned by
  * TextExpressionsSpec); per bit, a +1/−1 majority vote over tokens;
  * output the long whose set bits are the positive votes.
  *
  * This collapses what was a 60× bit-explode through TWO hash-aggregate
  * shuffles (token rows → (doc, bit) votes → doc) into a shuffle-free
  * per-row projection: at corpus scale the simhash stage becomes
  * embarrassingly parallel map work, and the only shuffles left in the
  * SimHash family are the ones candidate pairing actually needs. The
  * caller distincts the token array first (set semantics, as in the
  * explode formulation — vote order is irrelevant to a sum).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextExpressions.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {

  val TokensName = "graft_tokens"
  val SimHashName = "graft_simhash60"

  // MD5 instances are not thread-safe and not cheap to allocate per row.
  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** 60-bit simhash of a string array (see [[SimHash60]]). Called from
    * both interpreted eval and generated code. Null elements are skipped
    * (vote as if absent) rather than crashing the task: the expression is
    * exposed as the session SQL function `graft_simhash60`, so arbitrary
    * user arrays — not just `graft_tokens` output, which never contains
    * nulls — must follow SQL-style null tolerance.
    */
  def simhash60(toks: ArrayData): Long = {
    val md = md5Local.get()
    val votes = new Array[Int](60)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val tok = toks.getUTF8String(i)
      if (tok == null) { i += 1 }
      else {
      md.reset()
      val d = md.digest(tok.getBytes)
      // First 15 hex digits of the md5 == top 60 bits of the big-endian
      // digest — exactly TextOps.h60's conv(substring(md5,1,15),16,10).
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = h >>> 4
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

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
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TokensName,
      { exprs: Seq[Expression] => WordTokens(exprs.head) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SimHashName,
      { exprs: Seq[Expression] => SimHash60(exprs.head) },
      "built-in")
  }

  /** Codegen'd tokenizer; the session must have graft functions wired
    * (GraftExtensions or [[register]]).
    */
  def toks(text: Column): Column = call_function(TokensName, text)

  /** Codegen'd 60-bit simhash over a token array (see [[SimHash60]]). */
  def simhashOf(toks: Column): Column = call_function(SimHashName, toks)
}
