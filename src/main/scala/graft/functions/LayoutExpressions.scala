package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 2-D Z-order (Morton) code — the
  * multi-dimensional clustering key behind data-layout optimization:
  * sort/shard a table by `zorder2(dimA, dimB)` (see
  * `operators.ShardedWriter`) and a rectangular predicate on BOTH
  * dimensions touches only the few files whose Morton span intersects
  * the query box, where a single-column sort clusters one dimension and
  * scatters the other. At 100 TB this is the difference between
  * pruning to a handful of shards and scanning a full stripe per
  * selective 2-D query (the same layout trick Delta/Iceberg expose as
  * OPTIMIZE ZORDER BY).
  *
  * Semantics: interleave the bits of each input — bit i of `a` lands at
  * output bit 2i, bit i of `b` at 2i+1 (the classic parallel bit-spread
  * with five mask/shift rounds; public-domain bit twiddling, same
  * construction as Interleave in "Bit Twiddling Hacks"). The expression
  * is a pure per-row projection: codegen'd, shuffle-free, stays inside
  * WholeStageCodegen.
  *
  * Enforced domain contract: each dimension must lie in [0, 2^31) —
  * out-of-range values throw (with the offending pair in the message)
  * instead of silently landing bit 31 of the second dimension in the
  * long's sign bit and inverting the sort order. Offset or bucket wider
  * dimensions before z-ordering. With the domain enforced, the code is
  * always non-negative and totally consistent with the interleaved
  * order; both engine dimensions used here (ids, epoch seconds) fit.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be longs; [[LayoutExpressions.zorder2]] inserts
  // the casts (same no-coercion-trait stance as DotProduct).
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    LayoutExpressions.morton2(
      l.asInstanceOf[Number].longValue, r.asInstanceOf[Number].longValue)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.LayoutExpressions.morton2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutExpressions {

  val ZOrderName = "graft_zorder2"

  /** Spread the low 32 bits of `v` to the even bit positions: five
    * mask/shift doubling rounds, O(1) with no per-bit loop.
    */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inclusive per-dimension maximum: 2^31 - 1. Bit 31 of the second
    * dimension would land in the output's sign bit, so values at or
    * above 2^31 (or negative) cannot be encoded order-consistently.
    */
  val MaxDim: Long = 0x7FFFFFFFL

  /** Morton code of (a, b): a's bits at even positions, b's at odd.
    * Called from both interpreted eval and generated code. Throws on
    * dimensions outside [0, MaxDim] — never silently mis-sorts.
    */
  def morton2(a: Long, b: Long): Long = {
    if ((a | b) < 0L || a > MaxDim || b > MaxDim)
      throw new IllegalArgumentException(
        s"graft_zorder2 dimension out of range [0, 2^31): ($a, $b) — " +
          "offset or bucket dimensions before z-ordering")
    spread(a) | (spread(b) << 1)
  }

  /** Idempotent per-session registration (temp function registry); the
    * deployment route is `GraftExtensions` via `spark.sql.extensions`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ZOrderName,
      { exprs: Seq[Expression] => ZOrder2(exprs(0), exprs(1)) },
      "built-in")

  /** Codegen'd 2-D Morton code; the session must have graft functions
    * wired (GraftExtensions or [[register]]).
    */
  def zorder2(a: Column, b: Column): Column =
    call_function(ZOrderName, a.cast("long"), b.cast("long"))
}
