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
  * Semantics: interleave the low 32 bits of each input — bit i of `a`
  * lands at output bit 2i, bit i of `b` at 2i+1 (the classic parallel
  * bit-spread with five mask/shift rounds; public-domain bit twiddling,
  * same construction as Interleave in "Bit Twiddling Hacks"). The
  * expression is a pure per-row projection: codegen'd, shuffle-free,
  * stays inside WholeStageCodegen.
  *
  * Ordering caveat (documented contract): the output is a SIGNED long,
  * so keep dimension values below 2^31 (mask or bucket them first) if
  * you sort by the code — bit 31 of the second dimension would land in
  * the sign bit. Both engine dimensions used here (ids, epoch seconds)
  * are well below 2^31.
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

  /** Morton code of (a, b): a's bits at even positions, b's at odd.
    * Called from both interpreted eval and generated code.
    */
  def morton2(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

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
