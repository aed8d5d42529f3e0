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

/** N-dimensional Morton code — [[ZOrder2]] generalized to any column
  * list, the way Delta/Iceberg's OPTIMIZE ZORDER BY accepts K columns:
  * bit i of dimension d lands at output bit `i*K + d`, so all K
  * dimensions weight the code equally and a K-rectangle predicate
  * prunes on every one of them. Each dimension gets `63/K` bits (31 for
  * K=2 — where the layout is bit-identical to [[ZOrder2]] — 21 for
  * K=3, 15 for K=4); the per-dimension domain is enforced exactly like
  * ZOrder2's: out-of-range throws, never silently mis-sorts. The
  * spread is a `63/K`-iteration bit loop per dimension rather than
  * ZOrder2's five-round unrolled fast path — still a pure per-row
  * projection inside WholeStageCodegen, and the loop cost is noise
  * next to the write amplification of any compaction that uses it.
  */
case class ZOrderN(children: Seq[Expression]) extends Expression {
  require(children.length >= 2 && children.length <= 8,
    s"graft_zordern takes 2..8 dimensions, got ${children.length}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var d = 0
    while (d < children.length) {
      val v = children(d).eval(input)
      if (v == null) return null
      z |= LayoutExpressions.spreadN(
        v.asInstanceOf[Number].longValue, children.length, d)
      d += 1
    }
    z
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val k = children.length
    val evals = children.map(_.genCode(ctx))
    val updates = evals.zipWithIndex.map { case (e, d) =>
      code"""
         |${e.code}
         |if (!${ev.isNull}) {
         |  if (${e.isNull}) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} |= graft.functions.LayoutExpressions.spreadN(${e.value}, $k, $d);
         |  }
         |}
       """.stripMargin
    }.reduce(_ + _)
    ev.copy(code =
      code"""
         |boolean ${ev.isNull} = false;
         |long ${ev.value} = 0L;
         |$updates
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object LayoutExpressions {

  val ZOrderName = "graft_zorder2"
  val ZOrderNName = "graft_zordern"

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

  /** Place bit i of `v` at output bit `i*k + d` — the K-dim spread
    * behind [[ZOrderN]], called from interpreted eval and generated
    * code. Each dimension owns `63/k` bits; a value with a set bit at
    * or above that (or negative) would collide with another dimension's
    * lane or the sign bit, so it throws instead of mis-sorting.
    */
  def spreadN(v: Long, k: Int, d: Int): Long = {
    val bits = 63 / k
    if (v < 0L || (v >>> bits) != 0L)
      throw new IllegalArgumentException(
        s"graft_zordern dimension out of range [0, 2^$bits) for $k dims: $v — " +
          "offset, bucket, or scale dimensions before z-ordering")
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((v >>> i) & 1L) << (i * k + d)
      i += 1
    }
    out
  }

  /** Idempotent per-session registration (temp function registry); the
    * deployment route is `GraftExtensions` via `spark.sql.extensions`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ZOrderName,
      { exprs: Seq[Expression] => ZOrder2(exprs(0), exprs(1)) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ZOrderNName,
      { exprs: Seq[Expression] => ZOrderN(exprs) },
      "built-in")
  }

  /** Codegen'd 2-D Morton code; the session must have graft functions
    * wired (GraftExtensions or [[register]]).
    */
  def zorder2(a: Column, b: Column): Column =
    call_function(ZOrderName, a.cast("long"), b.cast("long"))

  /** Codegen'd K-dim Morton code (2..8 dims, `63/K` bits each). */
  def zorderN(dims: Column*): Column =
    call_function(ZOrderNName, dims.map(_.cast("long")): _*)
}
