package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expression for the vector dot product.
  *
  * The composable alternative — `aggregate(zip_with(a, b, multiply))` —
  * is a higher-order function: Catalyst interprets the lambda per
  * element, allocates an intermediate zipped array, and breaks
  * whole-stage codegen. This expression generates a tight primitive
  * loop instead (observed ~8x on the pairwise similarity queries).
  *
  * Accumulation is sequential in array order, i.e. bit-identical to both
  * the fold-left formulation and DuckDB's `list_dot_product` over
  * DOUBLE[] — so swapping it in changes nothing about oracle parity
  * (see OPERATORS.md determinism rules).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double>; [[VectorExpressions.dotp]]
  // inserts the casts (keeps this node free of package-private
  // type-coercion traits).
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for the integer squared Euclidean
  * distance between two `array<bigint>` vectors — [[DotProduct]]'s
  * sibling for the EXACT-arithmetic k-means path
  * ([[graft.operators.Similarity.kmeans]]): the higher-order
  * `aggregate(zip_with(...))` formulation interprets the lambda per
  * element and breaks whole-stage codegen, which matters when the
  * expression runs k times per row per Lloyd round. Accumulation is
  * sequential in array order; all arithmetic is exact long math (the
  * caller's quantization bounds rule out overflow), so the result is
  * bit-identical to the fold and to the oracle's SQL sum — pinned in
  * KmeansSpec.
  *
  * Contract (matches the fold): mismatched array lengths return NULL
  * (zip_with pads the shorter side with nulls, which nulls the fold's
  * sum — a silently truncated partial distance would be worse than no
  * answer). Element values must be non-null — the k-means quantization
  * can't produce null elements, and unsafe array data has no cheap
  * per-element null answer a tight loop should pay for.
  */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<bigint>; [[VectorExpressions.sqdist]]
  // inserts the casts.
  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `SparkSessionExtensions` entry point: lets deployments wire the graft
  * functions at session build time
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) instead of
  * calling [[VectorExpressions.register]] imperatively.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(VectorExpressions.DotName),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, VectorExpressions.DotName),
      { exprs: Seq[Expression] => DotProduct(exprs(0), exprs(1)) }))
    e.injectFunction((
      FunctionIdentifier(VectorExpressions.SqDistName),
      new ExpressionInfo(classOf[LongSqDist].getCanonicalName, VectorExpressions.SqDistName),
      { exprs: Seq[Expression] => LongSqDist(exprs(0), exprs(1)) }))
    e.injectFunction((
      FunctionIdentifier(TextExpressions.TokensName),
      new ExpressionInfo(classOf[WordTokens].getCanonicalName, TextExpressions.TokensName),
      { exprs: Seq[Expression] => WordTokens(exprs.head) }))
    e.injectFunction((
      FunctionIdentifier(TextExpressions.SimHashName),
      new ExpressionInfo(classOf[SimHash60].getCanonicalName, TextExpressions.SimHashName),
      { exprs: Seq[Expression] => SimHash60(exprs.head) }))
    e.injectFunction((
      FunctionIdentifier(LayoutExpressions.ZOrderName),
      new ExpressionInfo(classOf[ZOrder2].getCanonicalName, LayoutExpressions.ZOrderName),
      { exprs: Seq[Expression] => ZOrder2(exprs(0), exprs(1)) }))
    e.injectFunction((
      FunctionIdentifier(LayoutExpressions.ZOrderNName),
      new ExpressionInfo(classOf[ZOrderN].getCanonicalName, LayoutExpressions.ZOrderNName),
      { exprs: Seq[Expression] => ZOrderN(exprs) }))
    SketchExpressions.builders.foreach { case (name, cls, b) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getCanonicalName, name), b))
    }
  }
}

object VectorExpressions {

  val DotName = "graft_dot"
  val SqDistName = "graft_sqdist"

  /** Idempotent per-session registration (temp function registry). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName,
      { exprs: Seq[Expression] => DotProduct(exprs(0), exprs(1)) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SqDistName,
      { exprs: Seq[Expression] => LongSqDist(exprs(0), exprs(1)) },
      "built-in")
  }

  /** Codegen'd dot product; caller must have called [[register]] on the
    * session owning these columns.
    */
  def dotp(a: Column, b: Column): Column =
    call_function(DotName, a.cast("array<double>"), b.cast("array<double>"))

  /** Codegen'd integer squared distance (see [[LongSqDist]]); caller
    * must have called [[register]] on the session owning these columns.
    */
  def sqdist(a: Column, b: Column): Column =
    call_function(SqDistName, a.cast("array<bigint>"), b.cast("array<bigint>"))
}
