package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta and KLL sketch algebra (Apache DataSketches, already on the
  * Spark classpath) — the two mergeable-sketch families Spark's built-in
  * surface does NOT expose:
  *
  *   - '''Theta''' sketches support full SET ALGEBRA — intersection and
  *     A-not-B, not just union. HLL (q29/q44) answers "distinct users in
  *     a window" but fundamentally cannot answer "distinct users in BOTH
  *     windows" (retention) or "in A but not B" (churn) without a
  *     fact-table self-join; a theta sketch per cohort makes those
  *     KB-sized sketch-on-sketch operations. At 100 TB this is the
  *     difference between a retention dashboard that rescans and
  *     self-joins the fact table per (day, day+1) pair and one that
  *     intersects two stored 32 KB sketches. Below its nominal-entries
  *     capacity (2^lgK) a theta sketch retains every distinct hash, so
  *     estimates — including intersections and differences of exact-mode
  *     sketches — are EXACT, which is what lets q48 carry a full DuckDB
  *     hash-parity oracle at verify scale; past capacity it degrades to
  *     bounded-error sampling, which is the 100 TB operating mode.
  *
  *   - '''KLL''' quantile sketches are the mergeable counterpart of
  *     q30's GK summary: bounded size, provable normalized rank error,
  *     and closed under merge — so per-day sketches can be STORED and
  *     any window's percentiles re-derived without touching facts (the
  *     q44 storage pattern applied to quantiles; q49 + SketchZone).
  *
  * All aggregates are [[TypedImperativeAggregate]]s (Spark's own
  * HLL/quantile sketch aggregates use the same seam): partial
  * aggregation ships fixed-size serialized sketches, never raw values,
  * so the shuffle for a sketch build moves O(groups × sketch_size)
  * regardless of input row count. Scalar sketch ops are codegen'd
  * static calls (day-level row counts, but no reason to break the
  * WholeStageCodegen span around them).
  *
  * Ref: the reference's distinct-count analytics are exact GROUP BYs
  * (the analytics SQL in its README.md:102-122); this family is the
  * scale path the reference lacks, per the builder brief's "beyond the
  * reference" mandate.
  */
object SketchExpressions {

  val ThetaAggName = "graft_theta_sketch_agg"
  val ThetaUnionAggName = "graft_theta_union_agg"
  val ThetaEstimateName = "graft_theta_estimate"
  val ThetaIntersectName = "graft_theta_intersect_estimate"
  val ThetaANotBName = "graft_theta_anotb_estimate"
  val KllAggName = "graft_kll_sketch_agg"
  val KllMergeAggName = "graft_kll_merge_agg"
  val KllQuantileName = "graft_kll_quantile"
  val FreqAggName = "graft_freq_sketch_agg"
  val FreqTopItemsName = "graft_freq_top_items"
  val BloomAggName = "graft_bloom_filter_agg"

  // ---- static helpers: one body shared by interpreted eval and the
  // generated code (the LayoutExpressions.morton2 discipline) ----

  private def wrap(bytes: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(bytes))

  /** Rounded distinct estimate of a serialized theta sketch. */
  def thetaEstimate(sk: Array[Byte]): Long =
    Math.round(wrap(sk).getEstimate)

  /** Rounded |A ∩ B| of two serialized theta sketches. */
  def thetaIntersectEstimate(a: Array[Byte], b: Array[Byte]): Long =
    Math.round(SetOperation.builder().buildIntersection()
      .intersect(wrap(a), wrap(b)).getEstimate)

  /** Rounded |A \ B| of two serialized theta sketches. */
  def thetaANotBEstimate(a: Array[Byte], b: Array[Byte]): Long =
    Math.round(SetOperation.builder().buildANotB()
      .aNotB(wrap(a), wrap(b)).getEstimate)

  /** Quantile at `rank` of a serialized KLL doubles sketch; NaN for an
    * empty sketch (a group with only null inputs) — the caller decides
    * whether empty groups are possible, the expression never throws.
    */
  def kllQuantile(sk: Array[Byte], rank: Double): Double = {
    val s = KllDoublesSketch.heapify(Memory.wrap(sk))
    if (s.isEmpty) Double.NaN
    else s.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }

  /** Frequent items of a serialized frequencies sketch, NO_FALSE_NEGATIVES
    * (every true heavy hitter appears; past capacity some light items may
    * ride along — their lb/ub bounds say so). Returns
    * array<struct<item, est, lb, ub>> sorted by estimate descending.
    */
  def freqTopItems(sk: Array[Byte])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = ItemsSketch.getInstance[String](
      Memory.wrap(sk), new ArrayOfStringsSerDe())
    val rows = s.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.map { r =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(r.getItem), r.getEstimate,
          r.getLowerBound, r.getUpperBound)
      })
  }

  /** (name, implementing class, builder) for every sketch function —
    * one list feeds both [[register]] and `GraftExtensions`.
    */
  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    (ThetaAggName, classOf[ThetaSketchAgg],
      { exprs: Seq[Expression] => ThetaSketchAgg(exprs.head, lgKOf(exprs)) }),
    (ThetaUnionAggName, classOf[ThetaUnionAgg],
      { exprs: Seq[Expression] => ThetaUnionAgg(exprs.head, lgKOf(exprs)) }),
    (ThetaEstimateName, classOf[ThetaEstimate],
      { exprs: Seq[Expression] => ThetaEstimate(exprs.head) }),
    (ThetaIntersectName, classOf[ThetaIntersectEst],
      { exprs: Seq[Expression] => ThetaIntersectEst(exprs(0), exprs(1)) }),
    (ThetaANotBName, classOf[ThetaANotBEst],
      { exprs: Seq[Expression] => ThetaANotBEst(exprs(0), exprs(1)) }),
    (KllAggName, classOf[KllDoublesAgg],
      { exprs: Seq[Expression] => KllDoublesAgg(exprs.head, kOf(exprs)) }),
    (KllMergeAggName, classOf[KllMergeAgg],
      { exprs: Seq[Expression] => KllMergeAgg(exprs.head, kOf(exprs)) }),
    (KllQuantileName, classOf[KllQuantileExpr],
      { exprs: Seq[Expression] => KllQuantileExpr(exprs(0), exprs(1)) }),
    (FreqAggName, classOf[FreqItemsAgg],
      { exprs: Seq[Expression] =>
        FreqItemsAgg(exprs.head,
          if (exprs.length > 1) constInt(exprs(1), "freq maxMapSize") else 512) }),
    (FreqTopItemsName, classOf[FreqTopItems],
      { exprs: Seq[Expression] => FreqTopItems(exprs.head) }),
    (BloomAggName, classOf[BloomAgg],
      { exprs: Seq[Expression] =>
        BloomAgg(exprs.head,
          if (exprs.length > 1) constInt(exprs(1), "bloom expectedItems")
          else 4096) }))

  /** Idempotent per-session registration; deployment route is
    * `GraftExtensions` via `spark.sql.extensions` (same dual wiring as
    * every other graft function).
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }

  /** Analysis-time input typing for the sketch functions. The public
    * `ExpectsInputTypes` route is unavailable outside org.apache.spark
    * (`AbstractDataType` is private[sql]), so every sketch expression
    * overrides `checkInputDataTypes` with this helper instead — the SQL
    * path (GraftExtensions) must fail at analysis like the Column path,
    * never with an executor-side ClassCastException mid-scan.
    */
  private[functions] def requireTypes(name: String,
      children: Seq[(Expression, Seq[DataType])])
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    children.zipWithIndex.collectFirst {
      case ((e, allowed), i) if !allowed.contains(e.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$name argument ${i + 1} requires ${allowed.mkString(" or ")}, " +
            s"got ${e.dataType}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  /** Sketch parameters are PLAN constants (they fix buffer layouts), so
    * they must arrive as integer literals — anything else fails at
    * analysis, not mid-job.
    */
  private def constInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }
  private def lgKOf(exprs: Seq[Expression]): Int =
    if (exprs.length > 1) constInt(exprs(1), "theta lgK") else 12
  private def kOf(exprs: Seq[Expression]): Int =
    if (exprs.length > 1) constInt(exprs(1), "kll k") else 200

  // ---- Column API ----

  /** Theta sketch of a key column (long/int/string/binary). Exact below
    * 2^lgK distinct values, bounded-error beyond.
    */
  def thetaSketch(c: Column, lgK: Int = 12): Column =
    call_function(ThetaAggName, c, lit(lgK))

  /** Union of STORED serialized theta sketches (the zone read path). */
  def thetaUnion(c: Column, lgK: Int = 12): Column =
    call_function(ThetaUnionAggName, c, lit(lgK))

  def thetaEstimateCol(sk: Column): Column =
    call_function(ThetaEstimateName, sk)

  /** Rounded |A ∩ B| — the retention estimator. */
  def thetaIntersect(a: Column, b: Column): Column =
    call_function(ThetaIntersectName, a, b)

  /** Rounded |A \ B| — the churn estimator. */
  def thetaANotB(a: Column, b: Column): Column =
    call_function(ThetaANotBName, a, b)

  /** KLL doubles sketch of a numeric column; k=200 ⇒ ~1.65% normalized
    * rank error, a few KB serialized regardless of input count.
    */
  def kllSketch(c: Column, k: Int = 200): Column =
    call_function(KllAggName, c.cast("double"), lit(k))

  /** Merge of STORED serialized KLL sketches (the zone read path). `k`
    * must match the writers' — KLL merge keeps the SMALLER k (coarser
    * error), so a mismatch degrades accuracy silently rather than
    * failing; the zone pins one k the same way the HLL zone pins lgK.
    */
  def kllMerge(c: Column, k: Int = 200): Column =
    call_function(KllMergeAggName, c, lit(k))

  def kllQuantileCol(sk: Column, rank: Double): Column =
    call_function(KllQuantileName, sk, lit(rank))

  /** Frequencies (heavy hitters) sketch of a string column; `maxMapSize`
    * (power of 2) bounds memory. Counts are exact while distinct items
    * stay under the purge threshold (~0.75·maxMapSize); beyond it every
    * estimate carries `getMaximumError`-bounded uncertainty and the
    * top-items read keeps NO_FALSE_NEGATIVES.
    */
  /** Bloom filter of a key column (long/int/string/binary), serialized
    * (BinaryType, `spark-sketch` wire format — [[org.apache.spark.util
    * .sketch.BloomFilter.readFrom]] on the read side). `expectedItems`
    * sizes the bit array for ~3% false positives at that cardinality; a
    * plan constant, like every sketch parameter here.
    */
  def bloomAgg(c: Column, expectedItems: Int = 4096): Column =
    call_function(BloomAggName, c, lit(expectedItems))

  def freqSketch(c: Column, maxMapSize: Int = 512): Column =
    call_function(FreqAggName, c, lit(maxMapSize))

  /** array<struct<item, est, lb, ub>> of a serialized frequencies
    * sketch, estimate-descending.
    */
  def freqTopItemsCol(sk: Column): Column =
    call_function(FreqTopItemsName, sk)
}

/** Mergeable theta sketch aggregate over raw keys. The buffer is a
  * DataSketches theta `Union` (cheap to update, closed under merge);
  * partial results cross the shuffle as compact-sketch bytes. Output is
  * the serialized [[CompactSketch]] (BinaryType) — feed it to
  * [[ThetaEstimate]] / [[ThetaIntersectEst]] / [[ThetaANotBEst]] or
  * store it in a sketch zone.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = SketchExpressions.ThetaAggName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName, Seq(child -> Seq(LongType, IntegerType, StringType, BinaryType)))

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType => buffer.update(v.asInstanceOf[Array[Byte]])
      case dt => throw new IllegalStateException(s"unsupported input: $dt")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Mergeable Bloom-filter aggregate over raw keys — the MEMBERSHIP
  * sketch the theta/KLL/frequencies families don't cover: a theta
  * sketch answers "how many distinct", a bloom filter answers "could
  * this key be here" in O(1) with no false negatives. Built on Spark's
  * own `spark-sketch` [[org.apache.spark.util.sketch.BloomFilter]]
  * (the engine's runtime-filter implementation — `bloom_filter_agg` is
  * not registered for end users in Spark 4, so this exposes the same
  * machinery through the graft function surface). Partials cross the
  * shuffle as serialized filters; `mergeInPlace` is bitwise OR, so the
  * aggregate is associative and partial-aggregation-safe. Output is
  * the `writeTo` wire format, readable driver-side via `readFrom` —
  * which is what [[graft.operators.ZoneMap.bloomPrunedRead]] does for
  * per-file point-lookup skipping.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.util.sketch.BloomFilter]
  with UnaryLike[Expression] {

  import org.apache.spark.util.sketch.BloomFilter

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = SketchExpressions.BloomAggName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName,
      Seq(child -> Seq(LongType, IntegerType, StringType, BinaryType)))

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems.toLong)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.putLong(v.asInstanceOf[Long])
      case IntegerType => buffer.putLong(v.asInstanceOf[Int].toLong)
      case StringType => buffer.putString(v.asInstanceOf[UTF8String].toString)
      case BinaryType => buffer.putBinary(v.asInstanceOf[Array[Byte]])
      case dt => throw new IllegalStateException(s"unsupported input: $dt")
    }
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)
  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(n: Int): BloomAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** Union of already-serialized theta sketches — the STORED-sketch read
  * path (window query over a sketch zone), mirroring Spark's own
  * `hll_union_agg`. Null rows (absent days) are skipped.
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = SketchExpressions.ThetaUnionAggName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName, Seq(child -> Seq(BinaryType)))

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Rounded distinct estimate of a serialized theta sketch (LongType —
  * exact-mode sketches hash-match a BIGINT oracle).
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = SketchExpressions.ThetaEstimateName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName, Seq(child -> Seq(BinaryType)))
  override def nullSafeEval(v: Any): Any =
    SketchExpressions.thetaEstimate(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchExpressions.thetaEstimate($c)")
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Rounded |A ∩ B| of two serialized theta sketches. */
case class ThetaIntersectEst(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = SketchExpressions.ThetaIntersectName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName, Seq(left -> Seq(BinaryType), right -> Seq(BinaryType)))
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchExpressions.thetaIntersectEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SketchExpressions.thetaIntersectEstimate($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEst =
    copy(left = newLeft, right = newRight)
}

/** Rounded |A \ B| of two serialized theta sketches. */
case class ThetaANotBEst(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = SketchExpressions.ThetaANotBName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName, Seq(left -> Seq(BinaryType), right -> Seq(BinaryType)))
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchExpressions.thetaANotBEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SketchExpressions.thetaANotBEstimate($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotBEst =
    copy(left = newLeft, right = newRight)
}

/** Mergeable KLL doubles-quantile sketch aggregate. Buffer is the heap
  * sketch itself (KLL merge is in-place); partials cross the shuffle as
  * its few-KB serialized form. Output BinaryType — query with
  * [[KllQuantileExpr]] or store per-day in a sketch zone.
  *
  * KLL compaction draws a random offset, so two builds over the same
  * data may differ in which sample values they retain — estimates agree
  * within the published normalized rank error but are NOT bit-stable
  * run to run. Exactly like q29/q30/q44, the contract is therefore
  * pinned by spec (rank-error bound + merge law within merged-sketch
  * error), not by a foreign engine's hash.
  */
case class KllDoublesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = SketchExpressions.KllAggName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName, Seq(child -> Seq(DoubleType)))

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesAgg =
    copy(child = newChild)
}

/** Merge of already-serialized KLL sketches — the stored-sketch read
  * path (window percentiles over a sketch zone). Null rows are skipped.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = SketchExpressions.KllMergeAggName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName, Seq(child -> Seq(BinaryType)))

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(
      KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Quantile lookup in a serialized KLL sketch; NaN for empty. */
case class KllQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = SketchExpressions.KllQuantileName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName, Seq(left -> Seq(BinaryType), right -> Seq(DoubleType)))
  override def nullSafeEval(sk: Any, q: Any): Any =
    SketchExpressions.kllQuantile(
      sk.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (sk, q) =>
      s"graft.functions.SketchExpressions.kllQuantile($sk, $q)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)
}

/** Mergeable frequencies (heavy-hitters) sketch over strings —
  * Misra-Gries style: at most `maxMapSize` counters regardless of the
  * distinct-item universe, closed under merge. The 100 TB vocabulary
  * argument: an exact token top-k shuffles the full distinct-token
  * universe (billions of keys); the sketch ships one bounded map per
  * partial, and purged weight is tracked so every estimate carries
  * explicit lower/upper bounds. Exact while distinct items fit the map
  * (the verify-scale mode x19 rides); NO_FALSE_NEGATIVES beyond.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = SketchExpressions.FreqAggName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName, Seq(child -> Seq(StringType)))

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance[String](Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(n: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}

/** Top items of a serialized frequencies sketch as
  * array<struct<item, est, lb, ub>>, estimate-descending,
  * NO_FALSE_NEGATIVES.
  */
case class FreqTopItems(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = SketchExpressions.FreqTopItemsName
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SketchExpressions.requireTypes(prettyName, Seq(child -> Seq(BinaryType)))
  override def nullSafeEval(v: Any): Any =
    SketchExpressions.freqTopItems(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchExpressions.freqTopItems($c)")
  override protected def withNewChildInternal(newChild: Expression): FreqTopItems =
    copy(child = newChild)
}
