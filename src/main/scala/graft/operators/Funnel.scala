package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-stage ordered funnel over any event frame — the general seam
  * behind `Relational.q45Funnel`. Product-analytics funnels are
  * classically written as K-1 self-joins of the fact table ("users who
  * did A, then B after A, then C after B"), which re-shuffles the facts
  * at every stage; here stage k's first-reach time is a conditional
  * `min` OVER the entity partition whose condition references stage
  * k-1's column, so ALL K stages ride ONE entity exchange — K
  * sequential Window operators on the same partitioning, zero joins,
  * for ANY stage list (plan shape pinned in PlanShapeSpec via q45).
  *
  * Semantics (pinned on a fixture in PlannerSurfaceSpec): greedy
  * earliest-time — stage 1's time is the first event matching its
  * predicate; stage k's is the first match STRICTLY after stage k-1's
  * time, so ties do not progress the funnel and out-of-order events
  * don't count. Output is one row per stage: (stage = "«k»_«label»",
  * users = entities that reached it), ordered by stage.
  */
object Funnel {

  def ordered(events: DataFrame, entity: Column, ts: Column,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // labels are spliced into the final stack() expression — keep them
    // identifier-shaped rather than escaping arbitrary SQL strings
    require(stages.forall(_._1.matches("[A-Za-z0-9_-]+")),
      s"stage labels must be [A-Za-z0-9_-]+: ${stages.map(_._1)}")
    // working columns get a namespaced prefix so a caller frame that
    // already has _t1/_s1-style names cannot be silently clobbered
    def t(i: Int) = s"__funnel_t$i"
    def s(i: Int) = s"__funnel_s$i"
    def u(i: Int) = s"__funnel_u$i"
    require(!events.columns.exists(_.startsWith("__funnel_")),
      "input columns may not start with __funnel_")
    val byEntity = Window.partitionBy(entity)
    val staged = stages.zipWithIndex.foldLeft(events) {
      case (acc, ((_, pred), i)) =>
        val cond = if (i == 0) pred else pred && ts > col(t(i))
        acc.withColumn(t(i + 1), min(when(cond, ts)).over(byEntity))
    }
    val reached = stages.indices
      .map(i => max(col(t(i + 1)).isNotNull).as(s(i + 1)))
    val perEntity = staged.groupBy(entity)
      .agg(reached.head, reached.tail: _*)
    val totals = stages.indices
      .map(i => sum(when(col(s(i + 1)), 1L).otherwise(0L)).as(u(i + 1)))
    // zero-pad the stage index to the width of K so the output ORDER BY
    // on the label string is numeric order for ANY stage count (a bare
    // index would sort 10 before 2); K <= 9 keeps the familiar 1_..9_
    val width = stages.length.toString.length
    val stackArgs = stages.zipWithIndex
      .map { case ((label, _), i) =>
        s"'%0${width}d_%s'".format(i + 1, label) + s", ${u(i + 1)}" }
      .mkString(", ")
    perEntity.agg(totals.head, totals.tail: _*)
      .select(expr(s"stack(${stages.length}, $stackArgs) AS (stage, users)"))
      .orderBy(col("stage"))
  }
}
