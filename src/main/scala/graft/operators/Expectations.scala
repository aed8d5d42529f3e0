package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-expectations auditing (the library seam behind
  * `q52_expectations`): named rules over a table produce violation
  * counts in long format, with the plan invariant that matters at
  * 100 TB — the number of rules never changes the number of scans.
  *
  * Row rules are conditional sums folded into ONE aggregate pass.
  * An optional uniqueness rule (`n_rows − count(DISTINCT key)`) rides
  * the SAME pass: Spark plans a single distinct spec as a two-phase
  * aggregate, no Expand. A SECOND distinct spec would trigger Expand
  * and multiply the scan by the distinct count, which is why `audit`
  * accepts at most one uniqueness key — run a second audit for a
  * second key; two scans beat an Expand-doubled one.
  * Referential rules are a different shape by nature (they need the
  * parent): one LEFT ANTI orphan count per parent table.
  */
object Expectations {

  /** One-scan audit of `df`: each row rule is `(name, violated)`;
    * `uniqueKey` adds `(name, keyColumns)` counting duplicate-key rows.
    * Returns `(rule, n_violations, n_checked)`, one row per rule,
    * unordered — callers sort.
    */
  def audit(
      df: DataFrame,
      rowRules: Seq[(String, Column)],
      uniqueKey: Option[(String, Seq[Column])] = None): DataFrame = {
    val (wide, names) = auditWide(df, rowRules, uniqueKey)
    stackLong(wide, names)
  }

  /** The audit's wide half: ONE aggregate row with a `n_checked` column
    * plus one violation-count column per rule — the composition point
    * for rules of a different plan shape ([[referential]] counts
    * cross-join in as extra columns before [[stackLong]] pivots,
    * keeping the whole audit's scan count fixed).
    */
  def auditWide(
      df: DataFrame,
      rowRules: Seq[(String, Column)],
      uniqueKey: Option[(String, Seq[Column])] = None): (DataFrame, Seq[String]) = {
    require(rowRules.nonEmpty || uniqueKey.nonEmpty, "audit needs at least one rule")
    val uniqAgg = uniqueKey.map { case (n, cols) =>
      (count(lit(1)) - countDistinct(struct(cols: _*))).as(n)
    }.toSeq
    val aggs = count(lit(1)).as("n_checked") +: (uniqAgg ++
      rowRules.map { case (n, violated) =>
        sum(when(violated, 1L).otherwise(0L)).as(n)
      })
    (df.agg(aggs.head, aggs.tail: _*),
      uniqueKey.map(_._1).toSeq ++ rowRules.map(_._1))
  }

  /** Pivot a 1-row wide audit into `(rule, n_violations, n_checked)` —
    * `stack` over one row, metadata-sized.
    */
  def stackLong(wide: DataFrame, names: Seq[String]): DataFrame = {
    // names are interpolated into a generated stack() expression —
    // restrict to identifier characters so a quote or backtick cannot
    // break (or inject into) the parsed SQL
    names.foreach(n => require(n.matches("[A-Za-z0-9_]+"),
      s"rule name must be [A-Za-z0-9_]+, got '$n'"))
    val stackArgs = names.map(n => s"'$n', `$n`").mkString(", ")
    wide.select(col("n_checked"),
        expr(s"stack(${names.size}, $stackArgs) AS (rule, n_violations)"))
      .select(col("rule"),
        col("n_violations").cast("long").as("n_violations"), col("n_checked"))
  }

  /** Referential-integrity rule: count of `child` rows whose `childKey`
    * has no match in `parent.parentKey` — a LEFT ANTI probe (broadcast
    * when the parent's key projection is small; a bloom pre-filter is
    * the 100 TB variant for parent tables that are not). Returns ONE
    * wide row whose single column is named after the rule, ready to
    * cross into [[auditWide]]'s row.
    */
  def referential(
      name: String,
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(broadcast(parent.select(col(parentKey))),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as(name))
}
