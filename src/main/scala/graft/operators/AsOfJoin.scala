package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with
  * the same key and time <= the left row's time.
  *
  * Spark has no native as-of operator; the preference-ordered options
  * are (a) compose built-ins, (b) custom Expression, (c) custom
  * SparkPlan. This is (a), and it is also the SCALABLE shape: a naive
  * range-join (`l JOIN r ON key AND r.ts <= l.ts` + argmax) is quadratic
  * per key; this implementation unions both sides tagged, then takes a
  * running `last(..., ignoreNulls)` over one (key, time)-sorted window —
  * a single shuffle on the key, linear work per partition, no pairwise
  * blow-up. Equal timestamps resolve right-before-left (the right row is
  * visible to a left row at the same instant); ties within a side break
  * on the id column for determinism.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     rows providing the as-of value
    * @param key       equi-join key column name (present in both)
    * @param time      event-time column name (present in both)
    * @param idCol     per-row id column, present in BOTH sides (kept on
    *                  the left output; deterministic tie-break on both)
    * @param rightVals right-side columns to carry (prefixed `asof_`)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      idCol: String,
      rightVals: Seq[String]): DataFrame = {
    // The carried right row travels as ONE struct through the window, so
    // every asof_* value comes from the same right row even when some of
    // its fields are null (per-column last(ignoreNulls) could mix rows).
    val rowType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => right.schema(v).copy(name = v)))
    val lTagged = left.select(
      col(key), col(time), lit(1).as("_side"), col(idCol).as("_id"),
      lit(null).cast(rowType).as("_r"))
    val rTagged = right.select(
      col(key), col(time), lit(0).as("_side"), col(idCol).as("_id"),
      struct(rightVals.map(col): _*).as("_r"))

    // Right rows sort before left rows at equal time (_side 0 < 1), so a
    // same-instant right row is already visible to the left row.
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"), col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lTagged.unionByName(rTagged)
      .select(col(key), col(time), col("_side"), col("_id"),
        last(col("_r"), ignoreNulls = true).over(w).as("_asof"))

    filled.filter(col("_side") === 1)
      .select(col(key) +: col("_id").as(idCol) +: col(time) +:
        rightVals.map(v => col(s"_asof.$v").as(s"asof_$v")): _*)
  }
}
