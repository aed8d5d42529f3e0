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
    * @param time      event-time column name (present in both; must be
    *                  TimestampType when a tolerance is given)
    * @param idCol     per-row id column, present in BOTH sides (kept on
    *                  the left output; deterministic tie-break on both)
    * @param rightVals right-side columns to carry (prefixed `asof_`)
    * @param direction "backward" (default): most recent right row with
    *                  time <= left time; "forward": nearest right row
    *                  with time >= left time — implemented as the SAME
    *                  one-shuffle windowed union with the time order
    *                  reversed (no second formulation to maintain)
    * @param toleranceMicros match accepted only when |l.time − r.time|
    *                  ≤ this; outside it the asof_* columns are null —
    *                  pandas merge_asof's `tolerance`. The matched right
    *                  row's time travels inside the carried struct, so
    *                  the check costs one codegen'd comparison, not a
    *                  join back
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      idCol: String,
      rightVals: Seq[String],
      direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    // The matched right row's time travels as the reserved `_rts` struct
    // field; a rightVals column with that name would make the
    // `_asof._rts` field lookup ambiguous (duplicate struct field names
    // resolve arbitrarily) — fail fast instead.
    require(!rightVals.contains("_rts"),
      "rightVals must not contain the reserved column name _rts")
    // The tolerance check runs unix_micros over both times; a non-
    // timestamp time column would fail deep inside analysis — surface
    // the documented requirement here.
    if (toleranceMicros.isDefined)
      require(right.schema(time).dataType ==
          org.apache.spark.sql.types.TimestampType,
        s"toleranceMicros requires a TimestampType time column, " +
          s"got ${right.schema(time).dataType.simpleString} for '$time'")
    // The carried right row travels as ONE struct through the window, so
    // every asof_* value comes from the same right row even when some of
    // its fields are null (per-column last(ignoreNulls) could mix rows).
    // The right row's own time rides along as _rts for the tolerance.
    val rowType = org.apache.spark.sql.types.StructType(
      right.schema(time).copy(name = "_rts") +:
        rightVals.map(v => right.schema(v).copy(name = v)))
    val lTagged = left.select(
      col(key), col(time), lit(1).as("_side"), col(idCol).as("_id"),
      lit(null).cast(rowType).as("_r"))
    val rTagged = right.select(
      col(key), col(time), lit(0).as("_side"), col(idCol).as("_id"),
      struct(col(time).as("_rts") +: rightVals.map(col): _*).as("_r"))

    // Right rows sort before left rows at equal time (_side 0 < 1), so a
    // same-instant right row is already visible to the left row — in
    // both directions (forward scans time-descending; the running last
    // at a left row is then the SMALLEST right time >= it).
    val timeOrd = if (direction == "backward") col(time).asc else col(time).desc
    val w = Window.partitionBy(col(key))
      .orderBy(timeOrd, col("_side"), col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lTagged.unionByName(rTagged)
      .select(col(key), col(time), col("_side"), col("_id"),
        last(col("_r"), ignoreNulls = true).over(w).as("_asof"))

    // Null (no-match) _asof propagates: abs(null) ≤ t is null → otherwise.
    val inTol = toleranceMicros.fold(lit(true)) { t =>
      abs(unix_micros(col(time)) - unix_micros(col("_asof._rts"))) <= t
    }
    filled.filter(col("_side") === 1)
      .select(col(key) +: col("_id").as(idCol) +: col(time) +:
        rightVals.map(v =>
          when(inTol, col(s"_asof.$v"))
            .otherwise(lit(null).cast(right.schema(v).dataType))
            .as(s"asof_$v")): _*)
  }
}
