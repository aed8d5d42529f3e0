package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key equi-joins (SURVEY scale notes; the
  * technique AQE's skew-join applies automatically, available here
  * explicitly for when the build side must not broadcast).
  *
  * The fact side gets a deterministic content-derived salt in
  * [0, nSalts); the (small but hot) dimension side is replicated once per
  * salt value; the join key becomes (key, salt). Each hot key's rows then
  * spread across nSalts shuffle partitions instead of serializing through
  * one straggler task. The result set is identical to the unsalted join —
  * salting only reshapes the partitioning.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(nSalts.toLong)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    // Hint the REPLICATED DIM side: shuffle_hash builds its hash map from
    // the hinted side, and building from the fact would allocate a
    // fact-partition-sized map per task (found as BuildLeft in a round-7
    // plan audit — at 100 TB a straight scale-killer; the dim×nSalts side
    // stays small by the operator's own premise).
    salted
      .join(replicated.hint("shuffle_hash"), Seq(key, "_salt"))
      .drop("_salt")
  }
}
