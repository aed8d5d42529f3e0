package graft

import org.apache.spark.sql.Row

import graft.queries.Relational

/** Edge-case semantics for the round-7 planner-surface trio (q35-q37).
  *
  * The sf fixtures contain no token-less documents, single-customer
  * nations, or single-digit-only id domains, so the oracle hash check
  * cannot exercise these boundaries — exactly the fixture-blind-spot
  * class the round-6 ADVICE caught on d4. Synthetic tables pin them.
  */
class PlannerSurfaceSpec extends SparkSpec {

  test("q35: token-less documents yield zeros/false, not nulls (aggregate init vs list_sum NULL)") {
    import spark.implicits._
    val dir = tmpDir("q35edge")
    Seq(
      (1L, "", "en", "s", 0L),              // empty text -> empty token array
      (2L, "?!· --", "en", "s", 7L),   // punctuation-only -> empty token array
      (3L, "Year 2024 saw gains", "en", "s", 19L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = Relational.q35ArrayHof(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // empty token arrays: every HOF result is its identity, never null
    for (r <- rows.take(2)) {
      assert(!r.anyNull, r.toString)
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(!r.getBoolean(4))
    }
    // "year 2024 saw gains": long tokens {gains}, lens 4+4+3+5=16,
    // initials {y,2,s,g}, and a purely-numeric token exists
    val r3 = rows(2)
    assert(r3.getLong(1) == 1L && r3.getLong(2) == 16L && r3.getLong(3) == 4L)
    assert(r3.getBoolean(4))
  }

  test("q36: per-nation LIMIT is exact at group sizes 0/1/3 and ties break by custkey") {
    import spark.implicits._
    val dir = tmpDir("q36edge")
    Seq((0, "EMPTY"), (1, "ONE"), (2, "THREE"))
      .toDF("n_nationkey", "n_name")
      .write.parquet(s"$dir/nation.parquet")
    Seq(
      (10L, "c10", 1, 50.0, "B"),
      (20L, "c20", 2, 70.0, "B"),  // tie on 70.0: custkey 20 beats 21
      (21L, "c21", 2, 70.0, "B"),
      (22L, "c22", 2, 60.0, "B")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")

    val rows = Relational.q36LateralTopn(spark, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows == Seq(("ONE", 10L, 50.0), ("THREE", 20L, 70.0), ("THREE", 21L, 70.0)))
  }

  test("q37: digit-trie walk lands every id at its leading digit with depth = digits-1") {
    import spark.implicits._
    val dir = tmpDir("q37edge")
    // ids 0 and 7 are their own roots at depth 0; 42 -> (4,1); 1234 -> (1,3)
    Seq(0L, 7L, 42L, 1234L).zipWithIndex
      .map { case (id, i) => (id, i.toLong * 1000000000L, 1L, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val rows = Relational.q37RecursiveCte(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows == Seq((0L, 0, 1L), (1L, 3, 1L), (4L, 1, 1L), (7L, 0, 1L)))
  }
}
