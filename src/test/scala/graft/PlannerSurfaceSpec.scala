package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{count, lit, max, min, sum}

import graft.queries.{Relational, TrainingData}

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

  test("q40: RANGE frame includes same-second peers and the exact -3600s boundary") {
    import spark.implicits._
    val dir = tmpDir("q40edge")
    val sec = 1000000000L // ns per second
    Seq(
      (1L, 0L * sec, 1L, "click", 1.0, "{}"),
      (2L, 0L * sec, 1L, "click", 2.0, "{}"),    // peer of e1: same second
      (3L, 3600L * sec, 1L, "click", 4.0, "{}"), // boundary: 0s is IN frame
      (4L, 7201L * sec, 1L, "click", 8.0, "{}"), // 3600s is OUT (7201-3600=3601)
      (5L, 0L * sec, 2L, "click", 0.5, "{}")     // other user: isolated partition
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val rows = Relational.q40RollingWindow(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(rows == Seq(
      (1L, 2L, 3.0), (2L, 2L, 3.0), // peers see each other both ways
      (3L, 3L, 7.0),                // [0, 3600] inclusive
      (4L, 1L, 8.0),                // [3601, 7201] — 3600 aged out
      (5L, 1L, 0.5)))
  }

  test("q41: merging partial aggs (any split, any order) equals the direct aggregate") {
    import spark.implicits._
    val rows = Seq( // (user_id, day, cents)
      (1L, "2024-01-01", 100L), (1L, "2024-01-01", 250L), (1L, "2024-01-01", -50L),
      (1L, "2024-01-02", 40L), (2L, "2024-01-01", 7L))
    def partial(part: Seq[(String, String, Long)]): org.apache.spark.sql.DataFrame =
      part.toDF("user_id", "day", "cents")
        .groupBy($"user_id", $"day")
        .agg(count(lit(1)).as("n_events"), sum($"cents").as("sum_cents"),
          min($"cents").as("min_cents"), max($"cents").as("max_cents"))
    val strs = rows.map(t => (t._1.toString, t._2, t._3))
    // three uneven parts, one of them overlapping a (user, day) cell split
    // across parts — the case a naive "union distinct" merge would break
    val merged = Relational
      .mergeAggSnapshot(partial(strs.take(2)), partial(strs.slice(2, 3)), partial(strs.drop(3)))
      .orderBy($"user_id", $"day").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(merged == Seq(
      ("1", "2024-01-01", 3L, 300L, -50L, 250L),
      ("1", "2024-01-02", 1L, 40L, 40L, 40L),
      ("2", "2024-01-01", 1L, 7L, 7L, 7L)))
  }

  test("q45: strict-order funnel — out-of-order and tied stages do not progress") {
    import spark.implicits._
    val dir = tmpDir("q45edge")
    val sec = 1000000000L
    Seq(
      (1L, 1L * sec, 1L, "view", 0.0, "{}"),     // u1: full ordered funnel
      (2L, 2L * sec, 1L, "click", 0.0, "{}"),
      (3L, 3L * sec, 1L, "purchase", 0.0, "{}"),
      (4L, 1L * sec, 2L, "click", 0.0, "{}"),    // u2: click BEFORE view
      (5L, 2L * sec, 2L, "view", 0.0, "{}"),
      (6L, 3L * sec, 2L, "purchase", 0.0, "{}"), // ...purchase needs a click after view
      (7L, 1L * sec, 3L, "view", 0.0, "{}"),     // u3: view/click tie -> no progress
      (8L, 1L * sec, 3L, "click", 0.0, "{}"),
      (9L, 1L * sec, 4L, "view", 0.0, "{}"),     // u4: click ok, purchase ties click
      (10L, 2L * sec, 4L, "click", 0.0, "{}"),
      (11L, 2L * sec, 4L, "purchase", 0.0, "{}"),
      (12L, 1L * sec, 5L, "purchase", 0.0, "{}") // u5: never viewed
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val rows = Relational.q45Funnel(spark, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows == Seq(("1_view", 4L), ("2_click", 2L), ("3_purchase", 1L)))

    // the K-stage seam q45 rides: a FOUR-stage list over the same
    // fixture (a second view strictly after the purchase), still zero
    // joins — NO user reaches stage 4 (u1's only view precedes its
    // purchase), so the tail stage must report 0, not error; predicates
    // and stage count are caller data, not code shape
    import org.apache.spark.sql.functions.col
    val events = graft.core.Tables.events(spark, dir)
    val four = graft.operators.Funnel.ordered(
      events.select(col("user_id"), col("event_type"), col("ts")),
      col("user_id"), col("ts"),
      Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase"),
        "review" -> (col("event_type") === "view")))
    assert(four.collect().toSeq.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("1_view", 4L), ("2_click", 2L), ("3_purchase", 1L), ("4_review", 0L)))
  }

  test("q42: null columns counted not ranked — all-null min/max is null, typed mins") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("q42edge")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))
    val t = java.sql.Timestamp.valueOf(_: String)
    val rows = Seq(
      Row(10L, 1L, "O", 9.5, t("2024-02-01 12:30:00"), "1-URGENT"),
      Row(9L, null, "F", null, t("2024-01-15 08:00:00"), "2-HIGH"),
      Row(11L, 2L, null, 100.25, null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$dir/orders.parquet")

    val m = Relational.q42ProfileStats(spark, dir).collect().toSeq
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4))))).toMap
    assert(m.size == 6 && m.values.forall(_._1 == 3L))
    assert(m("o_orderkey") == ((3L, 0L, Some("9"), Some("11"))))   // numeric, not "11"<"9"
    assert(m("o_custkey") == ((3L, 1L, Some("1"), Some("2"))))
    assert(m("o_orderstatus") == ((3L, 1L, Some("F"), Some("O"))))
    assert(m("o_totalprice") == ((3L, 1L, Some("950"), Some("10025")))) // exact cents
    assert(m("o_orderdate") ==
      ((3L, 1L, Some("2024-01-15 08:00:00"), Some("2024-02-01 12:30:00"))))
    assert(m("o_orderpriority") == ((3L, 1L, Some("1-URGENT"), Some("2-HIGH"))))
  }

  test("x18: overlap carry, short-doc single chunk, exact-boundary tiling, empty doc dropped") {
    import spark.implicits._
    val dir = tmpDir("x18edge")
    val words40 = (1 to 40).map(i => s"w$i").mkString(" ")
    val words24 = (1 to 24).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, words40, "en", "s", 40L), // 40 toks -> chunks at 0 (32) and 24 (16)
      (2L, "only three tokens", "en", "s", 17L), // single short chunk
      (3L, words24, "en", "s", 24L), // stride-exact: ONE chunk (start 24 >= n)
      (4L, "!!! ...", "en", "s", 7L)  // token-less -> no rows
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = TrainingData.x18ChunkSplit(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.map(t => (t._1, t._2, t._3)) ==
      Seq((1L, 0L, 32L), (1L, 1L, 16L), (2L, 0L, 3L), (3L, 0L, 24L)))
    // the second chunk re-reads 8 tokens of context: starts at w25
    assert(rows(1)._4.startsWith("w25 ") && rows(1)._4.endsWith(" w40"))
    assert(rows(0)._4.startsWith("w1 ") && rows(0)._4.endsWith(" w32"))
  }

  test("x17: integer-rational scores, token-asc tiebreak, df = doc freq, top-3 cap") {
    import spark.implicits._
    val dir = tmpDir("x17edge")
    Seq(
      (1L, "apple apple banana", "en", "s", 18L),
      (2L, "banana cherry", "en", "s", 13L),
      (3L, "cherry cherry cherry dog", "en", "s", 24L),
      (4L, "e f g h i", "en", "s", 9L) // 5 candidates -> exactly 3 survive
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = TrainingData.x17TfidfKeywords(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5)))
    assert(rows == Seq(
      (1L, 1L, "apple", 8L),  // tf 2 * n 4 div df 1
      (1L, 2L, "banana", 2L), // 1*4 div 2 — integer floor
      (2L, 1L, "banana", 2L), // score tie with cherry: token asc wins
      (2L, 2L, "cherry", 2L),
      (3L, 1L, "cherry", 6L), // 3*4 div 2
      (3L, 2L, "dog", 4L),
      (4L, 1L, "e", 4L), (4L, 2L, "f", 4L), (4L, 3L, "g", 4L)))
  }
}
