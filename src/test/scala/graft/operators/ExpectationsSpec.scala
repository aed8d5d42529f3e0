package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of [[Expectations.audit]] beyond q52's fixture oracle: on
  * randomized tables the one-scan audit must equal brute-force
  * per-rule filters (the N-scans formulation it replaces), including
  * the uniqueness rule and null-valued rule inputs (a null predicate
  * result is NOT a violation — `when(violated, 1)` falls to otherwise,
  * matching SQL's `CASE WHEN` on both engines).
  */
class ExpectationsSpec extends SparkSpec {

  test("one-scan audit equals brute-force per-rule counts on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(52)
    val rows = (1 to 2000).map { i =>
      val v: java.lang.Double =
        if (rnd.nextInt(10) == 0) null else rnd.nextDouble() * 100.0
      // duplicate keys on purpose: k collides every 7
      (i.toLong % 700, rnd.nextInt(5).toLong, v)
    }
    val df = rows.toDF("k", "grp", "v")
    val rules = Seq(
      ("too_big", col("v") > 90.0),
      ("negative", col("v") < 0.0),
      ("v_null", col("v").isNull))
    val out = Expectations.audit(df, rules, Some(("k_unique", Seq(col("k")))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = df.count()
    rules.foreach { case (name, violated) =>
      assert(out(name) == (df.filter(violated).count(), n), name)
    }
    assert(out("k_unique") == (n - df.select("k").distinct().count(), n))
  }

  test("referential counts orphans exactly; zero when the parent covers") {
    import spark.implicits._
    val child = Seq(1L, 2L, 3L, 3L, 9L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val orphan = Expectations.referential("fk", child, "ck", parent, "pk")
    assert(orphan.collect().head.getLong(0) == 1L) // the 9
    assert(orphan.columns.toSeq == Seq("fk"))
    val full = Expectations.referential("fk", child, "ck",
      child.select($"ck".as("pk")), "pk")
    assert(full.collect().head.getLong(0) == 0L)
  }
}
