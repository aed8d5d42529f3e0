package graft

import java.sql.Timestamp

import graft.queries.Relational

/** Contract of [[Relational.q51Scd2History]] beyond the fixture oracle:
  * on randomized attribute histories the build must agree with an
  * independent in-memory reference (sort → run-collapse → close), and
  * the SCD2 invariants must hold structurally — versions are dense from
  * 1, adjacent versions never carry the same value (else the collapse
  * missed a run), each version's valid_to equals the next version's
  * valid_from, and exactly one version per key is current. Random
  * histories cover what orders.parquet cannot guarantee: same-day
  * changes (order-key tie-break), single-row keys, and keys whose value
  * never changes.
  */
class Scd2Spec extends SparkSpec {

  private case class V(cust: Long, version: Long, priority: String,
    from: String, to: Option[String], current: Boolean)

  /** Reference build: plain Scala, no Spark — deliberately a different
    * algorithm shape (groupBy + iterate) than the windowed SQL.
    */
  private def reference(rows: Seq[(Long, String, Timestamp, Long)]): Seq[V] = {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    rows.groupBy(_._1).toSeq.flatMap { case (cust, hs) =>
      val ordered = hs.sortBy(h => (h._3.getTime, h._4))
      val changes = ordered.foldLeft(Vector.empty[(String, Timestamp)]) {
        case (acc, (_, p, d, _)) =>
          if (acc.lastOption.exists(_._1 == p)) acc else acc :+ (p, d)
      }
      changes.zipWithIndex.map { case ((p, d), i) =>
        val next = changes.lift(i + 1).map(c => fmt.format(c._2))
        V(cust, i + 1L, p, fmt.format(d), next, next.isEmpty)
      }
    }.sortBy(v => (v.cust, v.version))
  }

  private def runSpark(rows: Seq[(Long, String, Timestamp, Long)]): Seq[V] = {
    import spark.implicits._
    val dir = tmpDir("scd2")
    rows.toDF("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Relational.q51Scd2History(spark, dir).collect().toSeq.map { r =>
      V(r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        Option(r.getString(4)), r.getBoolean(5))
    }
  }

  // UTC-pinned (the reference formatter and the Spark session both run
  // UTC; Timestamp.valueOf would parse in the JVM default zone and
  // shift day strings on a non-UTC JVM)
  private def ts(day: Int): Timestamp = Timestamp.from(
    java.time.LocalDate.of(2024, 1, day)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant)

  test("randomized histories: windowed build equals the in-memory reference") {
    val rnd = new scala.util.Random(51)
    val pris = Array("1-URGENT", "2-HIGH", "3-MEDIUM")
    for (trial <- 1 to 3) {
      val rows = (1 to 400).map { i =>
        (rnd.nextInt(25).toLong, pris(rnd.nextInt(3)), ts(1 + rnd.nextInt(28)), i.toLong)
      }
      assert(runSpark(rows) == reference(rows), s"trial $trial diverged")
    }
  }

  test("SCD2 invariants: dense versions, collapsed runs, chained validity, one current row") {
    val rnd = new scala.util.Random(151)
    val pris = Array("A", "B")
    // heavy same-day collisions: 200 rows over 6 keys × 5 days forces
    // the o_orderkey tie-break to decide run order within a day
    val rows = (1 to 200).map { i =>
      (rnd.nextInt(6).toLong, pris(rnd.nextInt(2)), ts(1 + rnd.nextInt(5)), i.toLong)
    }
    val out = runSpark(rows)
    out.groupBy(_.cust).foreach { case (cust, vs) =>
      val s = vs.sortBy(_.version)
      assert(s.map(_.version) == (1L to s.size).toVector.map(identity), s"$cust versions not dense")
      s.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.priority != b.priority, s"$cust adjacent versions share a value")
          assert(a.to.contains(b.from), s"$cust validity chain broken")
        case _ => ()
      }
      assert(s.count(_.current) == 1 && s.last.current, s"$cust current-row violation")
      assert(s.init.forall(!_.current))
    }
  }

  test("degenerate keys: single row and never-changing value yield one open version") {
    val rows = Seq(
      (1L, "X", ts(5), 10L),
      (2L, "Y", ts(1), 11L), (2L, "Y", ts(9), 12L), (2L, "Y", ts(20), 13L))
    val out = runSpark(rows)
    assert(out == Seq(
      V(1L, 1L, "X", "2024-01-05", None, current = true),
      V(2L, 1L, "Y", "2024-01-01", None, current = true)))
  }
}
