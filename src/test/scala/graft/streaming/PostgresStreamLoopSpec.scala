package graft.streaming

import org.apache.spark.sql.functions._

import graft.cardano.{JdbcSink, ScratchPostgres}

/** st12's stream→warehouse loop run against LIVE PostgreSQL 15 — the
  * reference's ACTUAL production pairing (`cardano_block_dao.py:93-148`:
  * `COPY` into a staging table + `INSERT … ON CONFLICT DO NOTHING` in
  * one transaction, driven by a polling loop). The stream side is the
  * IDENTICAL checkpointed driver st12 uses
  * ([[EventStream.runForeachBatchStream]] over
  * [[EventStream.stagedOverlapSource]] — two overlapping files, one per
  * micro-batch); only the warehouse transport differs:
  *
  *   - staging load: Spark writes each micro-batch as CSV part files
  *     (distributed — the executor-side analogue of the reference's
  *     dataframe buffer) which feed a real `COPY … FROM STDIN`, the
  *     reference's load statement, into the dialect's `UNLOGGED` staging
  *     clone;
  *   - merge: [[JdbcSink.PostgresDialect.mergeSql]] VERBATIM — the same
  *     generated `DISTINCT ON … ON CONFLICT DO NOTHING` statement the
  *     dialect suite pins — so batch b's full replay of batch a's keys
  *     must land zero duplicate rows;
  *   - read-back: `COPY (… ORDER BY pk) TO STDOUT`, row-compared against
  *     st6's oracle (the full merged event set) computed in Spark.
  *
  * psql is the wire (no pgjdbc jar in the sandbox — zero egress); the
  * distributed `df.write.jdbc` staging path is proven on live Derby in
  * JdbcSinkSpec, and this suite proves the PG-dialect merge semantics on
  * the PG engine with the stream driving it. Cancels when the host has
  * no Postgres install.
  *
  * A/B seam: `GRAFT_PG_SF_DIR` overrides the fixture scale and
  * `GRAFT_PG_AB=1` additionally times the embedded-Derby st12 loop in
  * the same JVM — how SCALE.md's measured floor comparison was produced.
  */
class PostgresStreamLoopSpec extends ScratchPostgres {

  private lazy val spark = graft.SparkSpec.session

  test("checkpointed stream lands in live Postgres via COPY staging + verbatim ON CONFLICT merge") {
    assume(available, "no usable PostgreSQL install on this host")
    val dir = sys.env.getOrElse("GRAFT_PG_SF_DIR", "/root/testdata/sf0.001")
    val (src, schema) = EventStream.stagedOverlapSource(spark, dir)
    sql("""CREATE TABLE events_wh (
          |  "event_id" BIGINT PRIMARY KEY, "event_type" VARCHAR(32),
          |  "user_id" BIGINT, "cents" BIGINT)""".stripMargin)
    val d = JdbcSink.PostgresDialect
    val cols = Seq("event_id", "event_type", "user_id", "cents")
    var batches = 0
    val t0 = System.nanoTime()
    EventStream.runForeachBatchStream(spark, src, schema) { batch =>
      batches += 1
      val stg = s"stg_events_b$batches"
      sql(d.createStagingSql("events_wh", stg))
      // Distributed CSV write of the micro-batch; the driver then feeds
      // the parts to one COPY (the reference's single-connection load).
      val out = java.nio.file.Files.createTempDirectory("pgbatch")
      try {
        batch.coalesce(4).write.mode("overwrite").csv(out.toString)
        val csv = out.toFile.listFiles()
          .filter(f => f.isFile && f.getName.startsWith("part-"))
          .sortBy(_.getName)
          .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
          .mkString
        copyIn(stg, cols, csv)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(out)
        val all = try walk.iterator().asScala.toSeq finally walk.close()
        all.reverseIterator.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      assert(d.preMergeSql(stg, cols, Seq("event_id")).isEmpty,
        "PG dedups inline via DISTINCT ON — no pre-merge statements")
      sql(d.mergeSql("events_wh", stg, cols, Seq("event_id")))
      d.dropSql(stg).foreach(s => sql(s): Unit)
    }
    val pgSecs = (System.nanoTime() - t0) / 1e9
    assert(batches == 2, s"expected 2 one-file micro-batches, got $batches")
    info(f"live-PG stream→warehouse loop ($dir): $pgSecs%.2f s")

    // Effectively-once: batch b replayed every key of batch a, so the
    // warehouse must hold exactly the full merged event set — st6's
    // oracle — with no duplicates and no drops. Row-exact comparison
    // (stronger than the driver's hash check).
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .orderBy(col("event_id"))
      .collect()
      .map(r => s"${r.getLong(0)},${r.getString(1)},${r.getLong(2)},${r.getLong(3)}")
    val got = copyOut(
      """SELECT "event_id", "event_type", "user_id", "cents"
        | FROM events_wh ORDER BY "event_id"""".stripMargin)
      .linesIterator.toArray
    assert(got.length == expected.length,
      s"row count: pg=${got.length} oracle=${expected.length}")
    // build the divergence message only on an actual mismatch (the
    // assert-with-clue form evaluates its clue eagerly, and got(-1) on
    // the all-equal case would turn a pass into an exception)
    if (!got.sameElements(expected)) {
      val i = got.zip(expected).indexWhere { case (a, b) => a != b }
      fail(s"first divergence at row $i: pg=${got(i)} oracle=${expected(i)}")
    }

    if (sys.env.get("GRAFT_PG_AB").contains("1")) {
      val t1 = System.nanoTime()
      val rows = EventStream.streamToJdbc(spark, dir).count()
      val derbySecs = (System.nanoTime() - t1) / 1e9
      info(f"embedded-Derby st12 loop ($dir, $rows rows): $derbySecs%.2f s")
    }
  }
}
