package graft.streaming

import org.apache.spark.sql.functions._

import graft.cardano.{JdbcSink, ScratchPostgres}

/** st16's CDC loop applied through LIVE PostgreSQL 15 — the last leg of
  * the warehouse story: the live-PG path so far exercised only the
  * reference's `ON CONFLICT DO NOTHING` (K3); this suite drives q57's
  * FULL MERGE semantics (insert / update / delete) through the dialect's
  * `INSERT … ON CONFLICT DO UPDATE` with the last-writer-wins ROW guard
  * plus the tombstone-GC `DELETE`, and row-compares the final warehouse
  * state against q57's batch apply computed in Spark over the same
  * base + feed.
  *
  * The stream side is the IDENTICAL checkpointed driver st16 uses
  * ([[EventStream.runForeachBatchStream]] over
  * [[EventStream.stagedCdcFeedSource]] — early changes, then a full
  * replay plus the rest); only the state store differs: a live PG table
  * instead of the bucketed parquet snapshot. Batch b replays every
  * change of batch a, so the seq guard — not file dedup — is what keeps
  * the state exact, the same semantic-idempotency claim st16 pins on
  * parquet, now proven on the engine the reference actually deploys on.
  * Transport is COPY/psql as in PostgresStreamLoopSpec (no pgjdbc jar in
  * the sandbox). Cancels when the host has no Postgres install.
  */
class PostgresCdcSpec extends ScratchPostgres {

  private lazy val spark = graft.SparkSpec.session

  test("checkpointed CDC stream lands q57's merge semantics in live Postgres") {
    assume(available, "no usable PostgreSQL install on this host")
    val dir = sys.env.getOrElse("GRAFT_PG_SF_DIR", "/root/testdata/sf0.001")
    val (src, schema) = EventStream.stagedCdcFeedSource(spark, dir)
    sql("""CREATE TABLE orders_cdc (
          |  "key" BIGINT PRIMARY KEY, "cents" BIGINT,
          |  "seq" BIGINT, "op" VARCHAR(1))""".stripMargin)
    // initial snapshot: the base table as seq-0 upserts (st16's load)
    val baseCsv = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => s"${r.getLong(0)},${r.getLong(1)},0,U").mkString("\n")
    copyIn("orders_cdc", Seq("key", "cents", "seq", "op"), baseCsv)

    val d = JdbcSink.PostgresDialect
    var batches = 0
    EventStream.runForeachBatchStream(spark, src, schema) { batch =>
      batches += 1
      val stg = s"stg_cdc_b$batches"
      sql(s"""CREATE UNLOGGED TABLE $stg (
             |  "key" BIGINT, "seq" BIGINT, "op" VARCHAR(1), "new_cents" BIGINT)""".stripMargin)
      val csv = batch
        .select(col("key"), col("seq"), col("op"), col("new_cents"))
        .collect()
        .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getString(2)},${r.getLong(3)}")
        .mkString("\n")
      copyIn(stg, Seq("key", "seq", "op", "new_cents"), csv)
      sql(d.cdcUpsertSql("orders_cdc", stg))
      sql(s"DROP TABLE $stg")
    }
    assert(batches == 2, s"expected 2 one-file micro-batches, got $batches")

    // quiesced: tombstone GC — the real DELETE leg. After it, the
    // warehouse state must equal q57's one-shot batch apply exactly.
    val gcTag = sql(d.cdcTombstoneGcSql("orders_cdc"))
    assert(gcTag.contains("DELETE"), s"tombstone GC returned: $gcTag")

    val expected = graft.queries.Relational.q57CdcApply(spark, dir)
      .select(col("o_orderkey"), col("cents"))
      .collect().map(r => s"${r.getLong(0)},${r.getLong(1)}")
    val got = copyOut(
      """SELECT "key", "cents" FROM orders_cdc ORDER BY "key"""")
      .linesIterator.toArray
    assert(got.length == expected.length,
      s"row count: pg=${got.length} oracle=${expected.length}")
    if (!got.sameElements(expected)) {
      val i = got.zip(expected).indexWhere { case (a, b) => a != b }
      fail(s"first divergence at row $i: pg=${got(i)} oracle=${expected(i)}")
    }

    // replay robustness on the live engine: re-applying the ENTIRE feed
    // as one stale batch after GC must change nothing — every change
    // compares <= the stored struct (or hits a GC'd key whose re-insert
    // is a tombstone), so the live state stays q57's apply
    sql("""CREATE UNLOGGED TABLE stg_cdc_replay (
          |  "key" BIGINT, "seq" BIGINT, "op" VARCHAR(1), "new_cents" BIGINT)""".stripMargin)
    val allCsv = spark.read.parquet(src)
      .select(col("key"), col("seq"), col("op"), col("new_cents"))
      .collect()
      .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getString(2)},${r.getLong(3)}")
      .mkString("\n")
    copyIn("stg_cdc_replay", Seq("key", "seq", "op", "new_cents"), allCsv)
    sql(d.cdcUpsertSql("orders_cdc", "stg_cdc_replay"))
    sql(d.cdcTombstoneGcSql("orders_cdc"))
    sql("DROP TABLE stg_cdc_replay")
    val replayed = copyOut(
      """SELECT "key", "cents" FROM orders_cdc ORDER BY "key"""")
      .linesIterator.toArray
    assert(replayed.sameElements(expected), "full-feed replay moved the state")
  }
}
