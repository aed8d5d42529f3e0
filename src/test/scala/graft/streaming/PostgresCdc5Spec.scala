package graft.streaming

import graft.cardano.{JdbcSink, ScratchPostgres}

/** The reference's five-table FK-ordered UTXO load
  * (`s3_to_db_cardano_tx_utxo_pipeline.py:142-209` — tx_utxo,
  * input, input_amt, output, output_amt loaded inside ONE
  * `engine.begin()` transaction) PLUS the sixth warehouse entity
  * (cardano_tx_output_amount — declared at cardano_tables.py:101-119,
  * populated here; it keys off the same tx hash as tx_utxo), upgraded
  * to FULL CDC semantics: insert / update / delete flow through every
  * table of the family, each batch's merges run parent-before-child INSIDE ONE
  * transaction (the [[JdbcSink.upsertAllJdbc]] discipline, here over
  * psql transport since the sandbox has no pgjdbc jar), against REAL
  * `FOREIGN KEY` constraints so the ordering claim is enforced by the
  * engine, not asserted by the test. Deletes arrive as tombstones per
  * table (a parent delete ships with its children's deletes — the
  * UTXO family's cascade semantics); the tombstone GC at quiesce runs
  * CHILD-FIRST, the reverse order, or the engine rejects it — both
  * directions are proven (the wrong merge order must FAIL, the right
  * one must commit).
  *
  * Final state per table is row-compared against an in-memory
  * last-writer-wins fold (max (seq, op, val) struct per key, then
  * tombstones dropped) — `cdcApplyBatch`'s contract, applied
  * family-wide. A full-feed stale replay after GC must change nothing
  * (semantic idempotency on the live engine, the PostgresCdcSpec
  * claim extended to the FK family).
  */
class PostgresCdc5Spec extends ScratchPostgres {

  /** (table, key column, parent table) in parent-first order — the
    * merge order; GC runs the reverse. The child's `ref` column
    * references the parent's key column.
    */
  private val family: Seq[(String, String, Option[String])] = Seq(
    ("cdc_utxo", "hash", None),
    ("cdc_input", "id", Some("cdc_utxo")),
    ("cdc_input_amt", "id", Some("cdc_input")),
    ("cdc_output", "id", Some("cdc_utxo")),
    ("cdc_output_amt", "id", Some("cdc_output")),
    // the SIXTH warehouse entity: cardano_tx_output_amount — keyed off
    // the same transaction hash as cardano_tx_utxo (both are children
    // of the transaction), so the family root stands in as its FK
    // parent here, adding a third child branch to the ordering proof
    ("cdc_tx_out_amt", "id", Some("cdc_utxo")))

  private case class Chg(table: String, key: String, seq: Long, op: String,
      cents: Long, ref: String)

  /** Batch 1: the whole family inserted (parents u1..u6, one child of
    * each kind per parent). Batch 2: REPLAYS batch 1 in full (the
    * overlap every CDC maintainer here proves itself against), then
    * updates one row in each table (u2, i3, a4, o5, b5), deletes the
    * u6-rooted subtree across all five tables, and inserts a NEW child
    * chain (i7 under u1, a7 under i7) whose parents must merge first.
    */
  private val batch1: Seq[Chg] = (1 to 6).flatMap { i =>
    Seq(
      Chg("cdc_utxo", s"u$i", 1, "U", 100L * i, ""),
      Chg("cdc_input", s"i$i", 1, "U", 10L * i, s"u$i"),
      Chg("cdc_input_amt", s"a$i", 1, "U", i.toLong, s"i$i"),
      Chg("cdc_output", s"o$i", 1, "U", 20L * i, s"u$i"),
      Chg("cdc_output_amt", s"b$i", 1, "U", 2L * i, s"o$i"),
      Chg("cdc_tx_out_amt", s"t$i", 1, "U", 3L * i, s"u$i"))
  }
  private val batch2: Seq[Chg] = batch1 ++ Seq(
    Chg("cdc_utxo", "u2", 2, "U", 201, ""),
    Chg("cdc_input", "i3", 2, "U", 31, "u3"),
    Chg("cdc_input_amt", "a4", 2, "U", 41, "i4"),
    Chg("cdc_output", "o5", 2, "U", 51, "u5"),
    Chg("cdc_output_amt", "b5", 2, "U", 52, "o5"),
    Chg("cdc_tx_out_amt", "t4", 2, "U", 43, "u4"),
    Chg("cdc_utxo", "u6", 2, "D", 600, ""),
    Chg("cdc_input", "i6", 2, "D", 60, "u6"),
    Chg("cdc_input_amt", "a6", 2, "D", 6, "i6"),
    Chg("cdc_output", "o6", 2, "D", 120, "u6"),
    Chg("cdc_output_amt", "b6", 2, "D", 12, "o6"),
    Chg("cdc_tx_out_amt", "t6", 2, "D", 18, "u6"),
    Chg("cdc_input", "i7", 2, "U", 70, "u1"),
    Chg("cdc_input_amt", "a7", 2, "U", 7, "i7"))

  /** cdcApplyBatch's contract in memory: per key keep the max
    * (seq, op, cents) struct across the whole feed, then drop
    * tombstones — what the live tables must equal after GC.
    */
  private def expected(table: String): Seq[(String, Long)] =
    (batch1 ++ batch2).filter(_.table == table)
      .groupBy(_.key)
      .map { case (k, chgs) => k -> chgs.map(c => (c.seq, c.op, c.cents)).max }
      .collect { case (k, (_, "U", cents)) => k -> cents }
      .toSeq.sortBy(_._1)

  private def applyBatch(chgs: Seq[Chg], tag: String): Unit = {
    val d = JdbcSink.PostgresDialect
    // stage each table's slice (COPY — the reference's transport), then
    // ONE transaction merges all five parent-first
    // the staging key column carries the TARGET's key name — the merge
    // statement addresses both sides with one identifier
    for ((t, key, _) <- family) {
      sql(s"""CREATE UNLOGGED TABLE stg_${t}_$tag (
             |  "$key" VARCHAR(8), "seq" BIGINT, "op" VARCHAR(1),
             |  "new_cents" BIGINT, "ref" VARCHAR(8))""".stripMargin)
      val csv = chgs.filter(_.table == t)
        .map(c => s"${c.key},${c.seq},${c.op},${c.cents},${c.ref}")
        .mkString("\n")
      if (csv.nonEmpty)
        copyIn(s"stg_${t}_$tag", Seq(key, "seq", "op", "new_cents", "ref"), csv)
    }
    val merges = family.map { case (t, key, _) =>
      d.cdcUpsertSql(t, s"stg_${t}_$tag", key = key, carry = Seq("ref")) }
    sql((Seq("BEGIN;") ++ merges.map(_ + ";") ++ Seq("COMMIT;")).mkString("\n"))
    for ((t, _, _) <- family) sql(s"DROP TABLE stg_${t}_$tag")
  }

  test("six-table FK-ordered CDC: one transaction per batch, child-first GC, replay-stable") {
    assume(available, "no usable PostgreSQL install on this host")
    val d = JdbcSink.PostgresDialect
    // real FK constraints — the ordering claims are engine-enforced.
    // The key column is named per the family (hash/id); cdcUpsertSql
    // takes it as a parameter, value column stays `cents`.
    for ((t, key, parent) <- family) {
      val fk = parent.fold("") { pt =>
        val pkey = family.find(_._1 == pt).get._2
        s""", FOREIGN KEY ("ref") REFERENCES $pt ("$pkey")""" }
      sql(s"""CREATE TABLE $t (
             |  "$key" VARCHAR(8) PRIMARY KEY, "cents" BIGINT,
             |  "seq" BIGINT, "op" VARCHAR(1), "ref" VARCHAR(8)$fk)""".stripMargin)
    }

    // negative control: merging a child before its parent in the same
    // transaction must be REJECTED by the FK — the discipline is real
    sql("""CREATE UNLOGGED TABLE stg_neg (
          |  "id" VARCHAR(8), "seq" BIGINT, "op" VARCHAR(1),
          |  "new_cents" BIGINT, "ref" VARCHAR(8))""".stripMargin)
    copyIn("stg_neg", Seq("id", "seq", "op", "new_cents", "ref"), "i0,1,U,10,u0")
    sql(s"BEGIN;\n${d.cdcUpsertSql("cdc_input", "stg_neg", key = "id", carry = Seq("ref"))};\nCOMMIT;",
      expectFailure = true)
    sql("DROP TABLE stg_neg")

    applyBatch(batch1, "b1")
    applyBatch(batch2, "b2")

    // quiesced tombstone GC — CHILD-FIRST (reverse family order); the
    // parent-first direction must fail on the FK (u6's tombstone still
    // has live child tombstone rows referencing it)
    sql(s"BEGIN;\n${d.cdcTombstoneGcSql("cdc_utxo")};\nCOMMIT;", expectFailure = true)
    for ((t, _, _) <- family.reverse) sql(d.cdcTombstoneGcSql(t))

    def state(t: String, key: String): Seq[(String, Long)] =
      copyOut(s"""SELECT "$key", "cents" FROM $t ORDER BY "$key"""")
        .linesIterator.map { l =>
          val Array(k, c) = l.split(","); (k, c.toLong) }.toSeq
    for ((t, key, _) <- family)
      assert(state(t, key) == expected(t), s"$t diverged from the in-memory fold")

    // full-feed stale replay after GC: nothing may move (GC'd keys
    // re-insert as tombstones; GC again restores the exact state)
    applyBatch(batch1 ++ batch2, "rp")
    for ((t, _, _) <- family.reverse) sql(d.cdcTombstoneGcSql(t))
    for ((t, key, _) <- family)
      assert(state(t, key) == expected(t), s"$t moved under full-feed replay")

    // carry tie-break is BATCH-SPLIT INDEPENDENT: two changes tying on
    // the full (seq, op, newVal) triple but differing in carry must
    // settle on the max carry whether they arrive in one batch or split
    // across batches in either order — the carry columns ride both the
    // within-batch DISTINCT ON ordering and the cross-batch guard tuple.
    // i8 sees the larger carry FIRST (the later smaller one must skip),
    // i9 sees it LAST (the later larger one must win); both refs are
    // live parents so the FK is satisfied.
    applyBatch(Seq(Chg("cdc_input", "i8", 9, "U", 80, "u2")), "t1")
    applyBatch(Seq(Chg("cdc_input", "i8", 9, "U", 80, "u1"),
                   Chg("cdc_input", "i9", 9, "U", 90, "u1")), "t2")
    applyBatch(Seq(Chg("cdc_input", "i9", 9, "U", 90, "u2")), "t3")
    val refs = copyOut(
      """SELECT "id", "ref" FROM cdc_input WHERE "id" IN ('i8','i9') ORDER BY "id"""")
      .linesIterator.map(_.split(",")(1)).toSeq
    assert(refs == Seq("u2", "u2"),
      s"carry tie-break depends on batch split: $refs")
  }
}
