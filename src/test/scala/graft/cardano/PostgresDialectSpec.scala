package graft.cardano

/** [[JdbcSink.PostgresDialect]] executed against a LIVE PostgreSQL — the
  * dialect the reference actually targets (`cardano_block_dao.py:140-148`:
  * `INSERT … ON CONFLICT DO NOTHING`). A scratch server
  * ([[ScratchPostgres]]) runs for the suite; every statement under test
  * is taken VERBATIM from the dialect (`createStagingSql` / `mergeSql` /
  * `dropSql`), not re-typed, so a drift in the generated SQL fails here.
  *
  * The distributed `df.write.jdbc` staging-load path is
  * dialect-independent — proven on live Derby in [[JdbcSinkSpec]]. What
  * Derby CANNOT prove is exactly this dialect's merge semantics
  * (`DISTINCT ON` batch dedup + `ON CONFLICT DO NOTHING` conflict skip +
  * `UNLOGGED … LIKE` staging DDL), which is what runs here. Tests cancel
  * (not fail) when the host lacks a Postgres install.
  */
class PostgresDialectSpec extends ScratchPostgres {

  private val d = JdbcSink.PostgresDialect
  private def mergeTag(out: String): Int = {
    // last INSERT command tag: "INSERT 0 <n>"
    val tags = out.linesIterator.filter(_.startsWith("INSERT")).toSeq
    tags.last.split(' ').last.toInt
  }

  test("double-load through the generated staging+merge SQL is idempotent on live Postgres") {
    assume(available, "no usable PostgreSQL install on this host")
    sql("""CREATE TABLE cardano_blocks (
          |  "height" BIGINT PRIMARY KEY, "hash" VARCHAR(64) NOT NULL,
          |  "fees" NUMERIC(38,0))""".stripMargin)
    val cols = Seq("height", "hash", "fees")
    sql(d.createStagingSql("cardano_blocks", "stg_blocks"))
    assert(scalar(
      """SELECT relpersistence FROM pg_class WHERE relname = 'stg_blocks'""") == "u",
      "staging must be UNLOGGED (crash-disposable, skips WAL)")
    // Stage a batch that includes a double-staged key (retried executor
    // transaction): DISTINCT ON must collapse it to one candidate row.
    sql("""INSERT INTO stg_blocks VALUES
          | (1,'h1',17),(2,'h2',34),(3,'h3',0),(1,'h1-retry',18)""".stripMargin)
    assert(d.preMergeSql("stg_blocks", cols, Seq("height")).isEmpty,
      "PG dedups inline via DISTINCT ON — no pre-merge statements")
    val merge = d.mergeSql("cardano_blocks", "stg_blocks", cols, Seq("height"))
    assert(mergeTag(sql(merge)) == 3)
    assert(scalar("SELECT count(*) FROM cardano_blocks") == "3")
    // WITHIN a staged batch, DISTINCT ON (no ORDER BY) keeps an
    // UNSPECIFIED one of the duplicate rows — exactly one lands, but
    // which payload is not a contract (contrast Derby's preMergeSql,
    // which pins the lowest-_rid row).
    val kept = scalar("""SELECT "hash" FROM cardano_blocks WHERE "height" = 1""")
    assert(Set("h1", "h1-retry").contains(kept), kept)
    // The reference's double-load check: replaying the same staged batch
    // inserts zero (ON CONFLICT skips every row).
    assert(mergeTag(sql(merge)) == 0)
    assert(scalar("SELECT count(*) FROM cardano_blocks") == "3")
    // ACROSS batches first-write-wins IS deterministic (ON CONFLICT DO
    // NOTHING never touches committed rows): a later batch replaying the
    // key cannot change the stored payload.
    sql("TRUNCATE stg_blocks; INSERT INTO stg_blocks VALUES (1,'h1-batch2',99)")
    assert(mergeTag(sql(merge)) == 0)
    assert(scalar("""SELECT "hash" FROM cardano_blocks WHERE "height" = 1""") == kept)
    d.dropSql("stg_blocks").foreach(s => sql(s): Unit)
    assert(scalar("SELECT count(*) FROM pg_class WHERE relname = 'stg_blocks'") == "0")
  }

  test("text[] tx_hash merges through the verbatim dialect SQL (reference cardano_tables.py:56)") {
    assume(available, "no usable PostgreSQL install on this host")
    // The reference stores block→transactions as ARRAY(String) in
    // Postgres; the lake side carries it as native ArrayType
    // (Schemas.scala). This closes the executed-path gap: a real text[]
    // column through the SAME generated staging DDL + DISTINCT ON +
    // ON CONFLICT merge, array literals and all.
    sql("""CREATE TABLE cardano_block_transactions (
          |  "hash" VARCHAR(64) PRIMARY KEY,
          |  "tx_hash" TEXT[] NOT NULL)""".stripMargin)
    sql(d.createStagingSql("cardano_block_transactions", "stg_bt"))
    // LIKE-based staging DDL must inherit the ARRAY type exactly.
    assert(scalar(
      """SELECT format_type(atttypid, atttypmod) FROM pg_attribute
        | WHERE attrelid = 'stg_bt'::regclass AND attname = 'tx_hash'""".stripMargin)
      == "text[]")
    // One double-staged key with DIFFERENT array payloads: DISTINCT ON
    // must dedup on the PK with the array riding along untouched.
    sql("""INSERT INTO stg_bt VALUES
          | ('b1', ARRAY['t1','t2']),
          | ('b2', ARRAY[]::text[]),
          | ('b1', ARRAY['t1-retry'])""".stripMargin)
    val merge = d.mergeSql("cardano_block_transactions", "stg_bt",
      Seq("hash", "tx_hash"), Seq("hash"))
    assert(mergeTag(sql(merge)) == 2)
    // Element-exact round-trip: real array elements, not a stringified blob.
    val b1 = scalar(
      """SELECT array_to_string("tx_hash", '|') FROM cardano_block_transactions
        | WHERE "hash" = 'b1'""".stripMargin)
    assert(Set("t1|t2", "t1-retry").contains(b1), b1)
    assert(scalar(
      """SELECT cardinality("tx_hash") FROM cardano_block_transactions
        | WHERE "hash" = 'b2'""".stripMargin) == "0")
    // Replaying the staged batch inserts zero — idempotent with arrays too.
    assert(mergeTag(sql(merge)) == 0)
    assert(scalar("SELECT count(*) FROM cardano_block_transactions") == "2")
    d.dropSql("stg_bt").foreach(s => sql(s): Unit)
  }

  test("FK-ordered merges in one transaction roll back atomically on failure") {
    assume(available, "no usable PostgreSQL install on this host")
    sql("""CREATE TABLE t_parent ("id" BIGINT PRIMARY KEY);
          |CREATE TABLE t_child (
          |  "id" BIGINT PRIMARY KEY,
          |  "parent_id" BIGINT NOT NULL REFERENCES t_parent ("id"))""".stripMargin)
    sql(d.createStagingSql("t_parent", "stg_p"))
    sql(d.createStagingSql("t_child", "stg_c"))
    sql("""INSERT INTO stg_p VALUES (1),(2);
          |INSERT INTO stg_c VALUES (10,1),(11,9)""".stripMargin) // 9: missing parent
    val mp = d.mergeSql("t_parent", "stg_p", Seq("id"), Seq("id"))
    val mc = d.mergeSql("t_child", "stg_c", Seq("id", "parent_id"), Seq("id"))
    // Child row violates the FK → the whole transaction (parent merge
    // included) must roll back, mirroring JdbcSink.mergeAll's contract.
    sql(s"BEGIN;\n$mp;\n$mc;\nCOMMIT;", expectFailure = true)
    assert(scalar("SELECT count(*) FROM t_parent") == "0")
    assert(scalar("SELECT count(*) FROM t_child") == "0")
    // Drop the bad child row and replay the SAME transaction: both land.
    sql("""DELETE FROM stg_c WHERE "id" = 11""")
    sql(s"BEGIN;\n$mp;\n$mc;\nCOMMIT;")
    assert(scalar("SELECT count(*) FROM t_parent") == "2")
    assert(scalar("SELECT count(*) FROM t_child") == "1")
    (d.dropSql("stg_p") ++ d.dropSql("stg_c")).foreach(s => sql(s): Unit)
  }
}
