package graft.cardano

import java.nio.file.{Files, Path}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[JdbcSink.PostgresDialect]] executed against a LIVE PostgreSQL — the
  * dialect the reference actually targets (`cardano_block_dao.py:140-148`:
  * `INSERT … ON CONFLICT DO NOTHING`). A scratch server (initdb + unix
  * socket, trust auth) runs for the suite; every statement under test is
  * taken VERBATIM from the dialect (`createStagingSql` / `mergeSql` /
  * `dropSql`), not re-typed, so a drift in the generated SQL fails here.
  *
  * Statements travel over psql rather than JDBC: the sandbox has no
  * pgjdbc jar (zero egress), and the distributed `df.write.jdbc`
  * staging-load path is dialect-independent — proven on live Derby in
  * [[JdbcSinkSpec]]. What Derby CANNOT prove is exactly this dialect's
  * merge semantics (`DISTINCT ON` batch dedup + `ON CONFLICT DO NOTHING`
  * conflict skip + `UNLOGGED … LIKE` staging DDL), which is what runs
  * here. Tests cancel (not fail) when the host lacks a Postgres install.
  */
class PostgresDialectSpec extends AnyFunSuite with BeforeAndAfterAll {

  // Binaries may be split across prefixes (server under /usr/local,
  // client under /usr) — locate each independently.
  private def findBin(name: String): Option[String] =
    Seq("/usr/local/bin", "/usr/bin", "/usr/lib/postgresql/15/bin")
      .map(d => Path.of(d, name)).find(Files.isExecutable).map(_.toString)
  private val initdbBin = findBin("initdb")
  private val pgCtlBin = findBin("pg_ctl")
  private val psqlBin = findBin("psql")
  private val canRunUser =
    Files.isExecutable(Path.of("/usr/sbin/runuser")) &&
      (try { new com.sun.security.auth.module.UnixSystem().getUid == 0 }
       catch { case _: Throwable => false })
  private val haveBins = Seq(initdbBin, pgCtlBin, psqlBin).forall(_.isDefined)
  private def available: Boolean = haveBins && canRunUser && started

  private val port = 54000 + (ProcessHandle.current().pid() % 1000).toInt
  private var root: Path = _
  private var started = false

  /** Run a command, return (exitCode, stdout+stderr). */
  private def run(cmd: Seq[String], stdin: String = ""): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    if (root != null) pb.directory(root.toFile) // cwd readable by postgres
    val p = pb.start()
    p.getOutputStream.write(stdin.getBytes("UTF-8"))
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def asPostgres(cmd: String*): (Int, String) =
    run(Seq("/usr/sbin/runuser", "-u", "postgres", "--") ++ cmd)

  /** Execute one SQL script in the scratch server; returns psql output
    * (command tags like `INSERT 0 2`). Fails the test on SQL errors
    * unless `expectFailure`.
    */
  private def sql(script: String, expectFailure: Boolean = false): String = {
    val (code, out) = run(
      Seq(psqlBin.get, "-h", root.toString, "-p", port.toString,
        "-U", "postgres", "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-At", "-f", "-"),
      stdin = script)
    if (expectFailure) assert(code != 0, s"expected SQL failure, got:\n$out")
    else assert(code == 0, s"psql failed:\n$out")
    out
  }

  private def scalar(q: String): String = sql(q).trim

  override def beforeAll(): Unit = {
    if (!haveBins || !canRunUser) return
    root = Files.createTempDirectory("graftpg")
    // postgres (non-root) must create the socket and data dir in here
    root.toFile.setReadable(true, false)
    root.toFile.setWritable(true, false)
    root.toFile.setExecutable(true, false)
    val (c1, o1) = asPostgres(initdbBin.get, "-D", s"$root/data", "-A", "trust", "-U", "postgres")
    if (c1 != 0) { info(s"initdb failed, cancelling suite: $o1"); return }
    val (c2, o2) = asPostgres(pgCtlBin.get, "-D", s"$root/data", "-w",
      "-o", s"-k $root -p $port -c listen_addresses=''", "-l", s"$root/log", "start")
    if (c2 != 0) { info(s"pg_ctl start failed, cancelling suite: $o2"); return }
    started = true
  }

  override def afterAll(): Unit = {
    if (started)
      asPostgres(pgCtlBin.get, "-D", s"$root/data", "stop", "-m", "immediate"): Unit
    if (root != null) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(root)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverseIterator.foreach(p => Files.deleteIfExists(p))
    }
  }

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
