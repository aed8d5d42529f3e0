package graft.cardano

import java.nio.file.{Files, Path}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scratch LIVE PostgreSQL server for a suite: initdb + unix socket +
  * trust auth, started in beforeAll and destroyed in afterAll. Shared by
  * the dialect suite ([[PostgresDialectSpec]]) and the stream→warehouse
  * loop suite — both need the REAL engine, not an emulation, because the
  * statements under test (`DISTINCT ON`, `ON CONFLICT DO NOTHING`,
  * `UNLOGGED … LIKE`, `COPY`) are PostgreSQL semantics no embedded
  * stand-in reproduces.
  *
  * Statements travel over psql rather than JDBC: the sandbox has no
  * pgjdbc jar (zero egress). Suites mixing this in must guard each test
  * with `assume(available, …)` so hosts without a Postgres install
  * cancel rather than fail.
  */
trait ScratchPostgres extends AnyFunSuite with BeforeAndAfterAll {

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
  protected def available: Boolean = haveBins && canRunUser && started

  // Distinct suites in one JVM run sequentially (server lifetime is
  // per-suite), but give each a distinct port anyway via the class name
  // so an overlap can never alias.
  private val port =
    54000 + ((ProcessHandle.current().pid() + getClass.getName.hashCode.abs) % 1000).toInt
  private var root: Path = _
  private var started = false

  /** Run a command, return (exitCode, stdout+stderr). */
  protected def run(cmd: Seq[String], stdin: String = ""): (Int, String) = {
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
  protected def sql(script: String, expectFailure: Boolean = false): String = {
    val (code, out) = run(
      Seq(psqlBin.get, "-h", root.toString, "-p", port.toString,
        "-U", "postgres", "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-At", "-f", "-"),
      stdin = script)
    if (expectFailure) assert(code != 0, s"expected SQL failure, got:\n$out")
    else assert(code == 0, s"psql failed:\n$out")
    out
  }

  protected def scalar(q: String): String = sql(q).trim

  /** Bulk-load CSV text into `table` via a real `COPY … FROM STDIN` —
    * the reference's load path (`COPY` into staging,
    * `cardano_block_dao.py:93-148`), and the transport the stream loop
    * uses per micro-batch. Column order is the caller's contract.
    */
  protected def copyIn(table: String, columns: Seq[String], csv: String): Unit = {
    val cols = columns.map(c => "\"" + c + "\"").mkString(", ")
    val (code, out) = run(
      Seq(psqlBin.get, "-h", root.toString, "-p", port.toString,
        "-U", "postgres", "-d", "postgres", "-v", "ON_ERROR_STOP=1",
        "-c", s"COPY $table ($cols) FROM STDIN (FORMAT csv)"),
      stdin = csv)
    assert(code == 0, s"COPY into $table failed:\n$out")
  }

  /** `COPY (query) TO STDOUT (FORMAT csv)` — the read-back transport. */
  protected def copyOut(query: String): String = {
    val (code, out) = run(
      Seq(psqlBin.get, "-h", root.toString, "-p", port.toString,
        "-U", "postgres", "-d", "postgres", "-v", "ON_ERROR_STOP=1",
        "-c", s"COPY ($query) TO STDOUT (FORMAT csv)"))
    assert(code == 0, s"COPY OUT failed:\n$out")
    out
  }

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
}
