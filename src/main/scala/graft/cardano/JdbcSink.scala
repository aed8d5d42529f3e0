package graft.cardano

import java.sql.Connection
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Executed JDBC staging+merge — the reference's custom sink
  * (`cardano_block_dao.py:93-148`: temp-table COPY + `INSERT … ON
  * CONFLICT (pk) DO NOTHING` in one transaction) run against a LIVE
  * database, not just emitted as SQL.
  *
  * Flow per batch:
  *  1. driver creates a regular, uniquely-named staging table cloned from
  *     the target's shape. Regular — NOT `CREATE TEMPORARY` — because
  *     temp tables are session-local and the distributed load in step 2
  *     arrives over EXECUTOR connections, which would each see their own
  *     empty temp table.
  *  2. `df.write.jdbc` appends into the staging table — the distributed
  *     analogue of the reference's single-connection COPY; Spark task
  *     retries can at worst double-write into STAGING.
  *  3. one driver transaction merges staging into the target with the
  *     dialect's conflict-skip statement and commits; the deterministic
  *     sha2 PKs (see [[Transforms.surrogateId]]) make replayed rows
  *     no-ops, so the whole batch is idempotent end-to-end.
  *  4. staging is dropped (after commit — never `ON COMMIT DROP`, see 1).
  *
  * Multi-table FK-ordered loads (the five UTXO tables,
  * `s3_to_db_cardano_tx_utxo_pipeline.py:142-209`) stage each table first
  * (step 1-2 per table), then run ALL merges inside ONE driver
  * transaction in parent-before-child order ([[upsertAllJdbc]]) so a
  * failure can never commit a child row without its parent.
  */
object JdbcSink {

  /** Conflict-skip merge dialect. Implementations must be pure SQL
    * generation — execution stays in [[JdbcSink]].
    */
  trait Dialect {
    def quote(id: String): String = "\"" + id + "\""
    /** DDL cloning the target's column shape into `staging`. */
    def createStagingSql(target: String, staging: String): String
    /** Statements run inside the merge transaction BEFORE the merge —
      * e.g. deduping rows a retried-and-recommitted executor transaction
      * double-staged, for dialects whose merge can't dedup inline.
      */
    def preMergeSql(staging: String, columns: Seq[String], keys: Seq[String]): Seq[String] = Nil
    /** Single-statement merge: insert rows whose key is absent. */
    def mergeSql(target: String, staging: String, columns: Seq[String], keys: Seq[String]): String
    /** Cleanup statements — MUST tolerate the merge having failed. */
    def dropSql(staging: String): Seq[String] = Seq(s"DROP TABLE $staging")
    /** One-time Spark-side setup (e.g. JdbcDialect registration). */
    def prepare(): Unit = ()
  }

  /** Apache Derby (embedded — on the Spark classpath): `MERGE INTO … WHEN
    * NOT MATCHED THEN INSERT` (Derby ≥ 10.11).
    */
  object DerbyDialect extends Dialect {
    /** Spark's built-in Derby mapping writes StringType as CLOB, which
      * makes `setNull(CLOB)` fail against VARCHAR staging columns.
      * Prepend a dialect mapping strings to VARCHAR (everything else
      * falls through to the built-in via the aggregated dialect).
      */
    private object VarcharOverride extends org.apache.spark.sql.jdbc.JdbcDialect {
      override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
      override def getJDBCType(dt: org.apache.spark.sql.types.DataType)
          : Option[org.apache.spark.sql.jdbc.JdbcType] = dt match {
        case org.apache.spark.sql.types.StringType =>
          Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(32672)", java.sql.Types.VARCHAR))
        case _ => None
      }
    }
    private lazy val registered: Unit =
      org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(VarcharOverride)
    override def prepare(): Unit = registered

    override def createStagingSql(target: String, staging: String): String =
      // AS SELECT … WITH NO DATA clones column names/types (not constraints).
      s"CREATE TABLE $staging AS SELECT * FROM $target WITH NO DATA"

    /** Derby's MERGE source must be a base table and two double-staged
      * rows with the same key would both be NOT MATCHED → PK violation,
      * so dedup into a clone first. The clone carries an identity
      * discriminator and keeps exactly ONE real staged row per key (the
      * lowest-rid one) — per-key, not full-row, because a retried
      * executor can stage same-key rows with different payloads (shuffle
      * pick order is attempt-dependent) and those must not re-fail the
      * whole FK transaction forever.
      */
    override def preMergeSql(staging: String, columns: Seq[String],
        keys: Seq[String]): Seq[String] = {
      val keyEq = keys.map(k => s"s.${quote(k)} = t.${quote(k)}").mkString(" AND ")
      val cols = columns.map(quote).mkString(", ")
      Seq(
        s"CREATE TABLE ${staging}_d AS SELECT * FROM $staging WITH NO DATA",
        // BIGINT: a single staged batch can exceed 2^31-1 rows at the
        // 100 TB design point; an INT identity would overflow mid-load.
        s"""ALTER TABLE ${staging}_d ADD COLUMN "_rid" BIGINT GENERATED ALWAYS AS IDENTITY""",
        s"INSERT INTO ${staging}_d ($cols) SELECT $cols FROM $staging",
        // Without this index the dedup DELETE's correlated EXISTS is a
        // nested-loop SELF-SCAN of the clone — O(n²), observed as a hang
        // at a 100k-row staged batch (st12 at sf0.1); the (keys, _rid)
        // composite turns each probe into an index lookup.
        s"""CREATE INDEX ${staging}_dk ON ${staging}_d
           | (${(keys.map(quote) :+ "\"_rid\"").mkString(", ")})""".stripMargin,
        s"""DELETE FROM ${staging}_d t WHERE EXISTS
           | (SELECT 1 FROM ${staging}_d s WHERE $keyEq AND s."_rid" < t."_rid")""".stripMargin)
    }
    override def mergeSql(target: String, staging: String,
        columns: Seq[String], keys: Seq[String]): String = {
      val on = keys.map(k => s"t.${quote(k)} = s.${quote(k)}").mkString(" AND ")
      val cols = columns.map(quote).mkString(", ")
      val vals = columns.map(c => s"s.${quote(c)}").mkString(", ")
      s"MERGE INTO $target t USING ${staging}_d s ON $on " +
        s"WHEN NOT MATCHED THEN INSERT ($cols) VALUES ($vals)"
    }
    override def dropSql(staging: String): Seq[String] =
      Seq(s"DROP TABLE $staging", s"DROP TABLE ${staging}_d")
  }

  /** PostgreSQL: `INSERT … SELECT DISTINCT ON (pk) … ON CONFLICT DO
    * NOTHING` (the reference's statement, `cardano_block_dao.py:140-148`).
    * DISTINCT ON dedups within the staged batch itself (Spark task retries
    * may have double-written staging); ON CONFLICT skips rows already in
    * the target.
    */
  object PostgresDialect extends Dialect {
    override def createStagingSql(target: String, staging: String): String =
      s"CREATE UNLOGGED TABLE $staging (LIKE $target INCLUDING DEFAULTS)"
    override def mergeSql(target: String, staging: String,
        columns: Seq[String], keys: Seq[String]): String = {
      val cols = columns.map(quote).mkString(", ")
      val pk = keys.map(quote).mkString(", ")
      s"INSERT INTO $target ($cols) " +
        s"SELECT DISTINCT ON ($pk) $cols FROM $staging " +
        s"ON CONFLICT ($pk) DO NOTHING"
    }

    /** The full CDC MERGE on the live engine — the reference's
      * conflict-SKIP loader (`cardano_block_dao.py:140-148`) generalized
      * to `ON CONFLICT DO UPDATE` with q57/st16's last-writer-wins
      * guard. The staged batch carries change rows
      * (`key`, `seq`, `op` ∈ {'U','D'}, `newVal`); the statement:
      *
      *   - collapses the batch to its latest change per key with
      *     `DISTINCT ON` ordered by the FULL (seq, op, newVal) struct
      *     DESC — the same lexicographic max
      *     [[graft.streaming.EventStream.cdcApplyBatch]] takes, so
      *     batch boundaries cannot change the outcome;
      *   - upserts it, guarded by a ROW comparison
      *     `(EXCLUDED.seq, op, val) > (t.seq, op, val)` — stale and
      *     replayed changes apply NOTHING (semantic idempotency, not
      *     file dedup), and a tombstone's struct keeps winning until a
      *     genuinely newer change arrives;
      *   - keeps deletes as tombstone rows (op='D' with its seq) so a
      *     late stale update cannot resurrect the key; readers filter
      *     `op <> 'D'`, and [[cdcTombstoneGcSql]] is the age-based GC a
      *     deployment schedules (run at quiesce in the spec, where it
      *     makes the warehouse state equal q57's batch apply exactly).
      *
      * Text comparison on `op` ('U' > 'D') agrees between Spark's UTF8
      * binary order and PG's collation here because both operands are
      * single ASCII uppercase letters.
      *
      * NON-NULL CONTRACT: `seq`, `op`, `newVal` AND every `carry`
      * column must be NOT NULL in every staged change row — AND in
      * every EXISTING TARGET row (legacy rows predating a carry
      * column, or rows written by an external loader). The cross-batch
      * guard compares carry legs on BOTH sides, so a NULL in a target
      * carry makes the row comparison evaluate NULL on a full
      * (seq, op, newVal) tie and the update silently skips — a target-
      * side failure mode the staged-row half of the contract alone
      * cannot rule out; declare target carry columns NOT NULL (the
      * recommended schema posture) or backfill before enabling carry.
      * Staged-side, a NULL in any compared column likewise makes the
      * guard evaluate NULL (the update silently skips), and
      * `DISTINCT ON ... DESC` orders NULL first (largest) while
      * [[graft.streaming.EventStream.cdcApplyBatch]]'s
      * `max(struct(...))` treats null as smallest — the two engines
      * would pick DIFFERENT winners for the same batch. The generated
      * staging DDL cannot enforce this (it clones the target's shape),
      * so callers with nullable change feeds must coalesce before
      * staging.
      */
    def cdcUpsertSql(target: String, staging: String,
        key: String = "key", seq: String = "seq", op: String = "op",
        newVal: String = "new_cents", valCol: String = "cents",
        carry: Seq[String] = Nil): String = {
      val (k, s, o, nv, v) = (quote(key), quote(seq), quote(op), quote(newVal), quote(valCol))
      // carry: payload columns beyond the compared value (FK references,
      // attributes) — copied from the per-key WINNING change row on
      // insert and update
      val cq = carry.map(quote)
      val cIns = cq.map(c => s", $c").mkString
      val cSet = cq.map(c => s", $c = EXCLUDED.$c").mkString
      // carry columns join the DISTINCT ON ordering (after the compared
      // triple) AND the cross-batch row-comparison guard, so two staged
      // rows tying on (seq, op, newVal) with different carry values pick
      // the same deterministic winner (lexicographic max over the full
      // tuple) no matter how the feed is split into batches — without
      // the guard leg, the first-arrived carry would stick cross-batch
      // while the max carry wins within a batch. This makes ORDERABILITY
      // part of the carry contract: every carry column's PG type must
      // have an ordering operator (varchar/numeric/bool/timestamp etc. —
      // a raw `json` column would need a ::jsonb or ::text cast
      // staging-side before it can ride along)
      val cOrd = cq.map(c => s", $c DESC").mkString
      val cExc = cq.map(c => s", EXCLUDED.$c").mkString
      val cTgt = cq.map(c => s", t.$c").mkString
      s"""INSERT INTO $target AS t ($k, $v, $s, $o$cIns)
         |SELECT DISTINCT ON ($k) $k, $nv, $s, $o$cIns FROM $staging
         |ORDER BY $k, $s DESC, $o DESC, $nv DESC$cOrd
         |ON CONFLICT ($k) DO UPDATE
         |SET $v = EXCLUDED.$v, $s = EXCLUDED.$s, $o = EXCLUDED.$o$cSet
         |WHERE (EXCLUDED.$s, EXCLUDED.$o, EXCLUDED.$v$cExc) > (t.$s, t.$o, t.$v$cTgt)""".stripMargin
    }

    /** Tombstone GC: the real `DELETE` leg of the CDC story. Safe only
      * once no in-flight change can be older than the tombstones (age-
      * based in a deployment; end-of-stream in the spec) — deleting a
      * live tombstone would let a stale late update resurrect the key.
      */
    def cdcTombstoneGcSql(target: String, op: String = "op"): String =
      s"DELETE FROM $target WHERE ${quote(op)} = 'D'"
  }

  final case class Staged(table: String, staging: String, columns: Seq[String], keys: Seq[String])

  private def withConnection[T](url: String, props: Properties)(f: Connection => T): T = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def exec(conn: Connection, sql: String): Int = {
    val st = conn.createStatement()
    try st.executeUpdate(sql) finally st.close()
  }

  /** Steps 1-2: create the staging clone and distribute-load it. Staging
    * names embed a random suffix so concurrent batches never collide.
    * Within-batch PK dedup happens Spark-side (one shuffle on the keys —
    * the same partitioning the JDBC write wants anyway); Postgres
    * additionally dedups at merge time (`DISTINCT ON`) against rows a
    * retried-and-recommitted executor transaction may have double-staged.
    */
  def stage(df: DataFrame, url: String, props: Properties, table: String,
      keys: Seq[String], dialect: Dialect): Staged = {
    dialect.prepare()
    val staging = s"stg_${table}_${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
    withConnection(url, props)(exec(_, dialect.createStagingSql(table, staging)))
    val s = Staged(table, staging, df.columns.toSeq, keys)
    try df.dropDuplicates(keys).write.mode(SaveMode.Append).jdbc(url, staging, props)
    catch {
      // The bulk load is the long-running phase where failures are most
      // likely — drop the just-created staging table rather than leak it.
      case t: Throwable => dropStaging(url, props, Seq(s), dialect); throw t
    }
    s
  }

  /** Steps 3-4 for several staged tables in FK order: ONE transaction for
    * all merges, then drop the stagings. Staging cleanup runs in a
    * finally (best-effort per table) so a failed/rolled-back merge never
    * leaks the uniquely-named staging tables — in a deployment with
    * retried batches they would otherwise accumulate unboundedly, each
    * holding a full batch copy. Returns rows inserted per table.
    */
  def mergeAll(url: String, props: Properties, staged: Seq[Staged],
      dialect: Dialect): Map[String, Int] =
    try {
      withConnection(url, props) { conn =>
        conn.setAutoCommit(false)
        try {
          val counts = staged.map { s =>
            dialect.preMergeSql(s.staging, s.columns, s.keys).foreach(exec(conn, _))
            s.table -> exec(conn, dialect.mergeSql(s.table, s.staging, s.columns, s.keys))
          }
          conn.commit()
          counts.toMap
        } catch {
          case t: Throwable => conn.rollback(); throw t
        }
      }
    } finally {
      dropStaging(url, props, staged, dialect)
    }

  /** Best-effort staging cleanup — tolerates partially-created state
    * (e.g. a pre-merge clone that never materialized).
    */
  def dropStaging(url: String, props: Properties, staged: Seq[Staged],
      dialect: Dialect): Unit =
    try withConnection(url, props) { c =>
      for (s <- staged; sql <- dialect.dropSql(s.staging))
        try exec(c, sql) catch {
          case e: java.sql.SQLException =>
            // A pre-merge clone that never materialized is expected here
            // (rolled-back DDL) and surfaces as a missing-object state:
            // Derby 42X05 (table does not exist) / 42Y55 (drop of
            // non-existent object), Postgres 42P01 (undefined_table),
            // ODBC-style 42S02 (base table not found — H2/MySQL/SQL
            // Server). Everything else — including other 42-class states
            // like 42501 insufficient_privilege — is a REAL failed drop
            // that leaks a full batch copy and must be visible.
            val missingObject =
              Set("42X05", "42Y55", "42P01", "42S02").contains(String.valueOf(e.getSQLState))
            if (!missingObject)
              System.err.println(s"[JdbcSink] WARN: drop of ${s.staging} failed: $e")
        }
    } catch {
      case e: java.sql.SQLException =>
        System.err.println(s"[JdbcSink] WARN: staging cleanup connection failed: $e")
    }

  /** Single-table convenience: stage + merge + drop. */
  def upsertJdbc(df: DataFrame, url: String, table: String, keys: Seq[String],
      dialect: Dialect = DerbyDialect, props: Properties = new Properties): Int =
    mergeAll(url, props, Seq(stage(df, url, props, table, keys, dialect)), dialect)(table)

  /** FK-ordered multi-table load: stage every frame, then merge all in
    * the given (parent-first) order inside one transaction.
    */
  def upsertAllJdbc(frames: Seq[(DataFrame, String, Seq[String])], url: String,
      dialect: Dialect = DerbyDialect, props: Properties = new Properties): Map[String, Int] = {
    // If staging frame N fails, frames 1..N-1 are already loaded — drop
    // them before rethrowing (stage() cleans its own table).
    val staged = scala.collection.mutable.Buffer.empty[Staged]
    try frames.foreach { case (df, table, keys) =>
      staged += stage(df, url, props, table, keys, dialect)
    } catch {
      case t: Throwable => dropStaging(url, props, staged.toSeq, dialect); throw t
    }
    mergeAll(url, props, staged.toSeq, dialect)
  }
}
