package graft.cardano

import java.util.Properties

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** K3 executed against a LIVE database: embedded Derby (on the Spark
  * classpath) plays the role of the reference's Postgres
  * (`integration_tests/src/dao/test_cardano_block_dao.py:48-67`). The
  * staging tables are loaded through `df.write.jdbc` (the distributed
  * path, same JVM here), the merges run in one driver transaction.
  *
  * Derby-specific notes: identifiers are quoted lowercase end-to-end
  * (Spark's JDBC writer quotes DataFrame column names); Derby's DECIMAL
  * caps at precision 31, so lovelace Decimal(38,0) columns are cast to
  * DECIMAL(31,0) for the JDBC target (Postgres NUMERIC(38,0) has no such
  * cap — the cast is test-target-only).
  */
class JdbcSinkSpec extends SparkSpec {

  private val props = {
    val p = new Properties
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def freshDb(name: String): String =
    s"jdbc:derby:memory:${name}_${System.nanoTime()};create=true"

  private def exec(url: String, sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try { c.createStatement().executeUpdate(sql): Unit } finally c.close()
  }

  private def count(url: String, table: String): Long = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(s"SELECT count(*) FROM $table")
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  test("upsertJdbc: staging+merge double-load is idempotent on live Derby") {
    import spark.implicits._
    val url = freshDb("blocks")
    exec(url,
      """CREATE TABLE cardano_blocks (
        |  "height" BIGINT PRIMARY KEY, "hash" VARCHAR(64) NOT NULL,
        |  "fees" DECIMAL(31,0))""".stripMargin)
    val batch = Seq((1L, "h1", 17L), (2L, "h2", 34L), (3L, "h3", 0L))
      .toDF("height", "hash", "fees")
      .withColumn("fees", col("fees").cast("decimal(31,0)"))

    val first = JdbcSink.upsertJdbc(batch, url, "cardano_blocks", Seq("height"),
      JdbcSink.DerbyDialect, props)
    assert(first == 3)
    assert(count(url, "cardano_blocks") == 3)

    // The reference's double-load test: replaying the same batch inserts 0.
    val second = JdbcSink.upsertJdbc(batch, url, "cardano_blocks", Seq("height"),
      JdbcSink.DerbyDialect, props)
    assert(second == 0)
    assert(count(url, "cardano_blocks") == 3)

    // Overlapping batch: only the fresh key lands.
    val overlap = Seq((3L, "h3", 0L), (4L, "h4", 99L)).toDF("height", "hash", "fees")
      .withColumn("fees", col("fees").cast("decimal(31,0)"))
    val third = JdbcSink.upsertJdbc(overlap, url, "cardano_blocks", Seq("height"),
      JdbcSink.DerbyDialect, props)
    assert(third == 1)
    assert(count(url, "cardano_blocks") == 4)
  }

  test("FK-ordered five-table UTXO load: one transaction, idempotent replay") {
    import spark.implicits._
    val url = freshDb("utxo")
    exec(url,
      """CREATE TABLE cardano_tx_utxo (
        |  "hash" VARCHAR(64) PRIMARY KEY, "created_at" TIMESTAMP NOT NULL)""".stripMargin)
    exec(url,
      """CREATE TABLE cardano_tx_utxo_input (
        |  "id" VARCHAR(64) PRIMARY KEY,
        |  "hash" VARCHAR(64) NOT NULL REFERENCES cardano_tx_utxo ("hash"),
        |  "address" VARCHAR(128) NOT NULL, "tx_utxo_hash" VARCHAR(64) NOT NULL,
        |  "output_index" BIGINT NOT NULL, "data_hash" VARCHAR(128),
        |  "inline_datum" VARCHAR(128), "reference_script_hash" VARCHAR(128),
        |  "collateral" BOOLEAN NOT NULL, "reference" BOOLEAN,
        |  "created_at" TIMESTAMP NOT NULL)""".stripMargin)
    exec(url,
      """CREATE TABLE cardano_tx_utxo_input_amount (
        |  "id" VARCHAR(64) PRIMARY KEY,
        |  "parent_id" VARCHAR(64) NOT NULL REFERENCES cardano_tx_utxo_input ("id"),
        |  "unit" VARCHAR(64) NOT NULL, "quantity" DECIMAL(31,0) NOT NULL,
        |  "created_at" TIMESTAMP NOT NULL)""".stripMargin)
    exec(url,
      """CREATE TABLE cardano_tx_utxo_output (
        |  "id" VARCHAR(64) PRIMARY KEY,
        |  "hash" VARCHAR(64) NOT NULL REFERENCES cardano_tx_utxo ("hash"),
        |  "address" VARCHAR(128) NOT NULL, "output_index" BIGINT NOT NULL,
        |  "data_hash" VARCHAR(128), "inline_datum" VARCHAR(128),
        |  "collateral" BOOLEAN NOT NULL, "reference_script_hash" VARCHAR(128),
        |  "consumed_by_tx" VARCHAR(128), "created_at" TIMESTAMP NOT NULL)""".stripMargin)
    exec(url,
      """CREATE TABLE cardano_tx_utxo_output_amount (
        |  "id" VARCHAR(64) PRIMARY KEY,
        |  "parent_id" VARCHAR(64) NOT NULL REFERENCES cardano_tx_utxo_output ("id"),
        |  "unit" VARCHAR(64) NOT NULL, "quantity" DECIMAL(31,0) NOT NULL,
        |  "created_at" TIMESTAMP NOT NULL)""".stripMargin)

    // Real pipeline data: fixture UTXO docs normalized through T4.
    val backend = new BlockfrostSource.FixtureBackend
    val hashes = Seq(f"${5L}%012x" + "0" * 52, f"${7L}%012x" + "1" * 52)
    val raw = BlockfrostSource.fetchTxUtxos(hashes.toDS(), backend)
    val t = Transforms.normalizeUtxo(raw)
    def narrow(df: org.apache.spark.sql.DataFrame) =
      if (df.columns.contains("quantity"))
        df.withColumn("quantity", col("quantity").cast("decimal(31,0)"))
      else df
    val frames = Seq(
      (narrow(t.utxo), "cardano_tx_utxo", Seq("hash")),
      (narrow(t.inputs), "cardano_tx_utxo_input", Seq("id")),
      (narrow(t.inputAmounts), "cardano_tx_utxo_input_amount", Seq("id")),
      (narrow(t.outputs), "cardano_tx_utxo_output", Seq("id")),
      (narrow(t.outputAmounts), "cardano_tx_utxo_output_amount", Seq("id")))

    val first = JdbcSink.upsertAllJdbc(frames, url, JdbcSink.DerbyDialect, props)
    assert(first("cardano_tx_utxo") == 2)
    assert(first("cardano_tx_utxo_input") == 2)
    assert(first("cardano_tx_utxo_input_amount") >= 2) // 1-2 amounts per input
    assert(first("cardano_tx_utxo_output") == 2)
    assert(count(url, "cardano_tx_utxo_input_amount") == first("cardano_tx_utxo_input_amount"))

    // Replay the whole five-table load: deterministic sha2 PKs ⇒ all
    // merges insert zero (created_at differs, but PK-conflict rows skip).
    val second = JdbcSink.upsertAllJdbc(frames, url, JdbcSink.DerbyDialect, props)
    assert(second.values.sum == 0)
  }

  test("double-staged same-key rows (retried executor) merge cleanly, one row per key") {
    import spark.implicits._
    val url = freshDb("retry")
    exec(url, """CREATE TABLE t_r ("pk" BIGINT PRIMARY KEY, "v" VARCHAR(32))""")
    val st = JdbcSink.stage(Seq((1L, "a"), (2L, "b")).toDF("pk", "v"),
      url, props, "t_r", Seq("pk"), JdbcSink.DerbyDialect)
    // Simulate a committed-then-retried executor transaction: a second
    // copy of pk=1 lands in staging with a DIFFERENT payload. The merge
    // must keep exactly one row per key, not abort on the PK constraint.
    exec(url, s"""INSERT INTO ${st.staging} ("pk", "v") VALUES (1, 'a-retry')""")
    val n = JdbcSink.mergeAll(url, props, Seq(st), JdbcSink.DerbyDialect)("t_r")
    assert(n == 2)
    assert(count(url, "t_r") == 2)
  }

  test("streaming foreachBatch into the live-JDBC staging+merge sink is effectively-once") {
    // The reference's production loop composed end-to-end: checkpointed
    // incremental file source -> per-batch staging+merge into a LIVE
    // database. Batch 2 replays a key of batch 1 (conflict-skip) and a
    // whole re-run against the same checkpoint is a no-op.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val url = freshDb("stream")
    exec(url, """CREATE TABLE t_s ("pk" BIGINT PRIMARY KEY, "v" VARCHAR(32))""")
    val src = tmpDir("js_src")
    val ckpt = tmpDir("js_ckpt")
    Seq((1L, "a"), (2L, "b")).toDF("pk", "v").write.mode("append").parquet(src)
    Seq((2L, "b-replay"), (3L, "c")).toDF("pk", "v").write.mode("append").parquet(src)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pk", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    def runStream(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          JdbcSink.upsertJdbc(batch, url, "t_s", Seq("pk"),
            JdbcSink.DerbyDialect, props): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runStream()
    assert(count(url, "t_s") == 3)
    runStream() // same checkpoint, nothing new: zero rows added
    assert(count(url, "t_s") == 3)
  }

  test("mergeAll rolls back the whole transaction on failure (no partial commit)") {
    import spark.implicits._
    val url = freshDb("rollback")
    exec(url, """CREATE TABLE t_parent ("id" BIGINT PRIMARY KEY)""")
    val good = JdbcSink.stage(Seq(1L, 2L).toDF("id"), url, props, "t_parent",
      Seq("id"), JdbcSink.DerbyDialect)
    // Second staged merge targets a table that does not exist → the merge
    // transaction must roll back the FIRST merge too.
    val bad = good.copy(table = "t_missing", staging = good.staging)
    intercept[Exception] {
      JdbcSink.mergeAll(url, props, Seq(good, bad), JdbcSink.DerbyDialect)
    }
    assert(count(url, "t_parent") == 0)
  }
}
