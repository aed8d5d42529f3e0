package graft.cardano

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent bulk load — the reference's one genuinely custom sink
  * (SURVEY §2.2 K3): `CREATE TEMP TABLE … COPY … INSERT … ON CONFLICT
  * (pk) DO NOTHING` in one transaction (`cardano_block_dao.py:93-148`).
  *
  * Spark-first re-expression, two backends sharing one merge semantic:
  *
  *  - [[mergeBatch]]: the pure relational core — within-batch PK dedup +
  *    left-anti join against existing keys. The anti-join shuffles BOTH
  *    sides on the PK — exactly the partitioning the append wants, and at
  *    100 TB the "existing keys" side is a column-pruned scan of just the
  *    key columns (never the full rows).
  *  - [[upsertParquet]]: lakehouse tables (used by tests and the offline
  *    pipelines here).
  *  - [[pgMergeStatements]]: the JDBC path — emits the staging-table DDL
  *    and the single `INSERT … SELECT … ON CONFLICT DO NOTHING` merge so
  *    a driver-side transaction can bracket multi-table FK-ordered loads
  *    (`s3_to_db_cardano_tx_utxo_pipeline.py:142-209`). Spark task
  *    retries can double-write into the STAGING table at most — the
  *    merge dedups on the deterministic PK, which is why surrogate ids
  *    are sha2-derived, not uuid4 (SURVEY §7.4 exactly-once).
  */
object IdempotentSink {

  final case class MergeStats(staged: Long, inserted: Long, conflictSkipped: Long)

  /** Within-batch dedup on the conflict key, then anti-join away rows
    * whose key already exists in the target (Q5 semantics).
    */
  def mergeBatch(staged: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame = {
    val deduped = staged.dropDuplicates(keys)
    val existingKeys = existing.select(keys.map(col): _*)
    deduped.join(existingKeys, keys, "left_anti")
  }

  /** Load-merge-append into a parquet table (creates it if absent).
    * Returns counts so callers (and the idempotency spec) can assert
    * re-loads insert zero.
    */
  def upsertParquet(
      spark: SparkSession,
      staged: DataFrame,
      path: String,
      keys: Seq[String]): MergeStats = {
    val exists = graft.core.Fs.exists(spark, path)
    val stagedCount = staged.count()
    if (!exists) {
      val deduped = staged.dropDuplicates(keys)
      deduped.write.mode(SaveMode.Overwrite).parquet(path)
      val inserted = spark.read.parquet(path).count()
      MergeStats(stagedCount, inserted, stagedCount - inserted)
    } else {
      val existing = spark.read.parquet(path)
      val fresh = mergeBatch(staged, existing, keys)
      // The merge plan reads the same path it appends to, so materialize
      // the delta to a scratch dir first (distributed — never through the
      // driver), then append it.
      val delta = s"$path.delta-${UUID.randomUUID().toString.take(8)}"
      fresh.write.mode(SaveMode.Overwrite).parquet(delta)
      val deltaDf = spark.read.parquet(delta)
      val inserted = deltaDf.count()
      if (inserted > 0) deltaDf.write.mode(SaveMode.Append).parquet(path)
      graft.core.Fs.deleteRecursively(spark, delta)
      MergeStats(stagedCount, inserted, stagedCount - inserted)
    }
  }

  /** The Postgres merge plan: statements bracketing a `df.write.jdbc`
    * load of the staging table. Mirrors `cardano_block_dao.py:122-148`
    * with one deliberate change: the staging table is a REGULAR
    * (unlogged) uniquely-named table, never `CREATE TEMPORARY … ON COMMIT
    * DROP` — Postgres temp tables are session-local, and the distributed
    * load arrives over EXECUTOR connections which would each see their
    * own empty temp table. It is dropped explicitly after the merge
    * commits. Execution (Derby live in tests, Postgres in a deployment)
    * lives in [[JdbcSink]]; this emits the same statements for callers
    * that manage their own connection.
    */
  def pgMergeStatements(
      table: String,
      columns: Seq[String],
      keys: Seq[String],
      stagingSuffix: String = UUID.randomUUID().toString.replace("-", "")): (String, Seq[String]) = {
    val staging = s"stg_${table}_$stagingSuffix"
    val d = JdbcSink.PostgresDialect
    (staging, Seq(
      d.createStagingSql(table, staging),
      d.mergeSql(table, staging, columns, keys),
      d.dropSql(staging)))
  }
}
