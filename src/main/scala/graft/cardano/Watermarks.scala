package graft.cardano

import java.sql.Timestamp

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Watermark store for incremental, idempotent re-runs (SURVEY §2.1
  * S9/Q1/Q2, §2.2 K4): per-table high-water marks — highest exported
  * block height and newest loaded file timestamp.
  *
  * Reference: `provider_to_s3_import_status_dao.py:56-69` (coalesce-max
  * read, insert per batch) and `s3_to_db_import_status_dao.py:40-79`.
  *
  * Backed by two tiny append-only parquet tables; reads are driver-side
  * scalar aggregations (these tables stay KB-sized no matter the data
  * volume — one row per batch). In a deployment this would be the same
  * code over a JDBC table.
  */
final class Watermarks(spark: SparkSession, root: String) {

  private val providerPath = s"$root/provider_to_s3_import_status"
  private val lakePath = s"$root/s3_to_db_import_status"

  private def readOrEmpty(path: String, schema: org.apache.spark.sql.types.StructType) =
    if (graft.core.Fs.exists(spark, path)) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Q1: `SELECT coalesce(max(block_height), 0) WHERE "table" = t`. */
  def highestExportedBlock(table: String): Long =
    readOrEmpty(providerPath, Schemas.providerImportStatus)
      .filter(col("table") === table)
      .agg(coalesce(max(col("block_height")), lit(0L)))
      .head().getLong(0)

  /** Q2: `SELECT max(file_modified_date) WHERE "table" = t`. */
  def latestLoadedFileDate(table: String): Option[Timestamp] =
    Option(
      readOrEmpty(lakePath, Schemas.lakeImportStatus)
        .filter(col("table") === table)
        .agg(max(col("file_modified_date")))
        .head().getTimestamp(0))

  /** K4: record a completed provider→lake export batch. */
  def recordBlockExport(table: String, height: Long): Unit =
    spark.createDataFrame(
        java.util.Arrays.asList(Row(table, height, new Timestamp(System.currentTimeMillis()))),
        Schemas.providerImportStatus)
      .write.mode(SaveMode.Append).parquet(providerPath)

  /** K4: record a completed lake→warehouse file load. */
  def recordFileLoad(table: String, fileModified: Timestamp): Unit =
    spark.createDataFrame(
        java.util.Arrays.asList(Row(table, fileModified, new Timestamp(System.currentTimeMillis()))),
        Schemas.lakeImportStatus)
      .write.mode(SaveMode.Append).parquet(lakePath)
}
