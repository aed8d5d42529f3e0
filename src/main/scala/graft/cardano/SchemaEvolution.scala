package graft.cardano

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution for lake zones — the engine analogue of the
  * reference's Alembic migrations (`database_management/versions/
  * b0673669b6c8_edited_block_time_from_integer_to_.py:22-30`: block time
  * Integer → DateTime, and `d063573f99e5…:21-25`).
  *
  * A database migrates rows in place; a 100 TB lake cannot — old parquet
  * stays as written. So evolution is a READ-side contract: each schema
  * version records its on-disk `StructType` and an `upgrade` projection
  * to the next version, and [[readVersioned]] reads every version's
  * files under their own schema, chains the upgrades, and unions by
  * name — one DataFrame in current shape, no rewrite, no driver loop
  * (upgrades are narrow projections, fully codegen'd, pushdown intact
  * per version branch).
  *
  * Layout: `<root>/v=<n>/…parquet`. The version is a directory key, so a
  * reader of current data only (`v=<latest>`) prunes old versions at
  * listing time.
  */
object SchemaEvolution {

  /** One schema version: `upgrade` maps THIS version's shape to the NEXT
    * version's shape (the latest version's upgrade is the identity).
    */
  final case class Version(n: Int, schema: StructType, upgrade: DataFrame => DataFrame)

  def versionDir(root: String, n: Int): String = s"$root/v=$n"

  def write(df: DataFrame, root: String, n: Int): Unit =
    df.write.mode(SaveMode.Append).parquet(versionDir(root, n))

  /** Read all existing version dirs, upgrading each branch to the latest
    * version's shape. Versions with no data on disk are skipped.
    */
  def readVersioned(spark: SparkSession, root: String, versions: Seq[Version]): DataFrame = {
    val ordered = versions.sortBy(_.n)
    require(ordered.nonEmpty, "at least one schema version required")
    val frames = ordered.zipWithIndex.flatMap { case (v, i) =>
      val dir = versionDir(root, v.n)
      if (!graft.core.Fs.exists(spark, dir)) None
      else Some(ordered.drop(i).foldLeft(spark.read.schema(v.schema).parquet(dir)) {
        (df, step) => step.upgrade(df)
      })
    }
    require(frames.nonEmpty, s"no data under any version of $root")
    frames.reduce(_.unionByName(_))
  }

  /** The reference's concrete migration, as lake versions: v1 wrote block
    * `time` as INTEGER epoch seconds; v2 writes TIMESTAMP
    * (`b0673669b6c8_edited_block_time_from_integer_to_.py:22-30`).
    */
  val blocksV1Schema: StructType = StructType(
    Schemas.blocks.map(f => if (f.name == "time") f.copy(dataType = LongType) else f))

  val blockVersions: Seq[Version] = Seq(
    Version(1, blocksV1Schema, df => df.withColumn("time", timestamp_seconds(col("time")))),
    Version(2, Schemas.blocks, identity))

  /** Common evolution steps as reusable upgrade builders. */
  def castColumn(name: String, to: DataType): DataFrame => DataFrame =
    df => df.withColumn(name, col(name).cast(to))

  def addColumn(name: String, to: DataType): DataFrame => DataFrame =
    df => df.withColumn(name, lit(null).cast(to))

  def renameColumn(from: String, to: String): DataFrame => DataFrame =
    df => df.withColumnRenamed(from, to)
}
