package graft.cardano

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Read-side schema evolution: v1-written data must come back correctly
  * under the current schema (the Alembic block_time Integer→DateTime
  * migration, b0673669b6c8, replayed as lake versions).
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("v1 blocks (epoch-seconds time) read under v2 (timestamp) schema") {
    import spark.implicits._
    val root = tmpDir("sevo") + "/blocks"

    // v1 writer: `time` as epoch seconds (pre-migration shape).
    val v1 = Seq((1700000020L, 1L, "h1"), (1700000040L, 2L, "h2"))
      .toDF("time", "height", "hash")
    val v1Full = SchemaEvolution.blocksV1Schema.fields.foldLeft(v1) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(SchemaEvolution.blocksV1Schema.fieldNames.map(col).toSeq: _*)
    SchemaEvolution.write(v1Full, root, 1)

    // v2 writer: native timestamps.
    val v2 = Seq((Timestamp.valueOf("2023-11-14 22:14:40"), 3L, "h3"))
      .toDF("time", "height", "hash")
    val v2Full = Schemas.blocks.fields.foldLeft(v2) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(Schemas.blocks.fieldNames.map(col).toSeq: _*)
    SchemaEvolution.write(v2Full, root, 2)

    val merged = SchemaEvolution.readVersioned(spark, root, SchemaEvolution.blockVersions)
    assert(merged.schema("time").dataType == TimestampType)
    val times = merged.orderBy("height").select("time").as[Timestamp].collect()
    // 1700000020 = 2023-11-14 22:13:40 UTC — the v1 longs became real timestamps.
    assert(times(0) == Timestamp.valueOf("2023-11-14 22:13:40"))
    assert(times(1) == Timestamp.valueOf("2023-11-14 22:14:00"))
    assert(times(2) == Timestamp.valueOf("2023-11-14 22:14:40"))
    assert(merged.count() == 3)
  }

  test("chained upgrades: cast + added column across three versions") {
    import spark.implicits._
    val root = tmpDir("sevo3") + "/t"
    val v1s = StructType(Seq(
      StructField("id", LongType), StructField("amount", LongType)))
    val v2s = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType)))
    val v3s = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType),
      StructField("source", StringType)))
    val versions = Seq(
      SchemaEvolution.Version(1, v1s, SchemaEvolution.castColumn("amount", DoubleType)),
      SchemaEvolution.Version(2, v2s, SchemaEvolution.addColumn("source", StringType)),
      SchemaEvolution.Version(3, v3s, identity))

    SchemaEvolution.write(Seq((1L, 100L)).toDF("id", "amount"), root, 1)
    SchemaEvolution.write(Seq((2L, 2.5)).toDF("id", "amount"), root, 2)
    SchemaEvolution.write(Seq((3L, 3.5, "s3")).toDF("id", "amount", "source"), root, 3)

    val merged = SchemaEvolution.readVersioned(spark, root, versions)
    // all branches landed in v3 shape (names + types; nullability may widen)
    assert(merged.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      v3s.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = merged.orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSeq ==
      Seq((1L, 100.0, None), (2L, 2.5, None), (3L, 3.5, Some("s3"))))
  }

  test("missing version dirs are skipped; empty root fails loudly") {
    import spark.implicits._
    val root = tmpDir("sevo0") + "/t"
    val only2 = Seq((Timestamp.valueOf("2024-01-01 00:00:00"), 9L, "h9"))
      .toDF("time", "height", "hash")
    val full = Schemas.blocks.fields.foldLeft(only2) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(Schemas.blocks.fieldNames.map(col).toSeq: _*)
    SchemaEvolution.write(full, root, 2)
    assert(SchemaEvolution.readVersioned(spark, root, SchemaEvolution.blockVersions).count() == 1)
    intercept[IllegalArgumentException] {
      SchemaEvolution.readVersioned(spark, tmpDir("none"), SchemaEvolution.blockVersions)
    }
  }
}
