package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided star schema (TESTDATA.md).
  *
  * Every query in [[graft.SparkEntry]] reads through here so the scan path
  * is uniform: explicit parquet reads, no schema inference surprises, and
  * Catalyst gets a clean `FileScan parquet` it can push filters/projections
  * into. At 100 TB these would be partitioned/bucketed tables behind the
  * same function — the query code does not change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The event_type → category reference dimension shared by every query
    * that enriches events (s10's DPP build side, st8's stream-static
    * join) AND inlined in their oracle SQL — one definition so a mapping
    * change is a one-site edit that the oracles then catch.
    */
  val eventCategories: Seq[(String, String)] = Seq(
    ("click", "browse"), ("view", "browse"), ("purchase", "conversion"),
    ("signup", "conversion"), ("error", "ops"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark has no native
    * type for. Sessions set `spark.sql.legacy.parquet.nanosAsLong=true`;
    * here we land it as a micros TimestampType (integer `div` — the value
    * exceeds double's exact range, and floor matches DuckDB's ns→us
    * truncation so oracle comparisons agree).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsSince(spark, dir, None)

  /** Events newer than a watermark, with the comparison applied BEFORE
    * the nanos→micros conversion: a filter on the raw long column pushes
    * into the parquet scan (PushedFilters: GreaterThan(ts, …)), whereas
    * filtering the converted timestamp cannot. The 100 TB shape of
    * "incremental scan skips old data at the source".
    */
  def eventsSince(spark: SparkSession, dir: String, after: Option[java.sql.Timestamp]): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val filtered = after match {
          case Some(ts) =>
            val nanos = ts.getTime * 1000000L + (ts.getNanos % 1000000)
            df.filter(col("ts") > nanos)
          case None => df
        }
        filtered.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        after.fold(df)(ts => df.filter(col("ts") > lit(ts)))
    }
  }
}
