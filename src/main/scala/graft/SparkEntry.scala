package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Relational, SourcesAndStreams, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (names prefixed to mirror the survey's operator ids);
  * `oracleSql` gives the DuckDB-equivalent ANSI SQL for each entry that is
  * SQL-expressible (same column names — the driver sorts columns by name
  * and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Top revenue by nation — exercises scan, broadcast joins, decimal agg,
    * top-k in one plan (reference Q8 shape, README.md:111-114).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q6VolumeTopk(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.registry ++ TrainingData.registry ++ SourcesAndStreams.registry

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TrainingData.oracles ++ SourcesAndStreams.oracles

  /** Explicit bench-family tags (declared beside the registries) for
    * entries whose family a name prefix would mis-classify — Bench
    * refuses an untagged `c*` key so new compositions must declare
    * theirs.
    */
  def families: Map[String, String] =
    TrainingData.families ++ SourcesAndStreams.families
}
