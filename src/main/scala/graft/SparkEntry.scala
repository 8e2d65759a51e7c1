package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Registry only: each operator pack contributes (queries, oracleSql) pairs.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("g11_conflict_shared_part")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rel.RelQueries.queries ++
    graph.GraphQueries.queries ++
    text.LlmQueries.queries ++
    stream.StreamQueries.queries ++
    sources.SourceQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    rel.RelQueries.oracleSql ++
    graph.GraphQueries.oracleSql ++
    text.LlmQueries.oracleSql ++
    stream.StreamQueries.oracleSql ++
    sources.SourceQueries.oracleSql
}
