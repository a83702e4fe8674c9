package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The trans_summary_5min pattern (SURVEY §7.2) on the smallest fixture. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.FixtureQueries.q1TransSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator pattern from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.FixtureQueries.queries ++ graft.queries.ReportQueries.queries ++
      graft.queries.ExtensionQueries.queries ++ graft.queries.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.FixtureQueries.oracleSql ++ graft.queries.ReportQueries.oracleSql ++
      graft.queries.ExtensionQueries.oracleSql ++ graft.queries.StreamingQueries.oracleSql
}
