package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-area query maps. Every query name appears in both
  * `queries` (Spark DataFrame plan) and — when DuckDB-expressible —
  * `oracleSql` (the correctness oracle), with identical output column
  * names and a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_groupby_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.CelFunctions.queries ++
      graft.queries.Formats.queries ++
      graft.queries.Pipeline.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.CelFunctions.oracle ++
      graft.queries.Formats.oracle ++
      graft.queries.Pipeline.oracle
}
