package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2) instantiated on the
  * driver TESTDATA; `oracleSql` holds the DuckDB-equivalent ANSI SQL for
  * every hash-checkable entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The Q5 dimension-join aggregate (fact ⋈ customer ⋈ nation ⋈
    * region with broadcast dims) exercises scan, join strategy choice,
    * partial aggregation and ordering in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q5_dim_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
