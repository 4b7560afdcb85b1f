package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, CurationQueries, FeatureQueries, LlmQueries, PipelineQueries, ScalarQueries, StatsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* grouped by operator family; each
  * query name has a matching DuckDB oracle in `oracleSql` (omitted only
  * for non-SQL-expressible operators → driver does a rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q3_join_fact")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ScalarQueries.queries ++ LlmQueries.queries ++
      FeatureQueries.queries ++ PipelineQueries.queries ++
      CurationQueries.queries ++ StatsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ScalarQueries.oracles ++ LlmQueries.oracles ++
      FeatureQueries.oracles ++ PipelineQueries.oracles ++
      CurationQueries.oracles ++ StatsQueries.oracles
}
