package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AdvancedQueries, CatalogQueries, CoreQueries, CurationQueries, LakeQueries, LlmQueries, OpsQueries, SqlQueries, StreamQueries, VariantQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-domain query registries; every operator from
  * SURVEY.md §2 is represented by a `queries` entry, with a DuckDB oracle in
  * `oracleSql` where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the LLM-data-
    * pipeline extensions: dedup, similarity, text analysis, multimodal,
    * event-time windows). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ LlmQueries.queries ++ AdvancedQueries.queries ++
      OpsQueries.queries ++ StreamQueries.queries ++ LakeQueries.queries ++
      CurationQueries.queries ++ SqlQueries.queries ++
      CatalogQueries.queries ++ VariantQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ LlmQueries.oracle ++ AdvancedQueries.oracle ++
      OpsQueries.oracle ++ StreamQueries.oracle ++ LakeQueries.oracle ++
      CurationQueries.oracle ++ SqlQueries.oracle ++
      CatalogQueries.oracle ++ VariantQueries.oracle
}
