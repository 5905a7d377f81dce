package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's named query and its DuckDB
  * oracle SQL from the per-module registries. Column names are aliased
  * identically on both sides (the driver's compare sorts columns by
  * name before hashing values).
  */
object SparkEntry {
  /** Flagship query (W6 peak-to-recovery, SURVEY.md §2.11) on
    * sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Payroll.recovery(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Payroll.queries ++
      operators.Relational.queries ++
      operators.AsOf.queries ++
      ext.Text.queries ++
      ext.Dedup.queries ++
      ext.Similarity.queries ++
      ext.Curation.queries ++
      ext.Multimodal.queries ++
      sources.Ingest.queries ++
      sources.Layout.queries ++
      sources.v2.SeriesQueries.queries ++
      streaming.Events.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate/sketch-based), which get the weaker rows-only check. */
  def oracleSql: Map[String, String] =
    operators.Payroll.oracleSql ++
      operators.Relational.oracleSql ++
      operators.AsOf.oracleSql ++
      ext.Text.oracleSql ++
      ext.Dedup.oracleSql ++
      ext.Similarity.oracleSql ++
      ext.Curation.oracleSql ++
      ext.Multimodal.oracleSql ++
      sources.Ingest.oracleSql ++
      sources.Layout.oracleSql ++
      sources.v2.SeriesQueries.oracleSql ++
      streaming.Events.oracleSql
}
