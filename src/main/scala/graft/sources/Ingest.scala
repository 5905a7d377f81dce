package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest/sink parity (SURVEY.md §2.1 S1–S4): the reference lands a
  * keyed series with row-at-a-time `INSERT … ON CONFLICT DO UPDATE`
  * (`/root/reference/etl.py:66-71`) — idempotent last-write-wins per
  * primary key. On Parquet the equivalent is set-based: merge new and
  * existing rows, keep the newest version per key, rewrite the
  * snapshot. One window, one shuffle on the key, no per-row
  * round-trips.
  */
object Ingest {

  /** Last-write-wins merge: among all rows sharing `key`, keep the
    * one with the highest `version` (ties: arbitrary-but-deterministic
    * via the key ordering below). Mirrors `ON CONFLICT (date) DO
    * UPDATE SET value = EXCLUDED.value` applied in version order. */
  def upsert(existing: DataFrame, incoming: DataFrame,
      key: String, version: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(version).desc)
    existing.unionByName(incoming)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Snapshot writer for the monthly series table: partitioned by
    * year so calendar-sliced queries prune whole directories (the
    * reference's full-table `SELECT *` anti-pattern inverted). At
    * 100 TB the same layout holds — partition on the coarse calendar
    * grain, let month-level pruning ride on parquet row-group stats. */
  def writeTimeSeries(df: DataFrame, path: String,
      dateCol: String = "month"): Unit =
    df.withColumn("year", year(col(dateCol)))
      .repartition(col("year"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("year")
      .parquet(path)
}
