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

  /** S4 end-to-end declared query: build a deterministic "incoming"
    * batch (every 10th order re-arrives one day later with status
    * 'R'), [[upsert]] it into the base snapshot last-write-wins,
    * [[writeTimeSeries]] the merged snapshot to parquet (year-
    * partitioned), re-read it, and return the rows — the reference's
    * whole `etl.py:66-71` load story as one verifiable round trip.
    * The DuckDB oracle recomputes the same merge relationally, so the
    * write→read path (not just the merge plan) is hash-checked. */
  def upsertRoundtrip(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.orders(s, dir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_totalprice"), col("o_orderstatus"))
    val incoming = base.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderdate", date_add(col("o_orderdate"), 1))
      .withColumn("o_orderstatus", lit("R"))
    val merged = upsert(base, incoming, "o_orderkey", "o_orderdate")
    // per-process path: two concurrent sessions (bench + verify) must
    // not overwrite each other's snapshot mid-read
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ingest_roundtrip_" +
      new java.io.File(dir).getName + "_" + ProcessHandle.current().pid()
    writeTimeSeries(merged, path, "o_orderdate")
    s.read.parquet(path)
      .select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("ingest_upsert_roundtrip" -> (upsertRoundtrip _))

  val oracleSql: Map[String, String] = Map(
    "ingest_upsert_roundtrip" ->
      """WITH base AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |    o_totalprice, o_orderstatus FROM orders),
        |inc AS (SELECT o_orderkey, o_orderdate + 1 AS o_orderdate,
        |    o_totalprice, 'R' AS o_orderstatus FROM base WHERE o_orderkey % 10 = 0),
        |u AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY o_orderdate DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM inc))
        |SELECT o_orderkey, o_orderdate, o_totalprice, o_orderstatus
        |FROM u WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
  )
}
