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

  /** Streaming S4 sink: drive the same last-write-wins [[upsert]]
    * from a stream via `foreachBatch` — each micro-batch merges into
    * the parquet snapshot and the result replaces it with a
    * write-to-`.next`-then-swap (the snapshot directory is never
    * half-written, and re-running a batch is idempotent because the
    * merge is keyed). This is the streaming face of the reference's
    * `ON CONFLICT DO UPDATE` loop: state lives in the snapshot, not
    * the state store, so the sink survives restarts with no
    * checkpointed aggregation. At scale the snapshot is partitioned
    * and only touched partitions rewrite; here it swaps whole for the
    * bench corpus. */
  def upsertSink(stream: DataFrame, path: String, key: String, version: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val existing =
          if (new java.io.File(path).exists) s.read.parquet(path)
          else s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
        val next = path + ".next"
        upsert(existing, batch, key, version)
          .write.mode(SaveMode.Overwrite).parquet(next)
        // swap AFTER the merged write fully materialized (it read the
        // old snapshot): delete old, move next into place
        deleteRecursively(new java.io.File(path))
        if (!new java.io.File(next).renameTo(new java.io.File(path)))
          throw new java.io.IOException(s"snapshot swap failed: $next -> $path")
        ()
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  private val BucketN = 8

  /** Bucketed co-located join — the at-scale layout technique the
    * snapshot writer above doesn't cover: write BOTH join sides
    * `bucketBy(key)` + `sortBy(key)` as managed parquet tables (one
    * file per bucket via an explicit pre-repartition on the key), and
    * the join on that key plans with NO shuffle on either side
    * (plan-asserted in `PlanSpec`): the bucketed scans report aligned
    * hash partitionings and the sort files make the merge sort-free.
    * At 100 TB this is THE repeated-fact-join move — pay the shuffle
    * once at write time, never again per query; bucket count scales
    * with the cluster (8 here only because the bench corpus is
    * small). Table names are per-(sf-dir, process) so concurrent
    * sessions don't clobber each other; the write runs once per
    * session (`tableExists` guard). */
  def bucketedColocatedJoin(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import graft.functions.Num._
    val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + ProcessHandle.current().pid()
    val oT = s"graft_b_orders_$suffix"
    val cT = s"graft_b_customer_$suffix"
    if (!s.catalog.tableExists(oT)) {
      graft.Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(BucketN, col("o_custkey"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(BucketN, "o_custkey").sortBy("o_custkey")
        .saveAsTable(oT)
      graft.Tables.customer(s, dir)
        .select("c_custkey", "c_mktsegment")
        .repartition(BucketN, col("c_custkey"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(BucketN, "c_custkey").sortBy("c_custkey")
        .saveAsTable(cT)
    }
    // merge hint: this operator models a fact-fact join (both sides
    // huge at 100 TB) — without it, toy-scale stats make Catalyst
    // broadcast the smaller side and the co-location demonstration
    // vanishes. With bucketed scans the merge join needs no exchange
    // and no sort on either side.
    s.table(oT).hint("merge")
      .join(s.table(cT), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        r4(dsum(col("o_totalprice"))).as("total_price"))
      .orderBy("c_mktsegment")
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map(
      "ingest_upsert_roundtrip" -> (upsertRoundtrip _),
      "ingest_bucketed_join" -> (bucketedColocatedJoin _))

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

    // bucketing is a physical layout choice — the logical result is a
    // plain key join, which is exactly what the oracle runs
    "ingest_bucketed_join" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  round(${graft.functions.Num.dsumSql("o_totalprice")}, 4) AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
