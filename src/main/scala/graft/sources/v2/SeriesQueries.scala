package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared-query face of the `graft-series` DSv2 connector — puts
  * the connector under the DuckDB oracle gate (the generator's value
  * formula is closed-form, so the oracle restates it over `range()`).
  * The filter exercises the connector's planning-time split pruning
  * ([[SeriesScanBuilder.pushFilters]]: with monthsPerSplit=60, the
  * 2010–2014 predicate plans 1 split of the 8 an unfiltered 480-month
  * read would — `SeriesSourceSpec` asserts the count), and the
  * aggregate exercises column flow through the pruned read schema.
  */
object SeriesQueries {

  def seriesSourceScan(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-series")
      .option("months", 480L)
      .option("monthsPerSplit", 60L)
      .load()
      .filter(col("month") >= lit(java.sql.Date.valueOf("2010-01-01")) &&
        col("month") < lit(java.sql.Date.valueOf("2015-01-01")))
      .groupBy(year(col("month")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n_months"), sum("emp").as("total_emp"))
      .orderBy("yr")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "series_source_scan" -> (seriesSourceScan _))

  // the generator formula of SeriesSource.empAt / monthEpochDay,
  // restated over DuckDB's range() — any drift in the connector's
  // generation, pushdown, or date arithmetic breaks the hash
  val oracleSql: Map[String, String] = Map(
    "series_source_scan" ->
      """WITH s AS (SELECT CAST(DATE '1990-01-01' + INTERVAL (i) MONTH AS DATE) AS month,
        |    10000 + i * 10 + (i * 2654435761) % 997 + ((i % 12) - 6) * 37 AS emp
        |  FROM range(0, 480) t(i))
        |SELECT CAST(year(month) AS BIGINT) AS yr, count(*) AS n_months,
        |  CAST(sum(emp) AS BIGINT) AS total_emp
        |FROM s WHERE month >= DATE '2010-01-01' AND month < DATE '2015-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
