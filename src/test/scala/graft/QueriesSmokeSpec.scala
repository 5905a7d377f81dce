package graft

import org.apache.spark.sql.functions._

/** End-to-end smoke over sf0.001 (the driver's t1 gate) plus
  * cross-grain invariants that hold regardless of data values. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry (flagship W6) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and its oracle key exists") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must execute without throwing
    }
    // full oracle coverage both ways: every query hash-checked, no
    // orphaned SQL (the engine promises ZERO rows-only checks)
    val orphans = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
    val unoracled = qs.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"query without DuckDB oracle: $unoracled")
  }

  test("rollup consistency: sum of quarterly totals == sum of yearly totals") {
    val q = operators.Payroll.rollupQuarterly(spark, sf0001)
      .agg(sum("total_emp")).head().getLong(0)
    val y = operators.Payroll.rollupYearly(spark, sf0001)
      .agg(sum("total_emp")).head().getLong(0)
    assert(q == y)
  }

  test("rollup hierarchy grand total equals series total") {
    val h = operators.Payroll.rollupHierarchy(spark, sf0001)
    val grand = h.filter(col("year").isNull && col("quarter").isNull)
      .select("total_emp").head().getLong(0)
    val total = Tables.monthlySeries(spark, sf0001)
      .agg(sum("emp")).head().getLong(0)
    assert(grand == total)
  }

  test("cube grand total equals series total") {
    val grand = operators.Payroll.cubeYearQuarter(spark, sf0001)
      .filter(col("year").isNull && col("quarter").isNull)
      .select("total_emp").head().getLong(0)
    val total = Tables.monthlySeries(spark, sf0001)
      .agg(sum("emp")).head().getLong(0)
    assert(grand == total)
  }

  test("latest-order dedup: one row per customer, idempotent (S4)") {
    val d = operators.Relational.latestOrderPerCustomer(spark, sf0001)
    assert(d.groupBy("o_custkey").count().filter(col("count") > 1).isEmpty)
  }
}
