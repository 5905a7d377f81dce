package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers that keep Spark results bit-identical to the
  * DuckDB oracle.
  *
  * Double `SUM`/`AVG` is order-dependent (shuffle + partial-agg order
  * is nondeterministic), so any aggregate over a double measure sums
  * through an exact DECIMAL(25,8) and casts back — deterministic on
  * both engines regardless of row order, and still a single-pass
  * hash aggregate with map-side combine. Outputs are rounded to 4
  * decimals on both sides.
  */
object Num {
  private val D = DecimalType(25, 8)

  /** Order-independent sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Like [[dsum]] but stays DECIMAL — for intermediate results that
    * feed a second aggregation level (re-summing doubles would
    * reintroduce order dependence). */
  def dsumExact(c: Column): Column = sum(c.cast(D))

  /** Oracle-side SQL for [[dsumExact]]. */
  def dsumExactSql(expr: String): String =
    s"SUM(CAST(($expr) AS DECIMAL(25,8)))"

  /** Order-independent average of a double expression: exact decimal
    * sum, cast to double, then one double divide — the same op order
    * as [[davgSql]] (decimal/decimal division scale rules differ
    * between engines, double division does not). */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)

  /** Standard output rounding for doubles. */
  def r4(c: Column): Column = round(c, 4)

  /** Oracle-side SQL for [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(25,8))) AS DOUBLE)"

  /** Oracle-side SQL for [[davg]]. */
  def davgSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(25,8))) AS DOUBLE) / COUNT($expr)"
}
