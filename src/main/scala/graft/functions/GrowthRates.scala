package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Windowed growth-rate arithmetic (SURVEY.md §2.5 W1–W5). pandas
  * `pct_change()` / `diff()` ≡ SQL `LAG` arithmetic
  * (`/root/reference/etl.py:37`, `dashboard_nfp.py:152,196,248,251,
  * 339,398`).
  *
  * FP-determinism contract with the DuckDB oracle: the expression is
  * exactly `(v - lag(v)) / lag(v) * 100` — subtraction on exact
  * integers, then one double divide, then one double multiply, the
  * same op order DuckDB evaluates for the same SQL text. Never
  * reassociate (e.g. `* 100 / lag`) or the last-ulp bits can differ.
  *
  * Scale note: an unpartitioned `Window.orderBy` serializes the series
  * onto one task. That is correct and cheap *after* the monthly
  * pre-aggregation (#months rows), which is how every caller here uses
  * it — the 100 TB input is reduced by the upstream groupBy before any
  * global window runs. Never apply these to raw fact rows; partition
  * the window (see [[pctChange]]'s WindowSpec parameter) as W2 does.
  */
object GrowthRates {
  /** W1/W2/W3/W4 — percent change vs previous row in `w`'s order.
    * Null on each partition's first row (pandas first-row NaN,
    * dropped at `etl.py:38`). */
  def pctChange(v: Column, w: WindowSpec): Column =
    (v - lag(v, 1).over(w)) / lag(v, 1).over(w) * lit(100)

  /** W5 — absolute difference vs previous row (`diff()`,
    * `dashboard_nfp.py:339,398`). */
  def absChange(v: Column, w: WindowSpec): Column =
    v - lag(v, 1).over(w)

  /** W7 — running prior peak: max over all strictly-earlier rows
    * (`dashboard_nfp.py:161`). */
  def priorPeak(v: Column, w: WindowSpec): Column =
    max(v).over(w.rowsBetween(Long.MinValue, -1))
}
