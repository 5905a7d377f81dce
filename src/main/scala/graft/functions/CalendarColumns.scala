package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar hierarchy derivations (SURVEY.md §2.2 P1–P10) as pure
  * Catalyst expressions — zero UDFs, so every one of these stays
  * inside whole-stage codegen and is visible to predicate pushdown /
  * partition pruning.
  *
  * Semantics follow the executed pandas in the reference, not its
  * display-only SQL (SURVEY.md §2.12): e.g. the decade bucket is the
  * all-decades formula of `/root/reference/dashboard_nfp.py:300`, not
  * the two-case CASE of `:307-311`.
  */
object CalendarColumns {
  /** P4 — `dt.year` (`dashboard_nfp.py:85` etc). Long for oracle
    * type parity (DuckDB year() yields BIGINT). */
  def yearOf(d: Column): Column = year(d).cast("long")

  /** P5 — `dt.month` (`dashboard_nfp.py:114`). */
  def monthOf(d: Column): Column = month(d).cast("long")

  /** P6 — `dt.to_period('Q')` (`dashboard_nfp.py:246`) as a
    * (year, quarter) pair; quarter component. */
  def quarterOf(d: Column): Column = quarter(d).cast("long")

  /** P6 display form — "1996-Q2". */
  def quarterLabel(d: Column): Column =
    concat(year(d).cast("string"), lit("-Q"), quarter(d).cast("string"))

  /** P7 — `dt.strftime('%B')` (`dashboard_nfp.py:198,348`). */
  def monthName(d: Column): Column = date_format(d, "MMMM")

  /** P8 — `dt.strftime('%B %Y')` (`dashboard_nfp.py:169-170,401`). */
  def monthYearLabel(d: Column): Column = date_format(d, "MMMM yyyy")

  /** P9 — decade bucket `f"{y//10*10}s"` (`dashboard_nfp.py:300`),
    * a row-lambda (pandas UDF) in the reference, a pure expression
    * here. */
  def decadeOf(d: Column): Column =
    concat((floor(year(d) / 10) * 10).cast("long").cast("string"), lit("s"))

  /** Truncate any timestamp to its month start as DATE (the grain of
    * the reference's PK, `etl.py:60`). */
  def monthStart(ts: Column): Column = to_date(date_trunc("month", ts))
}
