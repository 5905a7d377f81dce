package graft

import java.sql.Date
import graft.operators.Payroll

/** W6 peak-to-recovery on the NFP-shaped fixture (FIXTURES.md §A):
  * a monthly series with a 2020-style crash whose every answer is
  * hand-computed. Mirrors `/root/reference/dashboard_nfp.py:152-171`
  * semantics, plus the null-recovery case the reference silently
  * skips (`:166`).
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  // level series: gentle growth, one -13% crash in 2020-04 (analog of
  // April 2020), staged recovery crossing the prior peak (152) in
  // 2020-09, then growth, then a trailing never-recovered drop.
  private val fixture = Seq(
    "2019-11-01" -> 148L, "2019-12-01" -> 149L,
    "2020-01-01" -> 150L, "2020-02-01" -> 152L, "2020-03-01" -> 151L,
    "2020-04-01" -> 131L, // crash: -13.245% vs 151, prior peak 152
    "2020-05-01" -> 140L, "2020-06-01" -> 145L, "2020-07-01" -> 149L,
    "2020-08-01" -> 151L, "2020-09-01" -> 153L, // first month >= 152
    "2020-10-01" -> 155L, "2020-11-01" -> 156L,
    "2020-12-01" -> 140L, // trailing drop (-10.26%), never recovers
    "2021-01-01" -> 141L,
  ).map { case (m, v) => (Date.valueOf(m), v) }

  private lazy val result = Payroll.recoveryOf(fixture.toDF("month", "emp"))
    .collect()

  test("detects exactly the two >2% drops, in date order") {
    assert(result.map(_.getAs[Date]("drop_month")).toSeq ==
      Seq(Date.valueOf("2020-04-01"), Date.valueOf("2020-12-01")))
  }

  test("crash month: prior peak, its date, recovery month and distance") {
    val r = result(0)
    assert(r.getAs[Long]("prior_peak") == 152L)
    assert(r.getAs[Date]("prior_peak_month") == Date.valueOf("2020-02-01"))
    assert(r.getAs[Date]("recovery_month") == Date.valueOf("2020-09-01"))
    assert(r.getAs[Long]("months_to_recover") == 5L)
    assert(math.abs(r.getAs[Double]("mom_pct") - (131.0 - 151.0) / 151.0 * 100) < 1e-4)
  }

  test("unrecovered trailing drop yields null recovery (kept, not skipped)") {
    val r = result(1)
    assert(r.getAs[Long]("prior_peak") == 156L)
    assert(r.isNullAt(r.fieldIndex("recovery_month")))
    assert(r.isNullAt(r.fieldIndex("months_to_recover")))
  }
}
