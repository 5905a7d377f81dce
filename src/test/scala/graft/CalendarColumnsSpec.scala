package graft

import java.sql.Date
import org.apache.spark.sql.functions.col
import graft.functions.CalendarColumns._

class CalendarColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("decade bucket covers every decade incl. century edges (P9)") {
    val df = Seq(d("1995-06-01"), d("1999-12-01"), d("2000-01-01"),
      d("2009-12-31"), d("2010-01-01"), d("2020-02-29"))
      .toDF("dt").select(decadeOf(col("dt")).as("dec"))
    assert(df.as[String].collect().toSeq ==
      Seq("1990s", "1990s", "2000s", "2000s", "2010s", "2020s"))
  }

  test("month name and month-year label are US-English (P7/P8)") {
    val df = Seq(d("1996-04-01")).toDF("dt")
      .select(monthName(col("dt")).as("n"), monthYearLabel(col("dt")).as("l"))
    assert(df.as[(String, String)].head() == ("April", "April 1996"))
  }

  test("year/month/quarter extraction (P4/P5/P6)") {
    val df = Seq(d("1997-11-15")).toDF("dt")
      .select(yearOf(col("dt")), monthOf(col("dt")), quarterOf(col("dt")),
        quarterLabel(col("dt")))
    assert(df.as[(Long, Long, Long, String)].head() == (1997L, 11L, 4L, "1997-Q4"))
  }
}
