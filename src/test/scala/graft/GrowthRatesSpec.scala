package graft

import java.sql.Date
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.col
import graft.functions.GrowthRates._

class GrowthRatesSpec extends SparkSpec {
  import spark.implicits._

  private val w = Window.orderBy("month")
  private def series(vs: (String, Long)*) =
    vs.map { case (m, v) => (Date.valueOf(m), v) }.toDF("month", "emp")

  test("pctChange is null on first row, exact LAG arithmetic after (W1)") {
    val got = series("2020-01-01" -> 100L, "2020-02-01" -> 110L,
      "2020-03-01" -> 99L)
      .withColumn("p", pctChange(col("emp"), w))
      .orderBy("month").select("p").as[Option[Double]].collect().toSeq
    assert(got.head.isEmpty)
    assert(math.abs(got(1).get - 10.0) < 1e-12)
    assert(math.abs(got(2).get - (99.0 - 110.0) / 110.0 * 100) < 1e-12)
  }

  test("absChange is the first difference (W5)") {
    val got = series("2020-01-01" -> 100L, "2020-02-01" -> 97L)
      .withColumn("g", absChange(col("emp"), w))
      .orderBy("month").select("g").as[Option[Long]].collect().toSeq
    assert(got == Seq(None, Some(-3L)))
  }

  test("priorPeak is the running max over strictly-earlier rows (W7)") {
    val got = series("2020-01-01" -> 5L, "2020-02-01" -> 9L,
      "2020-03-01" -> 7L, "2020-04-01" -> 8L)
      .withColumn("pk", priorPeak(col("emp"), w))
      .orderBy("month").select("pk").as[Option[Long]].collect().toSeq
    assert(got == Seq(None, Some(5L), Some(9L), Some(9L)))
  }
}
