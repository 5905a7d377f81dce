package graft
import org.apache.spark.sql.SparkSession
object T {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    println("=== pricing_summary ===")
    operators.Relational.pricingSummary(spark, dir).explain("formatted")
    println("=== monthly_series (slice_yearly_avg) ===")
    operators.Payroll.sliceYearlyAvg(spark, dir).explain("formatted")
    spark.stop()
  }
}
