package graft

/** The `spark.sql` face of the engine: the ANSI-dialect oracle texts
  * (the subset that avoids DuckDB-only functions) must run unchanged
  * through Spark SQL over temp views and produce row-for-row the same
  * results as the DataFrame plans. This is the "a user can type SQL
  * at it" guarantee — and a standing check that the oracle SQL really
  * is the portable-ANSI description of each query, not a
  * DuckDB-flavored approximation.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val cases: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame)] = Seq(
    "rel_pricing_summary" -> (operators.Relational.pricingSummary _),
    "rel_revenue_by_region" -> (operators.Relational.revenueByRegion _),
    "rel_latest_order_per_customer" -> (operators.Relational.latestOrderPerCustomer _),
    "rel_customers_without_orders" -> (operators.Relational.customersWithoutOrders _),
    "events_hourly_by_type" -> (streaming.Events.hourlyByType _),
    "events_purchase_view_join" -> (streaming.Events.purchaseViewJoin _),
  )

  test("ANSI oracle texts run through spark.sql with identical results") {
    Seq("lineitem", "orders", "customer", "nation", "region").foreach { t =>
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    }
    Tables.events(spark, sf0001).createOrReplaceTempView("events")
    cases.foreach { case (name, fn) =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name)).collect().map(_.toSeq)
      val viaDf = fn(spark, sf0001).collect().map(_.toSeq)
      assert(viaSql.length == viaDf.length,
        s"$name: SQL rows ${viaSql.length} != DataFrame rows ${viaDf.length}")
      viaSql.zip(viaDf).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"$name row $i differs: sql=$a df=$b")
      }
    }
  }
}
