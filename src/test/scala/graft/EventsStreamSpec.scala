package graft

import graft.streaming.Events

/** Structured Streaming surface: the same transform verified in batch
  * (DuckDB oracle) must produce identical results when driven through
  * readStream → memory sink. */
class EventsStreamSpec extends SparkSpec {

  test("streaming hourly agg == batch hourly agg (complete mode)") {
    val batch = Events.hourlyByType(spark, sf0001).collect().map(_.toSeq).toSet

    val q = Events.hourlyStream(spark, sf0001)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stateful per-user totals converge to the batch aggregate") {
    import org.apache.spark.sql.functions._
    val batch = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val q = Events.userTotalsStream(spark, sf0001)
      .writeStream.outputMode("update")
      .format("memory").queryName("user_totals")
      .start()
    try {
      q.processAllAvailable()
      // update mode: last row per user is the final state
      val streamed = spark.table("user_totals")
        .groupBy("user_id")
        .agg(max("n_events").as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming attribution == batch as-of join") {
    val batch = graft.operators.AsOf.purchaseAttribution(spark, sf0001)
      .select("purchase_id", "view_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val q = Events.attributionStream(spark, sf0001)
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .select("purchase_id", "view_id").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup emits each event_id once") {
    val q = Events.dedupStream(spark, sf0001)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      val distinct = spark.table("dedup_out")
        .select("event_id").distinct().count()
      assert(n == distinct && n > 0)
    } finally q.stop()
  }
}
