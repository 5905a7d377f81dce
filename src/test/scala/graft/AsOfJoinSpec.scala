package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** The custom as-of join operator (LogicalPlan + Strategy + Exec):
  * fixture semantics, parity with a window-composed equivalent on
  * real data, and the physical plan shape. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics on a fixture: latest right row at-or-before, per key") {
    val quotes = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
      .toDF("qk", "qts", "quote")
    val trades = Seq((1L, 5L), (1L, 10L), (1L, 25L), (2L, 14L), (3L, 99L))
      .toDF("tk", "tts")
    val got = AsOf.join(trades, quotes, "tk", "qk", "tts", "qts")
      .select("tk", "tts", "quote").orderBy("tk", "tts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 5L, null),    // before any quote
      (1L, 10L, "a"),    // equal timestamp matches (<=)
      (1L, 25L, "b"),    // latest, not first
      (2L, 14L, null),   // key 2's quote is later
      (3L, 99L, null)))  // key with no right rows at all
  }

  test("tieBreak pins the winner among equal-(key, ts) right rows") {
    // two quotes share (key=1, ts=10); the pinned pick is the MAX
    // tie value — the same reduction the streaming twin's
    // max(struct(ts, id)) computes, so batch ≡ stream by construction
    val quotes = Seq((1L, 10L, 7L, "lo"), (1L, 10L, 9L, "hi"),
        (1L, 20L, 1L, "later"))
      .toDF("qk", "qts", "qid", "quote")
    val trades = Seq((1L, 12L), (1L, 25L)).toDF("tk", "tts")
    val got = AsOf.join(trades, quotes, "tk", "qk", "tts", "qts",
        tieBreak = Some("qid"))
      .select("tts", "qid", "quote").orderBy("tts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((12L, 9L, "hi"), (25L, 1L, "later")))
    // forward face: equal-ts candidates at-or-after also pick max id
    val fwd = AsOf.joinForward(Seq((1L, 5L)).toDF("tk", "tts"), quotes,
        "tk", "qk", "tts", "qts", tieBreak = Some("qid"))
      .select("qid", "quote").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(fwd.toSeq == Seq((9L, "hi")))
  }

  test("tolerance bounds the match window (merge_asof semantics)") {
    val quotes = Seq((1L, 10L, "a"), (1L, 100L, "b")).toDF("qk", "qts", "quote")
    val trades = Seq((1L, 12L), (1L, 50L), (1L, 103L)).toDF("tk", "tts")
    val got = AsOf.join(trades, quotes, "tk", "qk", "tts", "qts",
        tolerance = Some(5L))
      .select("tts", "quote").orderBy("tts")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (12L, "a"),    // 12 - 10 = 2 <= 5
      (50L, null),   // 50 - 10 = 40 > 5: stale quote rejected
      (103L, "b")))  // 103 - 100 = 3 <= 5
  }

  test("forward as-of: earliest right row at-or-after, per key") {
    val deploys = Seq((1L, 10L, "d1"), (1L, 30L, "d2"), (2L, 5L, "d3"))
      .toDF("dk", "dts", "deploy")
    val alerts = Seq((1L, 5L), (1L, 10L), (1L, 31L), (2L, 6L), (3L, 1L))
      .toDF("ak", "ats")
    val got = AsOf.joinForward(alerts, deploys, "ak", "dk", "ats", "dts")
      .select("ak", "ats", "deploy").orderBy("ak", "ats")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 5L, "d1"),    // earliest at-or-after, not latest
      (1L, 10L, "d1"),   // equal timestamp matches (>=)
      (1L, 31L, null),   // after every deploy
      (2L, 6L, null),    // key 2's deploy already happened
      (3L, 1L, null)))   // key with no right rows at all
  }

  test("forward tolerance bounds the lookahead window") {
    val deploys = Seq((1L, 10L, "a"), (1L, 100L, "b")).toDF("dk", "dts", "deploy")
    val alerts = Seq((1L, 8L), (1L, 50L), (1L, 97L)).toDF("ak", "ats")
    val got = AsOf.joinForward(alerts, deploys, "ak", "dk", "ats", "dts",
        tolerance = Some(5L))
      .select("ats", "deploy").orderBy("ats")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (8L, "a"),     // 10 - 8 = 2 <= 5
      (50L, null),   // 100 - 50 = 50 > 5: too far ahead
      (97L, "b")))   // 100 - 97 = 3 <= 5
  }

  test("forward as-of matches the window-composed equivalent on events") {
    val r = AsOf.viewToPurchase(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val w = Window.partitionBy("view_id")
      .orderBy(col("purchase_ts").asc, col("purchase_id").asc)
    val composed = views
      .join(purchases,
        views("user_id") === purchases("p_user") &&
          purchases("purchase_ts") >= views("view_ts") &&
          unix_micros(purchases("purchase_ts")) -
            unix_micros(views("view_ts")) <= 2L * 3600 * 1000 * 1000,
        "left")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("view_id"), col("user_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("micros_to_purchase"))
      .orderBy("view_id")
    assert(r.collect().map(_.toSeq).toSeq ==
      composed.collect().map(_.toSeq).toSeq)
  }

  test("null keys and timestamps never match, never crash") {
    val quotes = Seq((Some(1L), Some(10L), "a"), (None, Some(5L), "x"),
      (Some(1L), None, "y"))
      .toDF("qk", "qts", "quote")
    val trades = Seq((Some(1L), Some(20L)), (Some(1L), None), (None, Some(20L)))
      .toDF("tk", "tts")
    val got = AsOf.join(trades, quotes, "tk", "qk", "tts", "qts")
      .select("tk", "tts", "quote").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getString(2))).toSet
    assert(got == Set(
      (Some(1L), Some(20L), "a"),  // only the non-null quote matches
      (Some(1L), None, null),      // null left ts -> no match
      (None, Some(20L), null)))    // null left key -> no match
  }

  test("as-of join matches the window-composed equivalent on events") {
    val r = AsOf.purchaseAttribution(spark, sf0001)
    // reference composition: union + per-user window carrying the
    // last view forward (the plan shape the custom operator replaces)
    val ev = Tables.events(spark, sf0001)
    val tagged = ev.filter(col("event_type").isin("purchase", "view"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = tagged
      .withColumn("view_id", last(
        when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("view_ts", last(
        when(col("event_type") === "view", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("view_id"), col("view_ts"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts")))
          .as("micros_since_view"))
      .orderBy("purchase_id")
    assert(r.collect().map(_.toSeq).toSeq ==
      composed.collect().map(_.toSeq).toSeq)
  }

  test("1h-tolerance attribution: in-window last touch kept, stale ones nulled") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = events.filter(_._3 == "view")
    val got = AsOf.queries("events_asof_last_touch_1h")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    val purchases = events.filter(_._3 == "purchase")
    assert(got.size == purchases.length)
    var stale = 0
    purchases.foreach { case (pid, user, _, pts) =>
      val prior = views.filter(v => v._2 == user && v._4 <= pts)
      val want =
        if (prior.isEmpty) None
        else {
          // most recent prior view; ties by event id (exec's ordering)
          val best = prior.maxBy(v => (v._4, v._1))
          if (pts - best._4 <= 3600L * 1000 * 1000) Some(best._1) else { stale += 1; None }
        }
      assert(got(pid) == want, s"purchase $pid: got ${got(pid)}, want $want")
    }
    info(s"$stale purchases had only stale (out-of-window) views -> null")
  }

  test("physical plan: AsOfJoinExec with hash exchanges, no nested loop") {
    val df = AsOf.purchaseAttribution(spark, sf0001)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("AsOfJoin"), s)
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"as-of degraded to a quadratic join:\n$s")
  }
}
