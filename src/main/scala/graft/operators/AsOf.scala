package graft.operators

import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.AsOfJoinPlan

/** As-of join surface over the custom [[graft.plans.AsOfJoinPlan]]
  * operator (requires a session built with
  * `plans.GraftExtensions`, which registers the planner strategy). */
object AsOf {

  /** `left ASOF LEFT JOIN right ON left.key = right.key AND
    * left.ts >= right.ts` — each left row joined to the latest
    * same-key right row at or before its timestamp; right columns
    * null when no such row exists. Column names must be disjoint.
    *
    * `tolerance` (pandas `merge_asof` semantics): when set, a match
    * additionally requires `left.ts − right.ts <= tolerance`, in the
    * ts column's internal unit (µs for timestamps, days for dates,
    * the raw value for integral columns).
    *
    * `tieBreak`: a right-side column pinning which row wins when
    * several share the matched (key, ts) — the MAX tieBreak value,
    * matching the streaming twin's `max(struct(ts, id))` reduction.
    * Without it, ties resolve arbitrarily (callers must keep
    * (key, ts) unique per side). */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      tolerance: Option[Long] = None,
      tieBreak: Option[String] = None): DataFrame = {
    val lp = GraftShims.logicalPlan(left)
    val rp = GraftShims.logicalPlan(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(", ")}"))
    GraftShims.dataFrame(left.sparkSession,
      AsOfJoinPlan(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTs), attr(rp, rightTs), tolerance,
        tieBreak.map(attr(rp, _))))
  }

  /** FORWARD as-of: each left row joined to the EARLIEST same-key
    * right row at or AFTER its timestamp — the time-to-event join
    * (next purchase after a view, next failure after a deploy).
    * Reuses the backward merge-scan unchanged by running it over
    * NEGATED microsecond timestamps: the latest `−r ≤ −l` is exactly
    * the earliest `r ≥ l`, and the tolerance bound `−l − (−r) ≤ t`
    * is exactly `r − l ≤ t`. Costs two projections, zero new
    * operator code. */
  def joinForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      tolerance: Option[Long] = None,
      tieBreak: Option[String] = None): DataFrame = {
    // negate in the column's internal unit: µs for timestamps, the
    // raw value for integral ts columns (mirrors `join`'s contract).
    // tieBreak stays un-negated: among equal-ts candidates the MAX
    // tie value wins in either direction.
    def neg(df: DataFrame, ts: String) = df.schema(ts).dataType match {
      case org.apache.spark.sql.types.TimestampType => -unix_micros(col(ts))
      case _ => -col(ts)
    }
    val l = left.withColumn("__neg_lts", neg(left, leftTs))
    val r = right.withColumn("__neg_rts", neg(right, rightTs))
    join(l, r, leftKey, rightKey, "__neg_lts", "__neg_rts", tolerance,
        tieBreak)
      .drop("__neg_lts", "__neg_rts")
  }

  private val ConversionToleranceMicros = 2L * 3600 * 1000 * 1000

  /** Time-to-conversion: each view as-of joined FORWARD to the user's
    * next purchase within 2 hours — the funnel-latency readout (how
    * long from view to buy), null for views that never converted in
    * window. Same custom operator, opposite direction. */
  def viewToPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    joinForward(views, purchases, "user_id", "p_user", "view_ts",
        "purchase_ts", Some(ConversionToleranceMicros),
        tieBreak = Some("purchase_id"))
      .select(col("view_id"), col("user_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("micros_to_purchase"))
      .orderBy("view_id")
  }

  /** Attribution query: each purchase event as-of joined to the
    * user's most recent prior (or simultaneous) `view` event, with
    * the elapsed microseconds — the "last touch before conversion"
    * join every event pipeline runs, impossible in one pass with
    * stock Spark operators. DuckDB's native `ASOF LEFT JOIN` is the
    * oracle. */
  def purchaseAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    join(purchases, views, "user_id", "v_user", "purchase_ts", "view_ts",
        tieBreak = Some("view_id"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("micros_since_view"))
      .orderBy("purchase_id")
  }

  private val AttributionToleranceMicros = 1L * 3600 * 1000 * 1000

  /** [[purchaseAttribution]] bounded by a 1-hour tolerance — the
    * third face of the custom operator (backward + tolerance; the
    * forward query exercises tolerance on the negated axis). A
    * purchase whose most recent prior view is older than the bound
    * attributes to NOTHING (null right side): with backward as-of
    * the most recent prior row is the ONLY candidate, so an
    * out-of-window most-recent means no in-window match exists —
    * which is why the oracle can state tolerance as a post-filter
    * on DuckDB's native ASOF result. */
  def purchaseAttributionRecent(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    join(purchases, views, "user_id", "v_user", "purchase_ts", "view_ts",
        Some(AttributionToleranceMicros), tieBreak = Some("view_id"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("micros_since_view"))
      .orderBy("purchase_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_attribution" -> (purchaseAttribution _),
    "events_asof_next_purchase" -> (viewToPurchase _),
    "events_asof_last_touch_1h" -> (purchaseAttributionRecent _),
  )

  val oracleSql: Map[String, String] = Map(
    // tolerance as post-filter on native ASOF: an out-of-window
    // most-recent view means no in-window view exists at all
    "events_asof_last_touch_1h" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |    FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS v_user, event_id AS view_id, ts AS view_ts
        |    FROM events WHERE event_type = 'view'),
        |a AS (SELECT purchase_id, user_id, purchase_ts, view_id, view_ts
        |  FROM p ASOF LEFT JOIN v
        |    ON p.user_id = v.v_user AND p.purchase_ts >= v.view_ts),
        |t AS (SELECT purchase_id, user_id, purchase_ts,
        |    CASE WHEN view_ts >= purchase_ts - INTERVAL 1 HOUR
        |         THEN view_id END AS view_id,
        |    CASE WHEN view_ts >= purchase_ts - INTERVAL 1 HOUR
        |         THEN view_ts END AS view_ts
        |  FROM a)
        |SELECT purchase_id, user_id, purchase_ts, view_id, view_ts,
        |  epoch_us(purchase_ts) - epoch_us(view_ts) AS micros_since_view
        |FROM t ORDER BY purchase_id""".stripMargin,

    "events_asof_attribution" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |    FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS v_user, event_id AS view_id, ts AS view_ts
        |    FROM events WHERE event_type = 'view')
        |SELECT purchase_id, user_id, purchase_ts, view_id, view_ts,
        |  epoch_us(purchase_ts) - epoch_us(view_ts) AS micros_since_view
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.v_user AND p.purchase_ts >= v.view_ts
        |ORDER BY purchase_id""".stripMargin,

    // DuckDB's native ASOF is backward-only, so the forward oracle
    // states the semantics directly: earliest in-window purchase per
    // view via a LEFT JOIN + rank-1 filter (a lone null row ranks 1)
    "events_asof_next_purchase" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
        |    FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id AS p_user, event_id AS purchase_id,
        |    ts AS purchase_ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT v.view_id, v.user_id, v.view_ts, p.purchase_id,
        |    p.purchase_ts,
        |    row_number() OVER (PARTITION BY v.view_id
        |      ORDER BY p.purchase_ts, p.purchase_id) AS rk
        |  FROM v LEFT JOIN p ON p.p_user = v.user_id
        |    AND p.purchase_ts >= v.view_ts
        |    AND p.purchase_ts <= v.view_ts + INTERVAL 2 HOUR)
        |SELECT view_id, user_id, view_ts, purchase_id, purchase_ts,
        |  epoch_us(purchase_ts) - epoch_us(view_ts) AS micros_to_purchase
        |FROM c WHERE rk = 1 ORDER BY view_id""".stripMargin,
  )
}
