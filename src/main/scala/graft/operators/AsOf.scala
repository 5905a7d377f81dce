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
    * the raw value for integral columns). */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      tolerance: Option[Long] = None): DataFrame = {
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
        attr(lp, leftTs), attr(rp, rightTs), tolerance))
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
    join(purchases, views, "user_id", "v_user", "purchase_ts", "view_ts")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("micros_since_view"))
      .orderBy("purchase_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_attribution" -> (purchaseAttribution _),
  )

  val oracleSql: Map[String, String] = Map(
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
  )
}
