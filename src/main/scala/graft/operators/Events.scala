package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Graft

/** Event-stream operators (batch twins of the streaming versions in
  * `graft.streaming`): tumbling-window aggregation and gap-based
  * sessionization.
  *
  * `events.ts` arrives from Graft.events as long epoch-nanoseconds whatever
  * the physical parquet type; operators normalize to epoch seconds with exact
  * integer arithmetic (never double-divide an int64 nanosecond value —
  * doubles lose precision above 2^53).
  */
object Events {

  /** events with ts as epoch seconds (exact integer division). */
  private def withSec(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir).withColumn("sec", expr("ts div 1000000000"))

  /** Tumbling 1-hour windows per event type: count + summed value.
    * Streaming twin: `graft.streaming.EventStreams.hourly`.
    */
  def hourly(s: SparkSession, dir: String): DataFrame =
    withSec(s, dir)
      .groupBy(expr("(sec div 3600) * 3600").as("hour_sec"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))

  /** Gap-based sessionization (30-min inactivity gap) via lag + running sum.
    * Streaming twin uses flatMapGroupsWithState; the batch form is two
    * windows over the same (user_id, time) partitioning — a single shuffle.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    withSec(s, dir)
      .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("sec")).as("start_sec"),
        max(col("sec")).as("end_sec"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** As-of join: each purchase matched to the user's most recent prior
    * (or same-instant-earlier-id) click. Expressed as ONE ordered window
    * with a conditional last-non-null — the scalable as-of pattern: no
    * per-row range probe, no self-join; a single shuffle on user_id.
    */
  def asofClickPurchase(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    withSec(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("prior_click",
        last(when(col("event_type") === "click", col("sec")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("prior_click").isNotNull)
      .select(col("user_id"), col("event_id"), col("sec").as("purchase_sec"), col("prior_click"))
  }

  /** Per-event-type top-n events by value through the custom TopKPerKey
    * plan (bounded per-key heaps, no per-group sort) — the same physical
    * operator that serves per-document chunk top-k, on a second domain.
    */
  def topEventsPlan(s: SparkSession, dir: String, n: Int = 3): DataFrame =
    graft.plans.TopKPerKey(
      withSec(s, dir).select(col("event_type"), col("event_id"), col("sec"), col("value")),
      Seq("event_type"), Seq(("value", false), ("event_id", true)), n)

  /** Interval attribution join: every click in the 30 minutes strictly
    * before each purchase by the same user — the BATCH twin of the
    * stream-stream interval join spec (`StreamingSpec`), which bounds
    * the same semantics with watermark state. Both sides shuffle once
    * on user_id (equi key); the time range is the join residual, so
    * pairwise work is per-user, never global. Timestamps compare in
    * exact integer nanoseconds.
    */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val e = Graft.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("cts"))
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
        col("cts") >= col("pts") - lit(1800L * 1000000000L) &&
        col("cts") < col("pts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        expr("(pts - cts) div 1000000000").as("lag_sec"))
  }

  /** Session-length distribution: for each session size (event count),
    * how many sessions and their mean duration — the product-analytics
    * rollup over [[sessionize]]'s output. The second aggregate's input
    * is one row per session (already the small side); the mean is exact
    * integer micros on the epoch-second grid.
    */
  def sessionStats(s: SparkSession, dir: String): DataFrame =
    sessionize(s, dir)
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("end_sec") - col("start_sec")).as("sum_dur_sec"))
      .select(col("n_events"), col("n_sessions"), col("sum_dur_sec"),
        expr("sum_dur_sec * 1000000 div n_sessions").as("mean_dur_micros"))

  val oracle: Map[String, String] = Map(
    "events_session_stats" ->
      """WITH e AS (SELECT event_id, user_id,
        |   CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |l AS (SELECT *, lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_sec FROM e),
        |n AS (SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_session FROM l),
        |sid AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM n),
        |ses AS (SELECT user_id, session_id, count(*) AS n_events,
        |  max(sec) - min(sec) AS dur FROM sid GROUP BY 1, 2)
        |SELECT n_events, count(*) AS n_sessions,
        | CAST(sum(dur) AS BIGINT) AS sum_dur_sec,
        | CAST(sum(dur) AS BIGINT) * 1000000 // count(*) AS mean_dur_micros
        |FROM ses GROUP BY 1""".stripMargin,
    "events_attribution" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        | (epoch_ns(p.ts) - epoch_ns(c.ts)) // 1000000000 AS lag_sec
        |FROM events p JOIN events c ON p.user_id = c.user_id
        | AND epoch_ns(c.ts) >= epoch_ns(p.ts) - 1800::BIGINT * 1000000000
        | AND epoch_ns(c.ts) < epoch_ns(p.ts)
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'""".stripMargin,
    "events_topk_plan" ->
      """SELECT event_type, event_id, sec, value FROM (
        | SELECT event_type, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        | FROM events)
        |WHERE rn <= 3""".stripMargin,
    "events_asof" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |   CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |l AS (SELECT *, last_value(CASE WHEN event_type = 'click' THEN sec END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY sec, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_click FROM e)
        |SELECT user_id, event_id, sec AS purchase_sec, prior_click
        |FROM l WHERE event_type = 'purchase' AND prior_click IS NOT NULL""".stripMargin,
    "events_hourly" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_sec,
        | event_type, count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |   CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |l AS (SELECT *, lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_sec FROM e),
        |n AS (SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_session FROM l),
        |sid AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM n)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(sec) AS start_sec, max(sec) AS end_sec, round(sum(value),2) AS sum_value
        |FROM sid GROUP BY user_id, session_id""".stripMargin,
  )
}
