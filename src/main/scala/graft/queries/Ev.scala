package graft.queries

import graft.{Exact, QDef, QModule}
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table — the batch expression of
  * the Structured Streaming operator set (SURVEY.md §2.9): tumbling and
  * sliding `window()`, `session_window()`, first-per-key dedup. The same
  * `TimeWindow`/`SessionWindow` expressions power the streaming module
  * (graft.streaming.Streams); batch mode gives them a DuckDB oracle, and
  * the streaming specs assert stream-equals-batch on the same input.
  *
  * Scale: window() is a per-row projection (no shuffle beyond the
  * downstream groupBy); session_window shuffles once on the session key —
  * exactly the plan you want at 100 TB.
  */
object Ev extends QModule {

  val qEvTumbling = QDef(
    "q_ev_tumbling",
    (s, d) => t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value"), 2).as("total"))
      .select(
        unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("cnt"), col("total")),
    Some(s"""
      SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us,
             event_type, COUNT(*) AS cnt,
             ${Exact.dsumSql("value", 2)} AS total
      FROM events GROUP BY 1, 2"""),
    bench = true)

  /** Sliding 1h window, 30-min slide: each event lands in two windows
    * whose starts are the two 30-min-aligned bucket offsets.
    */
  val qEvSliding = QDef(
    "q_ev_sliding",
    (s, d) => t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("cnt")),
    Some("""
      SELECT ws_us, COUNT(*) AS cnt FROM (
        SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us FROM events
        UNION ALL
        SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes')) AS ws_us FROM events)
      GROUP BY ws_us"""),
    bench = true)

  /** Session windows (30-min gap) per user. Spark merges events whose gap
    * is strictly under the timeout; the oracle's gaps-and-islands uses the
    * matching strict `<`.
    */
  val qEvSession = QDef(
    "q_ev_session",
    (s, d) => t(s, d, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value"), 2).as("total"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("ss_us"),
        col("cnt"), col("total")),
    Some(s"""
      WITH x AS (
        SELECT user_id, ts, value,
          CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
        FROM events),
      y AS (
        SELECT user_id, ts, value,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM x)
      SELECT user_id, epoch_us(MIN(ts)) AS ss_us, COUNT(*) AS cnt,
             ${Exact.dsumSql("value", 2)} AS total
      FROM y GROUP BY user_id, sid"""),
    bench = true)

  /** Dynamic-gap session windows: the gap depends on each event's own
    * attributes (purchases hold a session open 60 min, everything else
    * 30) — Spark's session_window(col, gapExpr) form. The oracle is the
    * general interval-merge islands construction: an event breaks the
    * session iff its start is at or past the RUNNING MAX of previous
    * events' (ts + gap) ends (a constant-gap lag(ts) compare is not
    * enough once gaps vary).
    */
  val qEvSessionDyn = QDef(
    "q_ev_session_dyn",
    (s, d) => t(s, d, "events")
      .groupBy(
        session_window(col("ts"),
          when(col("event_type") === "purchase", "60 minutes")
            .otherwise("30 minutes")),
        col("user_id"))
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value"), 2).as("total"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("ss_us"),
        col("cnt"), col("total")),
    Some(s"""
      WITH x AS (
        SELECT user_id, ts, value,
          ts + CASE WHEN event_type = 'purchase' THEN INTERVAL 60 MINUTE
                    ELSE INTERVAL 30 MINUTE END AS ed
        FROM events),
      y AS (
        SELECT user_id, ts, value,
          MAX(ed) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        FROM x),
      z AS (
        SELECT user_id, ts, value,
          CASE WHEN prev_end IS NULL OR ts >= prev_end THEN 1 ELSE 0 END AS brk
        FROM y),
      w AS (
        SELECT user_id, ts, value,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM z)
      SELECT user_id, epoch_us(MIN(ts)) AS ss_us, COUNT(*) AS cnt,
             ${Exact.dsumSql("value", 2)} AS total
      FROM w GROUP BY user_id, sid"""))

  /** First event per (user, type): dedup-keep-earliest as one aggregate
    * (min over a (time, id) struct = deterministic argmin, map-side
    * combinable — no window shuffle needed).
    */
  val qEvFirst = QDef(
    "q_ev_first",
    (s, d) => t(s, d, "events")
      .groupBy("user_id", "event_type")
      .agg(min(struct(unix_micros(col("ts")).as("us"), col("event_id").as("eid"))).as("m"))
      .select(
        col("user_id"), col("event_type"),
        col("m.us").as("first_us"), col("m.eid").as("first_id")),
    Some("""
      SELECT user_id, event_type,
        MIN(epoch_us(ts)) AS first_us,
        (list(event_id ORDER BY epoch_us(ts), event_id))[1] AS first_id
      FROM events GROUP BY user_id, event_type"""))

  /** Tumbling window with a startTime OFFSET (the 4-arg `window()` form):
    * hourly buckets aligned to :15 past the hour — the alignment knob for
    * business-day/timezone boundaries that don't sit on the epoch grid.
    * The oracle mirrors the bucketing arithmetically: shift by the
    * offset, hour-bucket, shift back (which IS the operator's definition,
    * so the hash match pins the alignment semantics exactly).
    */
  val qEvOffset = QDef(
    "q_ev_offset",
    (s, d) => t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour", "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("cnt")),
    Some("""
      SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts - INTERVAL '15 minutes'))
               + 900000000 AS ws_us,
             COUNT(*) AS cnt
      FROM events GROUP BY 1"""))

  /** Ordered-event funnel (view → click → purchase, strictly in time
    * order per user, each stage within 1 day of the previous) — the
    * sequential-pattern shape of product analytics (MATCH_RECOGNIZE-lite).
    * Each stage is "earliest qualifying event AFTER the previous stage's
    * time and inside its conversion deadline": per-user MIN aggregates
    * chained by equi-joins on user_id, then scalar stage counts plus the
    * exact total view→purchase conversion latency in BIGINT micros (no
    * double math, so the row is bit-identical on both engines). The
    * deadline is what makes the funnel discriminative — at sf0.01 it
    * reads 150 → 60 → 25 users.
    *
    * Scale: every join and aggregate keys on user_id — one hash
    * partitioning reused across all three stages (co-partitioned chain,
    * no re-shuffle), state per user is one timestamp per stage, and the
    * final counts are single-row scalar aggregates over user-grain rows.
    * No window-over-full-history or per-row subquery is ever planned.
    */
  private def funnelSql(dialect: String): String = {
    val us = dialect match {
      case "spark" => (e: String) => s"unix_micros($e)"
      case _       => (e: String) => s"epoch_us($e)"
    }
    s"""
      WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
                 WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t1
              AND e.ts <= v.t1 + INTERVAL 1 DAY
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t2
              AND e.ts <= c.t2 + INTERVAL 1 DAY
            GROUP BY e.user_id),
      lat AS (SELECT CAST(SUM(${us("p.t3")} - ${us("v.t1")}) AS BIGINT) AS latency_us
              FROM p JOIN v ON v.user_id = p.user_id)
      SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
             CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_after_view,
             CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel,
             (SELECT latency_us FROM lat) AS latency_us"""
  }
  val qEvFunnel = QDef(
    "q_ev_funnel",
    sqlQ(funnelSql("spark")),
    Some(funnelSql("duck")))

  val defs: Seq[QDef] = Seq(qEvTumbling, qEvSliding, qEvSession,
    qEvSessionDyn, qEvFirst, qEvOffset, qEvFunnel)
}
