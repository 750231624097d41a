package graft.queries

import graft.{Exact, QDef, QModule}
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2.3): all join-type strings, broadcast hints
  * for dimension tables, theta joins, plus the as-of and range joins the
  * reference lacks as first-class operators (implemented shuffle-friendly:
  * union+window and bucketed equi-join — no cartesian blowup at 100 TB).
  */
object Joins extends QModule {

  val qJoinInner = QDef(
    "q_join_inner",
    (s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer"); val n = t(s, d, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(Exact.dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("num_orders"))
    },
    Some(s"""
      SELECT n_name, ${Exact.dsumSql("o_totalprice")} AS revenue, COUNT(*) AS num_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name"""),
    bench = true)

  val qJoinMulti = QDef(
    "q_join_multi",
    (s, d) => {
      val l = t(s, d, "lineitem")
      val sup = t(s, d, "supplier"); val n = t(s, d, "nation"); val r = t(s, d, "region")
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(Exact.dsum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n_items"))
    },
    Some(s"""
      SELECT r_name, ${Exact.dsumSql("l_extendedprice")} AS revenue, COUNT(*) AS n_items
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name"""),
    bench = true)

  val qJoinLeft = QDef(
    "q_join_left",
    (s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(Exact.dsum(col("o_totalprice")), lit(0.0)).as("spent"))
    },
    Some(s"""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
             COALESCE(${Exact.dsumSql("o_totalprice")}, 0.0) AS spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey"""),
    bench = true)

  val qJoinRight = QDef(
    "q_join_right",
    (s, d) => {
      val l = t(s, d, "lineitem"); val sup = t(s, d, "supplier")
      l.join(sup, l("l_suppkey") === sup("s_suppkey"), "right")
        .groupBy("s_suppkey")
        .agg(count(col("l_orderkey")).as("n_items"))
    },
    Some("""
      SELECT s_suppkey, COUNT(l_orderkey) AS n_items
      FROM lineitem RIGHT JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_suppkey"""))

  val qJoinFull = QDef(
    "q_join_full",
    (s, d) => {
      val cn = t(s, d, "customer").groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("ccnt"))
      val sn = t(s, d, "supplier").groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("scnt"))
      cn.join(sn, cn("ck") === sn("sk"), "full")
        .select(
          coalesce(cn("ck"), sn("sk")).as("n_key"),
          coalesce(col("ccnt"), lit(0L)).as("ccnt"),
          coalesce(col("scnt"), lit(0L)).as("scnt"))
    },
    Some("""
      SELECT COALESCE(a.ck, b.sk) AS n_key,
             COALESCE(ccnt, 0) AS ccnt, COALESCE(scnt, 0) AS scnt
      FROM (SELECT c_nationkey AS ck, COUNT(*) AS ccnt FROM customer GROUP BY 1) a
      FULL JOIN (SELECT s_nationkey AS sk, COUNT(*) AS scnt FROM supplier GROUP BY 1) b
        ON a.ck = b.sk"""))

  val qJoinSemi = QDef(
    "q_join_semi",
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')"""))

  val qJoinAnti = QDef(
    "q_join_anti",
    (s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
    },
    Some("""
      SELECT c_custkey, c_acctbal FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  val qJoinCross = QDef(
    "q_join_cross",
    (s, d) => {
      val a = t(s, d, "region").select(col("r_name").as("a_name"))
      val b = t(s, d, "region").select(col("r_name").as("b_name"))
      a.crossJoin(b)
    },
    Some("""
      SELECT a.r_name AS a_name, b.r_name AS b_name
      FROM region a CROSS JOIN region b"""))

  val qJoinTheta = QDef(
    "q_join_theta",
    (s, d) => {
      val a = t(s, d, "nation")
        .select(col("n_nationkey").as("ak"), col("n_name").as("a_nation"), col("n_regionkey").as("ar"))
      val b = t(s, d, "nation")
        .select(col("n_nationkey").as("bk"), col("n_name").as("b_nation"), col("n_regionkey").as("br"))
      a.join(b, col("ar") === col("br") && col("ak") < col("bk"))
        .select("a_nation", "b_nation")
    },
    Some("""
      SELECT a.n_name AS a_nation, b.n_name AS b_nation
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey"""))

  /** As-of join: for each purchase, the latest prior click of the same
    * user ([[graft.operators.AsOf]] — one shuffle, no range explosion).
    */
  val qJoinAsof = QDef(
    "q_join_asof",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("click_us"))
      AsOf.joinLast(purchases, clicks, "user_id", "ts", "ts", "click_us", "last_click_us")
        .select("event_id", "last_click_us")
    },
    Some("""
      SELECT p.event_id,
             (SELECT epoch_us(MAX(c.ts)) FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p.user_id
                AND c.ts <= p.ts) AS last_click_us
      FROM events p WHERE p.event_type = 'purchase'"""),
    bench = true)

  /** As-of join with tolerance: same as q_join_asof but the match is
    * nulled when the latest prior click is more than one hour stale
    * (pandas merge_asof `tolerance` semantics, [[AsOf.joinLastWithin]]).
    */
  val qJoinAsofTol = QDef(
    "q_join_asof_tol",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("click_us"))
      AsOf.joinLastWithin(purchases, clicks, "user_id", "ts", "ts", "click_us",
          "last_click_us", 3600000000L)
        .select("event_id", "last_click_us")
    },
    Some("""
      SELECT p.event_id,
             (SELECT epoch_us(MAX(c.ts)) FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p.user_id
                AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR) AS last_click_us
      FROM events p WHERE p.event_type = 'purchase'"""))

  /** Forward as-of join: each purchase attached to the user's NEXT click
    * at-or-after it (pandas merge_asof direction='forward',
    * [[AsOf.joinNext]]) — the "time-to-next-action" primitive, same
    * single-shuffle plan as the backward form.
    */
  val qJoinAsofFwd = QDef(
    "q_join_asof_fwd",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("click_us"))
      AsOf.joinNext(purchases, clicks, "user_id", "ts", "ts", "click_us", "next_click_us")
        .select("event_id", "next_click_us")
    },
    Some("""
      SELECT p.event_id,
             (SELECT epoch_us(MIN(c.ts)) FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p.user_id
                AND c.ts >= p.ts) AS next_click_us
      FROM events p WHERE p.event_type = 'purchase'"""))

  /** Nearest as-of join: each purchase attached to the user's click
    * CLOSEST in time in either direction, ties to the prior click
    * (pandas merge_asof direction='nearest', [[AsOf.joinNearest]]) —
    * both direction candidates come from two frames over ONE sorted
    * exchange. Oracle: correlated min-distance lookup with the same
    * backward tiebreak.
    */
  val qJoinAsofNear = QDef(
    "q_join_asof_near",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("click_us"))
      AsOf.joinNearest(purchases, clicks, "user_id", "ts", "ts", "click_us",
          "near_click_us")
        .select("event_id", "near_click_us")
    },
    Some("""
      SELECT p.event_id,
             (SELECT epoch_us(c.ts) FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p.user_id
              ORDER BY ABS(epoch_us(c.ts) - epoch_us(p.ts)),
                       (CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END)
              LIMIT 1) AS near_click_us
      FROM events p WHERE p.event_type = 'purchase'"""))

  /** Range (interval) join via bucketed equi-join: candidates meet on
    * (user, 10-min bucket) ∪ (user, bucket+1), then the exact range filter
    * — shuffle-friendly; candidate fan-out is bounded by bucket width.
    */
  val qJoinRange = QDef(
    "q_join_range",
    (s, d) => {
      val ev = t(s, d, "events")
      val us = unix_micros(col("ts"))
      val bucket = 600000000L // 10 min in micros
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), us.as("p_us"))
        .withColumn("pb", expr("p_us div 600000000"))
        .withColumn("jb", explode(array(col("pb"), col("pb") + 1)))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), us.as("c_us"))
        .withColumn("cb", expr("c_us div 600000000"))
      p.join(c,
          p("user_id") === c("c_uid") && p("jb") === c("cb") &&
            c("c_us") >= p("p_us") && c("c_us") <= p("p_us") + lit(bucket),
          "left")
        .groupBy("event_id")
        .agg(count(col("c_uid")).as("clicks_10m"))
    },
    Some("""
      SELECT p.event_id,
             (SELECT COUNT(*) FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p.user_id
                AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE) AS clicks_10m
      FROM events p WHERE p.event_type = 'purchase'"""),
    bench = true)

  val defs: Seq[QDef] = Seq(
    qJoinInner, qJoinMulti, qJoinLeft, qJoinRight, qJoinFull, qJoinSemi,
    qJoinAnti, qJoinCross, qJoinTheta, qJoinAsof, qJoinAsofTol, qJoinAsofFwd,
    qJoinAsofNear, qJoinRange)
}
