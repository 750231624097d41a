package graft.queries

import graft.{Exact, QDef, QModule}

/** Second TPC-DS-shape batch (Q88/Q38/Q51/Q97), complementing the three in
  * [[Pipeline]] (Q1/Q27/Q64) with the planner paths those don't touch:
  * many independent filtered scalar scans of one fact (Q88), an INTERSECT
  * chain of derived key sets (Q38), a window over a FULL OUTER join of two
  * aggregated streams (Q51), and key-overlap classification across two
  * derived profiles (Q97). Reference suite:
  * `/root/reference/sql/core/src/test/resources/tpcds/q88.sql`, `q38.sql`,
  * `q51.sql`, `q97.sql` — shapes adapted to the fixture star schema
  * (FIXTURES.md §1). Same Spark∩DuckDB SQL text serves as query and oracle.
  */
object Tpcds2 extends QModule {

  /** TPC-DS Q88 shape: eight disjoint quantity-band counts of the same
    * fact, each an independent scalar subquery, cross-joined into one row.
    * The scale story: each band is a pushed-filter scan + partial count —
    * eight SMALL scalar results whose "joins" are 1×1-row broadcasts;
    * nothing shuffles the fact. (The stock TPC-DS plan re-scans per band;
    * a shared-scan rewrite via CASE pivots is the q_tpch_q12 pattern,
    * declared there.)
    */
  private val q88Sql = """
      SELECT * FROM
       (SELECT COUNT(*) AS h1 FROM lineitem WHERE l_quantity BETWEEN 1 AND 5) s1,
       (SELECT COUNT(*) AS h2 FROM lineitem WHERE l_quantity BETWEEN 6 AND 10) s2,
       (SELECT COUNT(*) AS h3 FROM lineitem WHERE l_quantity BETWEEN 11 AND 15) s3,
       (SELECT COUNT(*) AS h4 FROM lineitem WHERE l_quantity BETWEEN 16 AND 20) s4,
       (SELECT COUNT(*) AS h5 FROM lineitem WHERE l_quantity BETWEEN 21 AND 25) s5,
       (SELECT COUNT(*) AS h6 FROM lineitem WHERE l_quantity BETWEEN 26 AND 30) s6,
       (SELECT COUNT(*) AS h7 FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) s7,
       (SELECT COUNT(*) AS h8 FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) s8"""
  val qTpcdsQ88 = QDef("q_tpcds_q88", sqlQ(q88Sql), Some(q88Sql))

  /** TPC-DS Q38 shape: customers present in ALL three "channels" — an
    * INTERSECT chain of derived key sets, then a global count. Each
    * INTERSECT plans as a distinct-aggregated semi join on the key, so the
    * shuffle carries only c_custkey, never order payloads.
    */
  private val q38Sql = """
      SELECT COUNT(*) AS hot_cust FROM (
        SELECT c_custkey FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        INTERSECT
        SELECT c_custkey FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT c_custkey FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_totalprice > 30000.0) hot"""
  val qTpcdsQ38 = QDef("q_tpcds_q38", sqlQ(q38Sql), Some(q38Sql))

  /** TPC-DS Q51 shape: two monthly aggregated streams (order value vs
    * shipped revenue) FULL OUTER joined on month, then a running MAX
    * window over the joined rows and a cross-stream comparison. The
    * window is global but runs over ~84 MONTH rows (grain = months, not
    * facts) — bounded at any data scale, so the single-partition window
    * is safe here, unlike over raw rows (see SCALE.md on q_win_ntile).
    */
  private val q51Sql = s"""
      WITH web AS (
        SELECT CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS INT) AS ym,
               CAST(${Exact.usumSql("o_totalprice", 2)} AS DOUBLE) / 1e2 AS v
        FROM orders GROUP BY CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS INT)),
      store AS (
        SELECT CAST(YEAR(l_shipdate) * 100 + MONTH(l_shipdate) AS INT) AS ym,
               CAST(${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS DOUBLE) / 1e4 AS v
        FROM lineitem GROUP BY CAST(YEAR(l_shipdate) * 100 + MONTH(l_shipdate) AS INT))
      SELECT ym, web_cum, store_cum
      FROM (SELECT COALESCE(web.ym, store.ym) AS ym,
                   MAX(web.v) OVER (ORDER BY COALESCE(web.ym, store.ym)
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS web_cum,
                   MAX(store.v) OVER (ORDER BY COALESCE(web.ym, store.ym)
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_cum
            FROM web FULL OUTER JOIN store ON web.ym = store.ym) x
      WHERE web_cum > store_cum ORDER BY ym"""
  val qTpcdsQ51 = QDef("q_tpcds_q51", sqlQ(q51Sql), Some(q51Sql))

  /** TPC-DS Q97 shape: key-overlap classification — two DISTINCT-key
    * purchase profiles FULL OUTER joined, counting left-only/right-only/
    * both. The profiles pre-shrink to distinct keys before the join, so
    * the outer join input is #customers, not #orders.
    */
  private val q97Sql = """
      WITH first_half AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'),
      second_half AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01')
      SELECT COUNT(CASE WHEN f.k IS NOT NULL AND s.k IS NULL THEN 1 END) AS early_only,
             COUNT(CASE WHEN f.k IS NULL AND s.k IS NOT NULL THEN 1 END) AS late_only,
             COUNT(CASE WHEN f.k IS NOT NULL AND s.k IS NOT NULL THEN 1 END) AS both_halves
      FROM first_half f FULL OUTER JOIN second_half s ON f.k = s.k"""
  val qTpcdsQ97 = QDef("q_tpcds_q97", sqlQ(q97Sql), Some(q97Sql))

  /** TPC-DS Q74 shape: year-over-year growth — ONE per-(customer, year)
    * aggregate CTE self-joined on the key with different year bindings,
    * then a ratio filter. The CTE materializes once per reference under
    * exchange reuse; units stay exact BIGINT until the final division
    * (denominator is a positive money sum — never zero).
    */
  private val q74Sql = s"""
      WITH yt AS (
        SELECT o_custkey AS k, CAST(YEAR(o_orderdate) AS INT) AS yr,
               ${Exact.usumSql("o_totalprice", 2)} AS units
        FROM orders WHERE CAST(YEAR(o_orderdate) AS INT) IN (1997, 1998)
        GROUP BY o_custkey, CAST(YEAR(o_orderdate) AS INT))
      SELECT t1.k AS c_key, CAST(t2.units AS DOUBLE) / CAST(t1.units AS DOUBLE) AS growth
      FROM yt t1 JOIN yt t2 ON t1.k = t2.k
      WHERE t1.yr = 1997 AND t2.yr = 1998 AND t2.units > t1.units
      ORDER BY c_key"""
  val qTpcdsQ74 = QDef("q_tpcds_q74", sqlQ(q74Sql), Some(q74Sql))

  /** TPC-DS Q23 shape: frequent items × best customers — two aggregate
    * CTEs feeding IN-subqueries over the fact join, one of them gated by
    * an uncorrelated scalar over its own CTE (half of max spend). Both
    * INs plan as semi joins on bare keys; the threshold compare stays in
    * exact units.
    */
  private val q23Sql = s"""
      WITH spend AS (
        SELECT o_custkey AS k, ${Exact.usumSql("o_totalprice", 2)} AS units
        FROM orders GROUP BY o_custkey),
      freq AS (
        SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 40)
      SELECT ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS freq_big_revenue
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_partkey IN (SELECT l_partkey FROM freq)
        AND o_custkey IN (SELECT k FROM spend
                          WHERE units > (SELECT CAST(FLOOR(CAST(MAX(units) AS DOUBLE) * 0.5) AS BIGINT)
                                         FROM spend))"""
  val qTpcdsQ23 = QDef("q_tpcds_q23", sqlQ(q23Sql), Some(q23Sql))

  /** TPC-DS Q93 shape: returns-adjusted supplier revenue — the fact table
    * LEFT-joined to its own returned subset on the (orderkey, linenumber)
    * natural key, matched rows discounted, then grouped. Stresses the
    * self outer join + conditional aggregation path; at scale both sides
    * shuffle on the same compound key, so AQE plans one co-partitioned
    * sort-merge.
    */
  private val q93Sql = s"""
      SELECT l_suppkey,
             ${Exact.dsumSql("CASE WHEN r.rok IS NOT NULL THEN l.l_extendedprice * (1 - l.l_discount) * 0.5 ELSE l.l_extendedprice * (1 - l.l_discount) END", 4)} AS net_revenue
      FROM lineitem l LEFT JOIN (
        SELECT l_orderkey AS rok, l_linenumber AS rln FROM lineitem WHERE l_returnflag = 'R') r
        ON l.l_orderkey = r.rok AND l.l_linenumber = r.rln
      GROUP BY l_suppkey ORDER BY l_suppkey"""
  val qTpcdsQ93 = QDef("q_tpcds_q93", sqlQ(q93Sql), Some(q93Sql))

  /** TPC-DS Q47 shape: anomalous months — lag/lead windows AND an
    * unordered per-key aggregate window over the SAME aggregated monthly
    * series, compared against the per-key average. One shuffle builds the
    * monthly grain; all three window frames then share one partitioning
    * (sk) — no second exchange. The average is exact-sum/count, a single
    * double division per row.
    */
  private val q47Sql = s"""
      WITH monthly AS (
        SELECT l_suppkey AS sk,
               CAST(YEAR(l_shipdate) * 100 + MONTH(l_shipdate) AS INT) AS ym,
               ${Exact.usumSql("l_extendedprice", 2)} AS units
        FROM lineitem
        GROUP BY l_suppkey, CAST(YEAR(l_shipdate) * 100 + MONTH(l_shipdate) AS INT))
      SELECT sk, ym, v, avg_v, prev_v, next_v
      FROM (SELECT sk, ym, CAST(units AS DOUBLE) / 1e2 AS v,
                   CAST(CAST(SUM(units) OVER (PARTITION BY sk) AS BIGINT) AS DOUBLE)
                     / (1e2 * COUNT(*) OVER (PARTITION BY sk)) AS avg_v,
                   CAST(CAST(LAG(units) OVER (PARTITION BY sk ORDER BY ym) AS BIGINT) AS DOUBLE) / 1e2 AS prev_v,
                   CAST(CAST(LEAD(units) OVER (PARTITION BY sk ORDER BY ym) AS BIGINT) AS DOUBLE) / 1e2 AS next_v
            FROM monthly) x
      WHERE v > 1.2 * avg_v
      ORDER BY sk, ym"""
  val qTpcdsQ47 = QDef("q_tpcds_q47", sqlQ(q47Sql), Some(q47Sql))

  /** TPC-DS Q34 shape: count-band entities — an aggregate HAVING a
    * BETWEEN band, joined back to the dim for display columns. The freq
    * aggregate shrinks the join input to qualifying keys only.
    */
  private val q34Sql = """
      SELECT c_custkey, c_name, cnt
      FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
            GROUP BY o_custkey HAVING COUNT(*) BETWEEN 5 AND 10) freq
      JOIN customer ON c_custkey = o_custkey
      ORDER BY c_custkey"""
  val qTpcdsQ34 = QDef("q_tpcds_q34", sqlQ(q34Sql), Some(q34Sql))

  /** TPC-DS Q59 shape: week-over-week — ONE weekly aggregate CTE
    * self-joined at a 52-week offset, ratio of exact unit sums. The week
    * id is computed from epoch micros so both engines bucket identically
    * (fixture timestamps are UTC wall times; the function name differs
    * per dialect, hence split texts).
    */
  private def q59Text(epochUs: String) = s"""
      WITH weekly AS (
        SELECT l_suppkey AS sk,
               CAST(FLOOR(CAST($epochUs AS DOUBLE) / (7.0 * 86400 * 1e6)) AS BIGINT) AS wk,
               ${Exact.usumSql("l_extendedprice", 2)} AS units
        FROM lineitem GROUP BY 1, 2)
      SELECT a.sk, a.wk AS wk1,
             CAST(a.units AS DOUBLE) / CAST(b.units AS DOUBLE) AS yoy
      FROM weekly a JOIN weekly b ON a.sk = b.sk AND b.wk = a.wk - 52
      ORDER BY a.sk, wk1"""
  val qTpcdsQ59 = QDef(
    "q_tpcds_q59",
    sqlQ(q59Text("unix_micros(CAST(l_shipdate AS TIMESTAMP))")),
    Some(q59Text("epoch_us(l_shipdate)")))

  /** TPC-DS Q33 shape: three filtered per-key aggregates UNION ALL'd as
    * "channels", then re-aggregated with an all-channels HAVING — the
    * union-of-aggregates planner path (each branch keeps its own
    * partial→final pipeline before the final shuffle on k).
    */
  private val q33Sql = s"""
      WITH x AS (
        SELECT 'urgent' AS channel, o_custkey AS k, ${Exact.usumSql("o_totalprice", 2)} AS units
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
        UNION ALL
        SELECT 'open' AS channel, o_custkey AS k, ${Exact.usumSql("o_totalprice", 2)} AS units
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
        UNION ALL
        SELECT 'big' AS channel, o_custkey AS k, ${Exact.usumSql("o_totalprice", 2)} AS units
        FROM orders WHERE o_totalprice > 200000.0 GROUP BY o_custkey)
      SELECT k, COUNT(*) AS n_channels, CAST(SUM(units) AS BIGINT) AS total_units
      FROM x GROUP BY k HAVING COUNT(*) = 3 ORDER BY k"""
  val qTpcdsQ33 = QDef("q_tpcds_q33", sqlQ(q33Sql), Some(q33Sql))

  val defs: Seq[QDef] = Seq(qTpcdsQ88, qTpcdsQ38, qTpcdsQ51, qTpcdsQ97,
    qTpcdsQ74, qTpcdsQ23, qTpcdsQ93, qTpcdsQ47, qTpcdsQ34, qTpcdsQ59,
    qTpcdsQ33)
}
