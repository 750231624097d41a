package graft.queries

import graft.{Exact, QDef, QModule}

/** Fourth TPC-DS-shape batch (Q14/Q95/Q78/Q35), covering the planner
  * paths batches 1–3 still miss: INTERSECT-chain item qualification
  * feeding a fact aggregate (Q14), a double-EXISTS qualification with a
  * global distinct rollup (Q95), a cross-"channel" grain left join with
  * COALESCE-zero band filtering (Q78), and EXISTS + IN-subquery customer
  * qualification under a stacked multi-aggregate (Q35). Reference suite:
  * `/root/reference/sql/core/src/test/resources/tpcds/q14a.sql`,
  * `q95.sql`, `q78.sql`, `q35.sql` — shapes adapted to the fixture star
  * schema (FIXTURES.md §1; the fixture has one fact table, so "channels"
  * map to `l_returnflag` / return status). Same Spark∩DuckDB SQL text
  * serves as query and oracle; money stays in exact BIGINT units
  * ([[Exact.usumSql]]) until one final division.
  */
object Tpcds4 extends QModule {

  /** TPC-DS Q14 shape: cross-channel items via INTERSECT — parts that
    * sold under ALL THREE return flags qualify, then brand revenue is
    * computed over only those parts. Each INTERSECT leg plans as a
    * distinct-then-semi-join on the part key (never the fact rows), the
    * IN-subquery decorrelates to one more semi join, and the dims
    * broadcast: at 100× the only big exchanges are the three key-set
    * distincts, each carrying a single BIGINT column.
    */
  private val q14Sql = s"""
      WITH cross_items AS (
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
      SELECT p_brand, COUNT(*) AS n_sales,
             CAST(${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS DOUBLE) / 1e4 AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
      GROUP BY p_brand
      ORDER BY p_brand"""
  val qTpcdsQ14 = QDef("q_tpcds_q14", sqlQ(q14Sql), Some(q14Sql), bench = true)

  /** TPC-DS Q95 shape: orders fulfilled by more than one supplier that
    * also had a return — both conditions as EXISTS subqueries over the
    * fact itself (decorrelated to two semi joins on `l_orderkey`), rolled
    * up to a single (distinct orders, kept lines, net revenue) row. The
    * distinct count runs on the already-semi-joined fact, so the heavy
    * Expand rewrite never sees unqualified rows.
    */
  private val q95Sql = s"""
      SELECT COUNT(DISTINCT l1.l_orderkey) AS order_cnt,
             COUNT(*) AS line_cnt,
             CAST(${Exact.usumSql("l1.l_extendedprice * (1 - l1.l_discount)", 4)} AS DOUBLE) / 1e4 AS net_rev
      FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE YEAR(o_orderdate) = 1997
        AND l1.l_returnflag <> 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_returnflag = 'R')"""
  val qTpcdsQ95 = QDef("q_tpcds_q95", sqlQ(q95Sql), Some(q95Sql))

  /** TPC-DS Q78 shape: per (customer, year) purchases left-joined to the
    * "return channel" at the same grain, COALESCE-zeroed where absent,
    * keeping loyal customer-years (returns under 10% of purchases by
    * cross-multiplied exact units — no division, no float compare). Both
    * sides aggregate to the same (customer, year) grain before the join,
    * so the join input is bounded by customers × years, not facts.
    */
  private val q78Sql = s"""
      WITH bought AS (
        SELECT o_custkey AS cust, CAST(YEAR(o_orderdate) AS INT) AS yr,
               ${Exact.usumSql("o_totalprice", 2)} AS buy_units,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey, CAST(YEAR(o_orderdate) AS INT)),
      returned AS (
        SELECT o_custkey AS cust, CAST(YEAR(o_orderdate) AS INT) AS yr,
               ${Exact.usumSql("l_extendedprice", 2)} AS ret_units
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY o_custkey, CAST(YEAR(o_orderdate) AS INT))
      SELECT b.cust, b.yr, b.n_orders,
             CAST(b.buy_units AS DOUBLE) / 1e2 AS bought,
             CAST(COALESCE(r.ret_units, 0) AS DOUBLE) / 1e2 AS returned
      FROM bought b LEFT JOIN returned r ON b.cust = r.cust AND b.yr = r.yr
      WHERE COALESCE(r.ret_units, 0) * 10 < b.buy_units
      ORDER BY b.cust, b.yr"""
  val qTpcdsQ78 = QDef("q_tpcds_q78", sqlQ(q78Sql), Some(q78Sql))

  /** TPC-DS Q35 shape: customer qualification by EXISTS (activity in
    * 1997) plus an IN-subquery region membership, under a stacked
    * multi-aggregate per nation (count + exact sum + single-division avg
    * + min/max, which are order-insensitive on doubles). The EXISTS
    * decorrelates to a semi join against an aggregated-by-key order set;
    * the region IN broadcasts.
    */
  private val q35Sql = s"""
      SELECT n_name, COUNT(*) AS cnt,
             CAST(${Exact.usumSql("c_acctbal", 2)} AS DOUBLE) / 1e2 AS bal_sum,
             CAST(${Exact.usumSql("c_acctbal", 2)} AS DOUBLE) / (1e2 * COUNT(*)) AS bal_avg,
             MIN(c_acctbal) AS bal_min, MAX(c_acctbal) AS bal_max
      FROM customer JOIN nation ON n_nationkey = c_nationkey
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND YEAR(o_orderdate) = 1997)
        AND n_regionkey IN (SELECT r_regionkey FROM region
                            WHERE r_name IN ('ASIA', 'EUROPE'))
      GROUP BY n_name
      ORDER BY n_name"""
  val qTpcdsQ35 = QDef("q_tpcds_q35", sqlQ(q35Sql), Some(q35Sql))

  /** TPC-DS Q49 shape: "worst return ratios by channel" — per (channel,
    * item) exact quantity sums, return ratio ranked WITHIN each channel,
    * top-10 per channel kept and channels unioned by the shared window.
    * The rank runs on the (channel × item) grain — item is a dimension,
    * so the window input is catalog-bounded like Q67's brand grain, never
    * fact-grain. The ratio divides two exact BIGINTs (one correctly-
    * rounded double op, identical in both engines) and the item key
    * breaks every ordering tie deterministically.
    */
  private val q49Sql = s"""
      WITH by_chan AS (
        SELECT l_linestatus AS chan, l_partkey AS item,
               ${Exact.usumSql("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END", 0)} AS ret_q,
               ${Exact.usumSql("l_quantity", 0)} AS tot_q
        FROM lineitem GROUP BY l_linestatus, l_partkey),
      ranked AS (
        SELECT chan, item, ret_q, tot_q,
               RANK() OVER (PARTITION BY chan
                            ORDER BY CAST(ret_q AS DOUBLE) / tot_q DESC, item) AS rk
        FROM by_chan)
      SELECT chan, item, ret_q, tot_q, CAST(rk AS INT) AS rk
      FROM ranked WHERE rk <= 10
      ORDER BY chan, rk"""
  val qTpcdsQ49 = QDef("q_tpcds_q49", sqlQ(q49Sql), Some(q49Sql))

  val defs: Seq[QDef] = Seq(qTpcdsQ14, qTpcdsQ95, qTpcdsQ78, qTpcdsQ35,
    qTpcdsQ49)
}
