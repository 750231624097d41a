package graft.queries

import graft.{Exact, QDef, QModule}

/** The remaining TPC-H shapes (Q2/7/8/9/11/12/13/16/20/21), completing the
  * 22-shape composite sweep with [[Pipeline]] (Q3/5/10/18) and [[Tpch]]
  * (Q1/4/6/14/15/17/19/22). These stress the planner paths the reference
  * exercises with its TPC-DS/SSB suites (`/root/reference/sql/core/src/test/
  * resources/tpcds/`): correlated scalar subqueries over a twice-consumed
  * CTE (Q2), 6–8-table join trees with nation self-pairs (Q7/Q8),
  * conditional-share aggregation (Q8/Q12), outer-join-then-distribution
  * (Q13), null-aware NOT IN (Q16), nested IN over grouped HAVING (Q20),
  * and semi+anti self-joins on the fact table (Q21).
  *
  * Fixture adaptations (FIXTURES.md §1): there is no partsupp table, so
  * Q2/Q11/Q16/Q20 use the (l_partkey, l_suppkey) pairs observed in
  * lineitem as the part-supplier relation; no commit/receipt dates or
  * shipmode, so "late" is l_shipdate > o_orderdate + a fixed interval and
  * Q12's class axis is o_orderpriority. All money arithmetic goes through
  * [[Exact]]; every SQL text is in the common Spark∩DuckDB dialect (the
  * same string is the query AND the oracle).
  */
object Tpch2 extends QModule {

  /** TPC-H Q2 shape: min-cost supplier per part — a CTE consumed twice
    * (join input + correlated scalar MIN with equality correlation on
    * p_partkey), then a total-order LIMIT. The unit cost MIN is a plain
    * double division, deterministic on both engines (no summation).
    * At 100 TB the ps CTE is one map-side-combinable aggregate and the
    * correlated MIN decorrelates to an aggregate + join on l_partkey.
    */
  private val q2Sql = """
      WITH ps AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_type
      FROM part JOIN ps ON p_partkey = ps.l_partkey
        JOIN supplier ON s_suppkey = ps.l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE p_size = 15 AND r_name = 'EUROPE'
        AND cost = (SELECT MIN(ps2.cost)
                    FROM ps ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                    WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""
  val qTpchQ2 = QDef("q_tpch_q2", sqlQ(q2Sql), Some(q2Sql))

  /** TPC-H Q7: volume shipping between nation pairs by year — the
    * customer and supplier sides bind to DIFFERENT copies of nation, so
    * the plan is a 6-table tree with two broadcast dims resolved from one
    * base relation. Partial aggregation reduces the shuffle to
    * (pair, year) rows before the final exchange.
    */
  private val q7Sql = s"""
      SELECT supp_nation, cust_nation, l_year, ${Exact.dsumSql("volume", 4)} AS revenue
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(YEAR(l_shipdate) AS INT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name <> n2.n_name
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01') shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""
  val qTpchQ7 = QDef("q_tpch_q7", sqlQ(q7Sql), Some(q7Sql), bench = true)

  /** TPC-H Q8: national market share — the deepest tree in the suite
    * (8 relations, nation joined twice on different sides), finished by a
    * conditional-share division of two exact unit-sums per year.
    */
  private val q8Sql = s"""
      WITH flat AS (
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO')
      SELECT o_year,
        CAST(${Exact.usumSql("CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0.0 END", 4)} AS DOUBLE)
          / CAST(${Exact.usumSql("volume", 4)} AS DOUBLE) AS mkt_share
      FROM flat GROUP BY o_year ORDER BY o_year"""
  val qTpchQ8 = QDef("q_tpch_q8", sqlQ(q8Sql), Some(q8Sql))

  /** TPC-H Q9 shape: product-type profit by supplier nation and year.
    * The fixture has no ps_supplycost, so cost is the retail-price
    * stand-in p_retailprice * l_quantity * 0.1 — the amount expression is
    * evaluated with the identical IEEE operation order on both engines
    * before the exact unit-sum.
    */
  private val q9Sql = s"""
      SELECT nation, o_year, ${Exact.dsumSql("amount", 4)} AS sum_profit
      FROM (SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1 AS amount
            FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%') profit
      GROUP BY nation, o_year ORDER BY nation, o_year DESC"""
  val qTpchQ9 = QDef("q_tpch_q9", sqlQ(q9Sql), Some(q9Sql))

  /** TPC-H Q11 shape: value-concentration parts — a CTE consumed twice,
    * once grouped and once as an uncorrelated scalar threshold
    * (share-of-total HAVING). All comparison happens in exact BIGINT
    * units; the division to DOUBLE is only in the final projection.
    */
  private val q11Sql = s"""
      WITH val AS (
        SELECT l_partkey, ${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS v_units
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE n_regionkey = 2
        GROUP BY l_partkey)
      SELECT l_partkey AS p_key, CAST(v_units AS DOUBLE) / 1e4 AS part_value
      FROM val
      WHERE v_units > (SELECT CAST(FLOOR(CAST(SUM(v_units) AS DOUBLE) / 800.0) AS BIGINT) FROM val)
      ORDER BY p_key"""
  val qTpchQ11 = QDef("q_tpch_q11", sqlQ(q11Sql), Some(q11Sql))

  /** TPC-H Q12 shape: late-shipment priority classes by ship year. The
    * fixture has no shipmode/commitdate, so the band is l_shipdate more
    * than 30 days past o_orderdate and the class axis is o_orderpriority
    * (conditional COUNTs — BIGINT on both engines, no sum-of-int
    * HUGEINT widening).
    */
  private val q12Sql = """
      SELECT CAST(YEAR(l_shipdate) AS INT) AS ship_year,
             COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
             COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      GROUP BY CAST(YEAR(l_shipdate) AS INT) ORDER BY ship_year"""
  val qTpchQ12 = QDef("q_tpch_q12", sqlQ(q12Sql), Some(q12Sql))

  /** TPC-H Q13: customer order-count distribution — LEFT OUTER join with
    * an extra ON-clause filter (kept in the join, NOT pushed to WHERE,
    * or zero-order customers would vanish), then an aggregate OF an
    * aggregate. Every fixture customer has orders, so the filter windows
    * to 1999+ to make the zero bucket non-empty.
    */
  private val q13Sql = """
      SELECT c_count, COUNT(*) AS custdist
      FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
            GROUP BY c_custkey) c_orders
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""
  val qTpchQ13 = QDef("q_tpch_q13", sqlQ(q13Sql), Some(q13Sql), bench = true)

  /** TPC-H Q16 shape: supplier diversity per part attribute — DISTINCT
    * pair projection of the fact table, COUNT(DISTINCT) per group, and a
    * null-aware NOT IN anti join (suppliers with negative balance as the
    * "complaints" stand-in; 6 of 100 qualify, so the exclusion is
    * non-trivial).
    */
  private val q16Sql = """
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON p_partkey = ps.l_partkey
      WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
        AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
        AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
  val qTpchQ16 = QDef("q_tpch_q16", sqlQ(q16Sql), Some(q16Sql))

  /** TPC-H Q20 shape: nested IN subqueries — suppliers (of one nation)
    * who moved real volume of a promo part in 1997: an IN over a grouped
    * HAVING whose own filter is another IN against part. The HAVING
    * threshold compares exact quantity units.
    */
  private val q20Sql = s"""
      SELECT s_name, s_acctbal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
        AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
            AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING ${Exact.usumSql("l_quantity", 2)} > 3000)
      ORDER BY s_name"""
  val qTpchQ20 = QDef("q_tpch_q20", sqlQ(q20Sql), Some(q20Sql))

  /** TPC-H Q21 shape: suppliers who kept orders waiting — the fact table
    * re-entered three times (base + EXISTS semi + NOT EXISTS anti), all
    * correlated ONLY by o_orderkey equality so Catalyst decorrelates to
    * left-semi/left-anti joins. "Late" (no receipt/commit dates in the
    * fixture) is shipped >500 days after the order date, precomputed once
    * in a CTE shared by the base and anti branches. The `'F'` status
    * filter lives INSIDE the CTE: orderkey is the orders primary key, so
    * status is functionally determined by the correlation key and the
    * push is semantics-preserving — it shrinks BOTH CTE instances (the
    * anti build side included, which the textbook form leaves unfiltered)
    * and deletes the base's second orders join outright. The shuffle the
    * anti join pays then carries only F-order late lines.
    *
    * r7 plan adjudication (same-session A/B at the ×10 fixture, medians
    * of 3 steady-state runs): this decorrelated 3-pass form, 4.27 s, BEAT
    * every single-fact-pass rewrite tried — per-order collect_set windows
    * 5.18 s, stacked codegen HashAggregates over one explicit orderkey
    * exchange 6.26 s, and broadcast-orders variants 6.5–10 s (a fact-
    * sized broadcast build is a scale anti-pattern AND slower locally).
    * Catalyst's semi/anti joins reuse the sorted exchanges the base pass
    * already pays, so the "redundant" passes are cheaper than any giant
    * window/object-agg state; keep this text.
    */
  private val q21Sql = """
      WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 500 DAY
          AND o_orderstatus = 'F')
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier
        JOIN late l1 ON s_suppkey = l1.l_suppkey
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l3
                        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
      GROUP BY s_name ORDER BY numwait DESC, s_name"""
  val qTpchQ21 = QDef("q_tpch_q21", sqlQ(q21Sql), Some(q21Sql), bench = true)

  val defs: Seq[QDef] = Seq(qTpchQ2, qTpchQ7, qTpchQ8, qTpchQ9, qTpchQ11,
    qTpchQ12, qTpchQ13, qTpchQ16, qTpchQ20, qTpchQ21)
}
