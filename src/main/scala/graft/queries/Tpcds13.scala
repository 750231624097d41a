package graft.queries

import graft.{Exact, QDef, QModule}

/** Thirteenth TPC-DS-shape batch (Q68/Q61). Q68 (also Q46): an
  * INEQUALITY residual between attributes of two different dimensions
  * riding the fact's equi-joins — "bought outside the home city", here
  * "supplied from outside the customer's nation" — with a
  * per-(customer, order) grain aggregate and a second customer-dim
  * instance for the name lookup. Q61: the promotional-channel ratio —
  * two single-row aggregate branches over overlapping fact scans
  * cross-joined into one exact ratio row. Reference suite:
  * `/root/reference/sql/core/src/test/resources/tpcds/q68.sql`,
  * `q46.sql`, `q61.sql`, adapted to the fixture star schema; the same
  * Spark∩DuckDB ANSI text is query and oracle.
  */
object Tpcds13 extends QModule {

  /** TPC-DS Q68/Q46 shape. The `s_nationkey <> c_nationkey` predicate
    * cannot push to either dim alone — it joins ATTRIBUTES of two
    * dimensions, so it rides the fact join as a residual filter (the
    * planner keeps both equi-joins hash/broadcast and evaluates the
    * inequality post-probe). Grain: one row per (order, customer) with
    * exact unit sums; names attach through a SECOND customer instance.
    *
    * Scale: all three dims broadcast; the residual costs one comparison
    * per joined row (no plan degradation — asserted: no cartesian); the
    * (order, customer) aggregate is map-side combinable on the fact's
    * natural key; top-20 is TakeOrdered, never a global sort.
    *
    * Oracle restructuring (the Tpcds5 precedent): DuckDB's optimizer
    * treats the cross-dim `<>` WHERE as a join-graph edge and plans
    * customer×supplier as a NESTED_LOOP theta join — a 15M-pair
    * intermediate at sf0.1 (measured 19 s; ×10 blew past 300 s and
    * 50 GB). The oracle states the SAME semantics as conditional
    * aggregation (qualifying rows feed the sum/count, HAVING keeps
    * groups with ≥1 qualifying item), which leaves only equi edges in
    * the join graph. Spark runs the residual-filter form — the planner
    * path this batch exists to exercise — and the driver hash-compares
    * the two.
    */
  private def q68Sql(residual: Boolean): String = {
    val core =
      if (residual) s"""
        SELECT o_orderkey, o_custkey,
               ${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS amt_u,
               COUNT(*) AS n_items
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN customer ON o_custkey = c_custkey
        WHERE s_nationkey <> c_nationkey
        GROUP BY o_orderkey, o_custkey"""
      else s"""
        SELECT o_orderkey, o_custkey,
               ${Exact.usumSql(
                 "CASE WHEN s_nationkey <> c_nationkey THEN l_extendedprice * (1 - l_discount) END", 4)} AS amt_u,
               CAST(COUNT(CASE WHEN s_nationkey <> c_nationkey THEN 1 END) AS BIGINT) AS n_items
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN customer ON o_custkey = c_custkey
        GROUP BY o_orderkey, o_custkey
        HAVING COUNT(CASE WHEN s_nationkey <> c_nationkey THEN 1 END) > 0"""
    s"""
      WITH sale AS ($core)
      SELECT c.c_name, s.o_orderkey,
             CAST(s.amt_u AS DOUBLE) / 1e4 AS amt, s.n_items
      FROM sale s JOIN customer c ON c.c_custkey = s.o_custkey
      ORDER BY amt DESC, o_orderkey LIMIT 20"""
  }
  val qTpcdsQ68 = QDef("q_tpcds_q68",
    sqlQ(q68Sql(residual = true)), Some(q68Sql(residual = false)))

  /** TPC-DS Q61 shape: promotional revenue as a share of total revenue —
    * TWO independent single-row aggregate branches (the promo-filtered
    * channel and the unfiltered one) cross-joined, ratio taken once.
    * Unlike Q14's conditional-aggregation form (one scan, CASE routing),
    * Q61's textbook shape really is two branches — the planner must run
    * two aggregate pipelines and join single rows (broadcast, free).
    * The ratio is one double division over exact BIGINT unit sums (the
    * 1e4 scale cancels), so the percentage is bit-identical on both
    * engines.
    */
  private val q61Sql = s"""
      SELECT 100.0 * CAST(promo.p AS DOUBLE) / CAST(tot.t AS DOUBLE) AS promo_pct,
             CAST(promo.p AS DOUBLE) / 1e4 AS promo_rev,
             CAST(tot.t AS DOUBLE) / 1e4 AS total_rev
      FROM (SELECT ${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS p
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_type = 'PROMO' AND l_returnflag = 'N') promo
      CROSS JOIN
           (SELECT ${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS t
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_returnflag = 'N') tot"""
  val qTpcdsQ61 = QDef("q_tpcds_q61", sqlQ(q61Sql), Some(q61Sql))

  val defs: Seq[QDef] = Seq(qTpcdsQ68, qTpcdsQ61)
}
