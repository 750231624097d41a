package graft.queries

import graft.{QDef, QModule}

/** Eleventh TPC-DS-shape batch (Q87/Q6) — two remaining planner paths:
  * the EXCEPT chain over derived distinct-key sets (Q87 — the anti-join
  * mirror of Q38's INTERSECT chain: each EXCEPT rewrites to a left-ANTI
  * join, stacking two anti joins over three aggregated legs), and the
  * correlated scalar aggregate whose correlation key is a DIMENSION
  * attribute (Q6 — "above 1.2× the average of the customer's own
  * nation"), decorrelated to per-nation aggregates. Reference suite:
  * `/root/reference/sql/core/src/test/resources/tpcds/q87.sql`,
  * `q6.sql`, adapted to the fixture star schema; the same Spark∩DuckDB
  * ANSI text is query and oracle.
  */
object Tpcds11 extends QModule {

  /** TPC-DS Q87 shape: three derived DISTINCT key sets combined with a
    * left-associative EXCEPT chain. Catalyst rewrites each EXCEPT
    * DISTINCT to aggregate → left-anti join, so the plan is two stacked
    * anti joins over three pushed-filter scans — exchanges carry one
    * BIGINT key column each, never order rows. Scale: identical contract
    * to the INTERSECT chain (q_tpcds_q38/q14): legs aggregate before any
    * join; anti joins stream the surviving side.
    */
  private val q87Sql = """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')"""
  val qTpcdsQ87 = QDef("q_tpcds_q87", sqlQ(q87Sql), Some(q87Sql))

  /** TPC-DS Q6 shape: rows qualified by a correlated scalar aggregate
    * whose correlation key is a dim attribute — customers above 1.2× the
    * average balance of their own nation. The textbook form compares
    * against `1.2 * AVG(...)`, a double whose merge order is partition-
    * dependent; here the band cross-multiplies to exact fixed-point
    * units (10·units(bal)·n > 12·Σunits), split across two correlated
    * scalars (COUNT and SUM) that Catalyst decorrelates into ONE
    * per-nation aggregate joined back on the 25-key nation column.
    * Scale: the decorrelated aggregate is nation-grain (broadcastable);
    * the probe side streams customers once.
    */
  private val q6Sql = """
      SELECT c_custkey, c_name, c_acctbal FROM customer c
      WHERE 10 * CAST(FLOOR(c.c_acctbal * 1e2 + 0.5) AS BIGINT) *
              (SELECT COUNT(*) FROM customer c2
               WHERE c2.c_nationkey = c.c_nationkey)
          > 12 * (SELECT CAST(SUM(CAST(FLOOR(c3.c_acctbal * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
                  FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)"""
  val qTpcdsQ6 = QDef("q_tpcds_q6", sqlQ(q6Sql), Some(q6Sql))

  val defs: Seq[QDef] = Seq(qTpcdsQ87, qTpcdsQ6)
}
