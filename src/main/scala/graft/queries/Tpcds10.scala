package graft.queries

import graft.{Exact, QDef, QModule}

/** Tenth TPC-DS-shape batch (Q85/Q76) — two planner paths batches 1–9
  * still miss: a disjunction of per-band conjuncts spanning THREE join
  * sides (Q85 — where Q13's OR straddles two tables, Q85's must ride two
  * join levels as a residual), and a channel UNION ALL whose legs emit
  * complementary NULL columns (Q76 — exercises NULL-type widening and
  * per-leg pruned scans under one re-aggregation). Reference suite:
  * `/root/reference/sql/core/src/test/resources/tpcds/q85.sql`,
  * `q76.sql`, adapted to the fixture star schema; the same Spark∩DuckDB
  * ANSI text is query and oracle.
  */
object Tpcds10 extends QModule {

  /** TPC-DS Q85 shape: returned lines analyzed under an OR of three
    * (segment × quantity-band × price-band) conjuncts whose columns live
    * on customer, lineitem, AND orders — no single join side can absorb
    * the disjunction, so it survives as a residual above both equi joins
    * while the shared `l_returnflag = 'R'` conjunct still pushes to the
    * fact scan. Scale: both joins stay key-equi (customer broadcastable);
    * the OR is one codegen'd predicate per joined row; the aggregate is
    * map-side combinable on the 5-value priority key.
    */
  private val q85Sql = s"""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_returns,
             ${Exact.davgSql("l_quantity", 2)} AS avg_qty,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS refund
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      WHERE l_returnflag = 'R' AND (
         (c_mktsegment = 'BUILDING'  AND l_quantity BETWEEN 1  AND 20
            AND o_totalprice BETWEEN 50000 AND 150000)
      OR (c_mktsegment = 'MACHINERY' AND l_quantity BETWEEN 21 AND 35
            AND o_totalprice BETWEEN 100000 AND 250000)
      OR (c_mktsegment = 'HOUSEHOLD' AND l_quantity BETWEEN 36 AND 50
            AND o_totalprice BETWEEN 150000 AND 400000))
      GROUP BY o_orderpriority"""
  val qTpcdsQ85 = QDef("q_tpcds_q85", sqlQ(q85Sql), Some(q85Sql))

  /** TPC-DS Q76 shape: two channels with COMPLEMENTARY schemas unioned —
    * the part-attributed leg emits a NULL priority, the order-status leg
    * a NULL brand — then one aggregation over (channel, year, brand,
    * priority). The analyzer must widen the untyped NULLs to each leg's
    * column type, and each leg's filter must still push to ITS OWN scan
    * (the union is no pushdown barrier). Scale: legs scan independently
    * (they can run concurrently), the union carries leg-grain rows into
    * one combinable aggregate.
    */
  private val q76Sql = s"""
      SELECT channel, yr, brand, priority, CAST(COUNT(*) AS BIGINT) AS n,
             ${Exact.dsumSql("amt", 2)} AS amount
      FROM (
        SELECT 'with_part' AS channel, CAST(year(l_shipdate) AS INT) AS yr,
               p_brand AS brand, NULL AS priority, l_extendedprice AS amt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_linenumber = 1
        UNION ALL
        SELECT 'no_part' AS channel, CAST(year(o_orderdate) AS INT) AS yr,
               NULL AS brand, o_orderpriority AS priority, o_totalprice AS amt
        FROM orders WHERE o_orderstatus = 'F')
      GROUP BY channel, yr, brand, priority"""
  val qTpcdsQ76 = QDef("q_tpcds_q76", sqlQ(q76Sql), Some(q76Sql))

  val defs: Seq[QDef] = Seq(qTpcdsQ85, qTpcdsQ76)
}
