package graft.queries

import graft.{Exact, QDef, QModule}

/** Eighth TPC-DS-shape batch (Q13/Q72) — two planner paths batches 1–7
  * still miss: a DISJUNCTION of per-band conjuncts that straddles both
  * join sides (Q13/Q85 family — the OR cannot fully push into either
  * scan, it must ride the join as a residual), and the inventory-style
  * date-window fact-fact chain (Q72 — equi-key join with a bounded
  * time-window residual). Reference suite: `/root/reference/sql/core/
  * src/test/resources/tpcds/q13.sql`, `q72.sql`, adapted to the fixture
  * star schema; same Spark∩DuckDB ANSI text is query and oracle.
  */
object Tpcds8 extends QModule {

  /** TPC-DS Q13 shape: three OR'd (segment × price-band) combinations
    * where the segment lives on `customer` and the band on `orders` —
    * each conjunct alone could push to one side, but their disjunction
    * references both tables, so Catalyst keeps it as a post-join filter
    * while still pushing the IsNotNull guards. Aggregate = per-priority
    * count + exact average of the qualifying orders. Scale: the join
    * stays a plain equi-join on custkey (broadcast-able dim); the OR
    * costs one codegen'd predicate per joined row, zero extra shuffles.
    */
  private val q13Sql = s"""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             ${Exact.davgSql("o_totalprice", 2)} AS avg_price
      FROM orders JOIN customer ON c_custkey = o_custkey
      WHERE (c_mktsegment = 'BUILDING'   AND o_totalprice BETWEEN 50000 AND 150000)
         OR (c_mktsegment = 'MACHINERY'  AND o_totalprice BETWEEN 150000 AND 300000)
         OR (c_mktsegment = 'AUTOMOBILE' AND o_totalprice BETWEEN 10000 AND 100000)
      GROUP BY o_orderpriority"""
  val qTpcdsQ13 = QDef("q_tpcds_q13", sqlQ(q13Sql), Some(q13Sql))

  /** TPC-DS Q72 shape (inventory window): for one anchor week of
    * shipments, count per-brand the later shipments of the SAME part
    * from a DIFFERENT supplier inside a 5-day window — an equi-key
    * (partkey) fact-fact join whose time window rides as a residual, the
    * same bounded-fan-out contract as the range join (`q_join_range`):
    * candidates per anchor row = lines-per-part, never O(n²) in the
    * corpus. The anchor-week filter is the honest cardinality control
    * the original gets from its date-dim join (one replenishment period
    * at a time); the oracle shares it. Scale: both sides shuffle once on
    * l_partkey; the window predicate evaluates per candidate; brand
    * grouping is map-side combinable.
    */
  private val q72Sql = s"""
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM lineitem l1
      JOIN lineitem l2 ON l2.l_partkey = l1.l_partkey
        AND l2.l_suppkey <> l1.l_suppkey
        AND l2.l_shipdate >= l1.l_shipdate
        AND l2.l_shipdate < l1.l_shipdate + INTERVAL 5 DAY
      JOIN part ON p_partkey = l1.l_partkey
      WHERE l1.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        AND l1.l_shipdate < TIMESTAMP '1997-03-08 00:00:00'
      GROUP BY p_brand"""
  val qTpcdsQ72 = QDef("q_tpcds_q72", sqlQ(q72Sql), Some(q72Sql), bench = true)

  val defs: Seq[QDef] = Seq(qTpcdsQ13, qTpcdsQ72)
}
