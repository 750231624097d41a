package graft.queries

import graft.{Exact, QDef, QModule}

/** TPC-H-shape composites beyond the four in [[Pipeline]] — the planner
  * stress the reference exercises with its 103-file TPC-DS suite plus SSB
  * (`/root/reference/sql/core/src/test/resources/tpcds/`, `.../ssb/`).
  * Shapes are adapted to the driver fixture schema (FIXTURES.md §1: no
  * commitdate/receiptdate/shipmode/phone columns), and all money/quantity
  * arithmetic goes through [[Exact]] so results are bit-identical to the
  * DuckDB oracle under any partitioning. Every SQL text is in the common
  * Spark∩DuckDB dialect: the same string is the query AND the oracle.
  */
object Tpch extends QModule {

  /** TPC-H Q1: pricing summary report — the canonical wide aggregate.
    * One scan, 8 aggregates over 4 exact unit-sums, partial→final
    * HashAggregate on a 6-group key. At 100 TB this is the map-side-combine
    * showcase: the shuffle carries 6 rows × 8 longs per task, nothing else.
    */
  private val q1Sql = s"""
      SELECT l_returnflag, l_linestatus,
             ${Exact.dsumSql("l_quantity", 2)} AS sum_qty,
             ${Exact.dsumSql("l_extendedprice", 2)} AS sum_base_price,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
             ${Exact.davgSql("l_quantity", 2)} AS avg_qty,
             ${Exact.davgSql("l_extendedprice", 2)} AS avg_price,
             ${Exact.davgSql("l_discount", 4)} AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""
  val qTpchQ1 = QDef("q_tpch_q1", sqlQ(q1Sql), Some(q1Sql), bench = true)

  /** TPC-H Q4 shape: order-priority checking — correlated EXISTS planned
    * as a left-semi join on o_orderkey (RewritePredicateSubquery,
    * reference `CAT/optimizer/subquery.scala:44`). The fixture has no
    * commit/receipt dates, so "late line item" is l_shipdate > o_orderdate.
    */
  private val q4Sql = """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-07-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""
  val qTpchQ4 = QDef("q_tpch_q4", sqlQ(q4Sql), Some(q4Sql))

  /** TPC-H Q6: forecasting revenue change — a pure scan-side query whose
    * entire WHERE must reach the parquet reader as PushedFilters (plan
    * asserted in OperatorSpec); one exact sum, no join, no wide shuffle.
    */
  private val q6Sql = s"""
      SELECT ${Exact.dsumSql("l_extendedprice * l_discount", 4)} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.03 AND 0.07
        AND l_quantity < 24"""
  val qTpchQ6 = QDef("q_tpch_q6", sqlQ(q6Sql), Some(q6Sql), bench = true)

  /** TPC-H Q14 shape: promotion effect — conditional aggregation. The
    * ratio is computed from two exact BIGINT unit-sums with one double
    * division at the end, so it is deterministic on both engines.
    * (Fixture p_type is a flat category, so `= 'PROMO'` not LIKE.)
    */
  private val q14Sql = s"""
      SELECT CAST(${Exact.usumSql(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)} AS DOUBLE) * 100.0
             / CAST(${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS DOUBLE) AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        AND l_shipdate < TIMESTAMP '1996-06-01'"""
  val qTpchQ14 = QDef("q_tpch_q14", sqlQ(q14Sql), Some(q14Sql))

  /** TPC-H Q15: top supplier — a CTE consumed twice (join input + scalar
    * MAX subquery), the exchange/subquery-reuse shape. The winner compare
    * happens on exact BIGINT units so ties and near-ties are stable; the
    * division to DOUBLE happens only in the final projection.
    */
  private val q15Sql = s"""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS total_units
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-07-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(total_units AS DOUBLE) / 1e4 AS total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_units = (SELECT MAX(total_units) FROM revenue)
      ORDER BY s_suppkey"""
  val qTpchQ15 = QDef("q_tpch_q15", sqlQ(q15Sql), Some(q15Sql))

  /** TPC-H Q17 shape: small-quantity-order revenue — correlated scalar
    * AVG subquery against the same fact table (decorrelated to an
    * aggregate + join by Catalyst). l_quantity is integral (FIXTURES §1),
    * so the double AVG is an exact sum / count on both engines and the
    * 0.2× threshold compare is deterministic.
    */
  private val q17Sql = s"""
      SELECT ${Exact.dsumSql("l_extendedprice", 2)} / 7.0 AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#23'
        AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""
  val qTpchQ17 = QDef("q_tpch_q17", sqlQ(q17Sql), Some(q17Sql))

  /** TPC-H Q19: discounted revenue — disjunctive mixed join/scan
    * predicates. The planner stress: the OR of brand×size×quantity bands
    * must still prune part columns and keep the join equi (p_partkey), with
    * the residual disjunction evaluated post-join; Catalyst additionally
    * infers the per-side implied filters (l_quantity BETWEEN 1 AND 30).
    */
  private val q19Sql = s"""
      SELECT ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"""
  val qTpchQ19 = QDef("q_tpch_q19", sqlQ(q19Sql), Some(q19Sql), bench = true)

  /** TPC-H Q22 shape: global-customer sales opportunity — an uncorrelated
    * scalar AVG threshold plus a NOT EXISTS anti join. Every fixture
    * customer has at least one order, so the anti condition is
    * date-windowed ("no orders since 1999") to keep the result non-trivial;
    * the threshold uses the exact-average form (single double division).
    */
  private val q22Sql = s"""
      SELECT c_nationkey, COUNT(*) AS numcust,
             ${Exact.dsumSql("c_acctbal", 2)} AS totacctbal
      FROM customer
      WHERE c_acctbal > (SELECT ${Exact.davgSql("c_acctbal", 2)}
                         FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY c_nationkey
      ORDER BY c_nationkey"""
  val qTpchQ22 = QDef("q_tpch_q22", sqlQ(q22Sql), Some(q22Sql))

  val defs: Seq[QDef] = Seq(qTpchQ1, qTpchQ4, qTpchQ6, qTpchQ14, qTpchQ15,
    qTpchQ17, qTpchQ19, qTpchQ22)
}
