package graft.queries

import graft.{Exact, QDef, QModule}

/** Ninth TPC-DS-shape batch (Q5/Q54/Q58/Q65) — four planner paths batches
  * 1–8 still miss: a signed multi-channel UNION ALL re-aggregated under
  * ROLLUP (Q5), an aggregate-then-bucket histogram (Q54), three aggregated
  * channel instances joined under a symmetric share band (Q58), and a
  * threshold join between an aggregate and the re-aggregate of its own
  * output (Q65). Reference suite: `/root/reference/sql/core/src/test/
  * resources/tpcds/q5.sql`, `q54.sql`, `q58.sql`, `q65.sql`, adapted to
  * the fixture star schema; the same Spark∩DuckDB ANSI text is query and
  * oracle. All money math uses [[graft.Exact]] BIGINT units so results are
  * bit-deterministic under any partitioning; band predicates are
  * cross-multiplied integer compares (no division before the final
  * projection).
  */
object Tpcds9 extends QModule {

  private def rev(e: String = "l_extendedprice * (1 - l_discount)") =
    Exact.usumSql(e, 4)

  /** TPC-DS Q5 shape: channels with different source shapes (net sales vs
    * returns) tagged and UNION ALL'd as SIGNED flows, then one ROLLUP
    * aggregation produces per-(channel, nation) profit plus channel and
    * grand totals. Scale: each leg aggregates to nation grain BEFORE the
    * union (map-side combinable; the union carries ≤ channels×nations
    * rows), and the rollup runs over that tiny signed table — the fact is
    * scanned once per channel and never re-shuffled at detail grain.
    */
  private val q5Sql = s"""
      WITH sales AS (
        SELECT c_nationkey AS nk, ${rev()} AS amt_u
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        WHERE l_returnflag <> 'R' GROUP BY c_nationkey),
      rets AS (
        SELECT c_nationkey AS nk, ${rev()} AS amt_u
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        WHERE l_returnflag = 'R' GROUP BY c_nationkey),
      chan AS (
        SELECT 'net_sales' AS channel, nk, amt_u FROM sales
        UNION ALL
        SELECT 'returns' AS channel, nk, -amt_u FROM rets)
      SELECT channel, n_name,
             CAST(CAST(SUM(amt_u) AS BIGINT) AS DOUBLE) / 1e4 AS profit
      FROM chan JOIN nation ON n_nationkey = nk
      GROUP BY ROLLUP(channel, n_name)"""
  val qTpcdsQ5 = QDef("q_tpcds_q5", sqlQ(q5Sql), Some(q5Sql))

  /** TPC-DS Q54 shape (customer revenue segmentation): total spend per
    * customer, bucketed into fixed-width revenue segments, then the
    * segment histogram. Scale: spend is one map-side-combinable shuffle to
    * customer grain; the bucket projection and second aggregation run over
    * customer-count rows (≪ fact). The bucket id is FLOOR of one IEEE
    * division of exact BIGINT units — correctly rounded identically in
    * both engines.
    */
  private val q54Sql = s"""
      WITH spend AS (
        SELECT o_custkey, ${Exact.usumSql("o_totalprice", 2)} AS tot_u
        FROM orders GROUP BY o_custkey)
      SELECT CAST(FLOOR(tot_u / 2e7) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(MIN(tot_u) AS DOUBLE) / 1e2 AS min_spend,
             CAST(MAX(tot_u) AS DOUBLE) / 1e2 AS max_spend
      FROM spend GROUP BY 1"""
  val qTpcdsQ54 = QDef("q_tpcds_q54", sqlQ(q54Sql), Some(q54Sql))

  /** TPC-DS Q58 shape: the same fact aggregated under three channel
    * bindings (here: ship years 1996/97/98 at part grain), equi-joined on
    * the item key, keeping items whose every channel lands within ±20% of
    * the three-channel average — the symmetric band cross-multiplied to
    * exact integers (15·rev_y vs 4·tot..6·tot, since 0.8/3 = 4/15 and
    * 1.2/3 = 6/15). Scale: each instance aggregates to part grain before
    * the 3-way join (year predicate pushed to its scan), so the join
    * shuffles part-count rows; the band evaluates per joined row.
    */
  private val q58Sql = s"""
      WITH y96 AS (SELECT l_partkey, ${rev()} AS rev FROM lineitem
                   WHERE year(l_shipdate) = 1996 GROUP BY l_partkey),
      y97 AS (SELECT l_partkey, ${rev()} AS rev FROM lineitem
              WHERE year(l_shipdate) = 1997 GROUP BY l_partkey),
      y98 AS (SELECT l_partkey, ${rev()} AS rev FROM lineitem
              WHERE year(l_shipdate) = 1998 GROUP BY l_partkey)
      SELECT p_name,
             CAST(y96.rev AS DOUBLE) / 1e4 AS rev1996,
             CAST(y97.rev AS DOUBLE) / 1e4 AS rev1997,
             CAST(y98.rev AS DOUBLE) / 1e4 AS rev1998
      FROM y96
      JOIN y97 ON y97.l_partkey = y96.l_partkey
      JOIN y98 ON y98.l_partkey = y96.l_partkey
      JOIN part ON p_partkey = y96.l_partkey
      WHERE 15 * y96.rev BETWEEN 4 * (y96.rev + y97.rev + y98.rev)
                             AND 6 * (y96.rev + y97.rev + y98.rev)
        AND 15 * y97.rev BETWEEN 4 * (y96.rev + y97.rev + y98.rev)
                             AND 6 * (y96.rev + y97.rev + y98.rev)
        AND 15 * y98.rev BETWEEN 4 * (y96.rev + y97.rev + y98.rev)
                             AND 6 * (y96.rev + y97.rev + y98.rev)"""
  val qTpcdsQ58 = QDef("q_tpcds_q58", sqlQ(q58Sql), Some(q58Sql))

  /** TPC-DS Q65 shape: (store, item) revenue grain compared against the
    * re-aggregate of ITS OWN output (per-store item count + total), keeping
    * items at or below half the store's average item revenue —
    * 2·n·rev ≤ tot, exact in BIGINT units.
    *
    * The oracle keeps the textbook self-join form (aggregate CTE joined to
    * its own GROUP BY). The engine runs the equivalent WINDOW rewrite:
    * Spark inlines deterministic CTEs, so the join form aggregates the
    * fact TWICE (measured 1.7 s vs DuckDB 0.24 s at sf0.1 — DuckDB
    * auto-materializes the reused CTE); SUM/COUNT OVER (PARTITION BY
    * store) computes the store totals in the same pass that carries the
    * item rows. Scale: one fact scan, one map-side-combinable shuffle to
    * (store, item) grain, one store-partitioned window whose partitions
    * are item-list-sized — no materialization of the aggregate, no second
    * scan, dims broadcast.
    */
  private val q65Sql = s"""
      WITH pi AS (
        SELECT l_suppkey, l_partkey, ${rev()} AS rev_u
        FROM lineitem GROUP BY l_suppkey, l_partkey),
      st AS (
        SELECT l_suppkey, CAST(SUM(rev_u) AS BIGINT) AS tot_u,
               COUNT(*) AS n_items
        FROM pi GROUP BY l_suppkey)
      SELECT s_name, p_name, CAST(pi.rev_u AS DOUBLE) / 1e4 AS revenue
      FROM pi
      JOIN st ON st.l_suppkey = pi.l_suppkey
      JOIN supplier ON s_suppkey = pi.l_suppkey
      JOIN part ON p_partkey = pi.l_partkey
      WHERE 2 * pi.rev_u * st.n_items <= st.tot_u"""
  private val q65Spark = s"""
      WITH pi AS (
        SELECT l_suppkey, l_partkey, ${rev()} AS rev_u
        FROM lineitem GROUP BY l_suppkey, l_partkey),
      w AS (
        SELECT l_suppkey, l_partkey, rev_u,
               SUM(rev_u) OVER (PARTITION BY l_suppkey) AS tot_u,
               COUNT(*) OVER (PARTITION BY l_suppkey) AS n_items
        FROM pi)
      SELECT s_name, p_name, CAST(w.rev_u AS DOUBLE) / 1e4 AS revenue
      FROM w
      JOIN supplier ON s_suppkey = w.l_suppkey
      JOIN part ON p_partkey = w.l_partkey
      WHERE 2 * w.rev_u * w.n_items <= w.tot_u"""
  val qTpcdsQ65 = QDef("q_tpcds_q65", sqlQ(q65Spark), Some(q65Sql), bench = true)

  val defs: Seq[QDef] = Seq(qTpcdsQ5, qTpcdsQ54, qTpcdsQ58, qTpcdsQ65)
}
