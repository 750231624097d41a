package graft.queries

import graft.{Exact, QDef, QModule}

/** Third TPC-DS-shape batch (Q67/Q36/Q98/Q31/Q21/Q66), covering the
  * planner paths batches 1–2 (`Pipeline` Q1/Q27/Q64, `Tpcds2`) don't
  * touch: windowed top-k over ROLLUP output (Q67), hierarchy ranks
  * partitioned by GROUPING level (Q36), ratio-to-report window shares
  * (Q98), share-growth chains across a normalized window (Q31),
  * before/after conditional split with an integer ratio band (Q21), and
  * a wide 12-way conditional pivot in one scan (Q66). Reference suite:
  * `/root/reference/sql/core/src/test/resources/tpcds/q67.sql`, `q36.sql`,
  * `q98.sql`, `q31.sql`, `q21.sql`, `q66.sql` — shapes adapted to the
  * fixture star schema (FIXTURES.md §1). Same Spark∩DuckDB SQL text
  * serves as query and oracle; money stays in exact BIGINT units
  * ([[Exact.usumSql]]) until one final division, so doubles are
  * bit-identical across engines and partitionings.
  */
object Tpcds3 extends QModule {

  /** TPC-DS Q67 shape: rank rolled-up sales rows WITHIN each brand —
    * the ROLLUP subtotal rows rank alongside the per-year rows (the
    * brand-total row is always rank 1), and the NULL-brand partition
    * ranks the year totals against the grand total. The window grain is
    * the ROLLUP output (brands × years + margins — bounded at any SF),
    * never the fact; rank ties are impossible (explicit year
    * tie-breaker), so the hash compare is deterministic.
    */
  private val q67Sql = s"""
      WITH mb AS (
        SELECT p_brand AS brand, CAST(YEAR(l_shipdate) AS INT) AS yr,
               ${Exact.usumSql("l_extendedprice", 2)} AS units
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY ROLLUP(p_brand, CAST(YEAR(l_shipdate) AS INT)))
      SELECT COALESCE(brand, 'ALL') AS brand, COALESCE(yr, -1) AS yr,
             CAST(units AS DOUBLE) / 1e2 AS sales, CAST(rk AS INT) AS rk
      FROM (SELECT brand, yr, units,
                   RANK() OVER (PARTITION BY brand
                                ORDER BY units DESC, COALESCE(yr, -1)) AS rk
            FROM mb) x
      WHERE rk <= 3
      ORDER BY brand, rk"""
  val qTpcdsQ67 = QDef("q_tpcds_q67", sqlQ(q67Sql), Some(q67Sql), bench = true)

  /** TPC-DS Q36 shape: gross-margin hierarchy — ROLLUP(region, nation)
    * with `lochierarchy = GROUPING(r) + GROUPING(n)`, then RANK
    * partitioned by (hierarchy level, parent region at the leaf level).
    * The rank window runs over the rolled-up grain (regions × nations +
    * margins), not facts; the margin ratio divides two exact BIGINT unit
    * sums once, so ordering is identical in both engines (nation
    * tie-breaker removes any double-tie ambiguity).
    */
  private val q36Sql = s"""
      WITH base AS (
        SELECT r_name, n_name,
               CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS lochierarchy,
               ${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS rev_units,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        GROUP BY ROLLUP(r_name, n_name))
      SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
             lochierarchy,
             CAST(rev_units AS DOUBLE) / (1e4 * qty) AS margin_per_unit,
             CAST(RANK() OVER (PARTITION BY lochierarchy,
                                 CASE WHEN lochierarchy = 0 THEN r_name END
                               ORDER BY CAST(rev_units AS DOUBLE) / (1e4 * qty) DESC,
                                        COALESCE(n_name, '')) AS INT) AS rk
      FROM base
      ORDER BY lochierarchy DESC, region, rk"""
  val qTpcdsQ36 = QDef("q_tpcds_q36", sqlQ(q36Sql), Some(q36Sql), bench = true)

  /** TPC-DS Q98 shape: ratio-to-report — each brand's share of its
    * class's revenue via `SUM(...) OVER (PARTITION BY class)`. One
    * aggregate shuffle builds the (class, brand) grain; the share window
    * then re-reads that bounded grain with no second exchange on a
    * cluster (same partitioning). The percent is one double division of
    * exact unit sums.
    */
  private val q98Sql = s"""
      WITH br AS (
        SELECT p_type AS cls, p_brand AS brand,
               ${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS units
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_type, p_brand)
      SELECT cls, brand, CAST(units AS DOUBLE) / 1e4 AS revenue,
             (CAST(units AS DOUBLE) * 100.0)
               / CAST(CAST(SUM(units) OVER (PARTITION BY cls) AS BIGINT) AS DOUBLE)
               AS revenue_ratio
      FROM br ORDER BY cls, revenue_ratio DESC, brand"""
  val qTpcdsQ98 = QDef("q_tpcds_q98", sqlQ(q98Sql), Some(q98Sql))

  /** TPC-DS Q31 shape: share-growth chain — per-quarter nation shares
    * normalized by a per-quarter window total, then the share table
    * self-joined twice to find nations whose share rose monotonically
    * across Q1→Q2→Q3. The joins run on the (nation, quarter) grain
    * (bounded), and the shares divide exact BIGINT units so the growth
    * comparisons are bit-deterministic.
    */
  private val q31Sql = s"""
      WITH nq AS (
        SELECT n_name AS nation, CAST(QUARTER(o_orderdate) AS INT) AS q,
               ${Exact.usumSql("o_totalprice", 2)} AS units
        FROM orders JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        WHERE YEAR(o_orderdate) = 1997
        GROUP BY n_name, CAST(QUARTER(o_orderdate) AS INT)),
      sh AS (
        SELECT nation, q,
               CAST(units AS DOUBLE)
                 / CAST(CAST(SUM(units) OVER (PARTITION BY q) AS BIGINT) AS DOUBLE) AS share
        FROM nq)
      SELECT a.nation AS nation, a.share AS s1, b.share AS s2, c.share AS s3
      FROM sh a JOIN sh b ON a.nation = b.nation JOIN sh c ON a.nation = c.nation
      WHERE a.q = 1 AND b.q = 2 AND c.q = 3
        AND b.share > a.share AND c.share > b.share
      ORDER BY nation"""
  val qTpcdsQ31 = QDef("q_tpcds_q31", sqlQ(q31Sql), Some(q31Sql))

  /** TPC-DS Q21 shape: before/after split — per-supplier quantity before
    * vs after a pivot date (one conditional aggregate pass, no self
    * join), kept when the ratio sits in [2/3, 3/2]. The band compare
    * cross-multiplies exact BIGINT units, so no division happens at all.
    */
  private val q21Sql = s"""
      WITH sp AS (
        SELECT l_suppkey,
               ${Exact.usumSql("CASE WHEN l_shipdate < TIMESTAMP '1998-07-01' THEN l_quantity ELSE 0 END", 0)} AS before_q,
               ${Exact.usumSql("CASE WHEN l_shipdate >= TIMESTAMP '1998-07-01' THEN l_quantity ELSE 0 END", 0)} AS after_q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY l_suppkey)
      SELECT l_suppkey, before_q, after_q
      FROM sp
      WHERE 3 * after_q >= 2 * before_q AND 2 * after_q <= 3 * before_q
      ORDER BY l_suppkey"""
  val qTpcdsQ21 = QDef("q_tpcds_q21", sqlQ(q21Sql), Some(q21Sql))

  /** TPC-DS Q66 shape: wide monthly pivot — twelve conditional unit sums
    * widen one scan of a year's facts into a (supplier × 12-month) row,
    * the manual CASE form of the pivot plan (cf. q_agg_pivot for the
    * `.pivot` API). One aggregate, no re-scan per month; quantity units
    * are exact BIGINTs.
    */
  private val q66Sql = {
    val months = (1 to 12).map { m =>
      val col = f"m$m%02d"
      s"${Exact.usumSql(s"CASE WHEN MONTH(l_shipdate) = $m THEN l_quantity ELSE 0 END", 0)} AS $col"
    }.mkString(",\n             ")
    s"""
      SELECT l_suppkey,
             $months
      FROM lineitem WHERE YEAR(l_shipdate) = 1997
      GROUP BY l_suppkey ORDER BY l_suppkey"""
  }
  val qTpcdsQ66 = QDef("q_tpcds_q66", sqlQ(q66Sql), Some(q66Sql))

  val defs: Seq[QDef] = Seq(qTpcdsQ67, qTpcdsQ36, qTpcdsQ98, qTpcdsQ31,
    qTpcdsQ21, qTpcdsQ66)
}
