package graft.queries

import graft.{Exact, QDef, QModule}

/** SSB (Star Schema Benchmark) flight shapes — the reference's second
  * benchmark suite (`/root/reference/sql/core/src/test/resources/ssb/`,
  * 13 files). SSB's lineorder/date-dim schema is remapped onto the fixture
  * star (FIXTURES.md §1): the date dimension becomes EXTRACT(YEAR FROM ...)
  * on the fact timestamps, supplycost becomes a retailprice-derived margin.
  * Flight 1 (restrictive filter-sum) is already covered by q_tpch_q6; the
  * three flights below add the star-join grouping patterns. One shared
  * Spark∩DuckDB text per query; all arithmetic through [[Exact]].
  */
object Ssb extends QModule {

  /** SSB 2.1 shape: revenue by (year, brand) for one part category sold
    * through one supplier region — fact scan with THREE broadcast dim
    * chains and a two-attribute rollup grain. The dims filter before the
    * join (p_type, r_name pushed to their scans), so the fact-side hash
    * probes discard early; the agg is map-side combinable on ~years×brands
    * groups.
    */
  private val ssb21Sql = s"""
      SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS yr, p_brand,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
      WHERE p_type = 'MEDIUM' AND r_name = 'AMERICA'
      GROUP BY yr, p_brand
      ORDER BY yr, p_brand"""
  val qSsb21 = QDef("q_ssb_q21", sqlQ(ssb21Sql), Some(ssb21Sql), bench = true)

  /** SSB 3.1 shape: trade volume between same-region nation pairs by year.
    * The customer⋈orders⋈lineitem⋈supplier fact chain sort-merges on its
    * natural keys; both nation instances broadcast and the region-equality
    * predicate evaluates as a residual on the broadcast rows (25×25 pairs
    * — never a blowup).
    */
  private val ssb31Sql = s"""
      SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS yr,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE cn.n_regionkey = sn.n_regionkey
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY c_nation, s_nation, yr
      ORDER BY yr, revenue DESC, c_nation, s_nation"""
  val qSsb31 = QDef("q_ssb_q31", sqlQ(ssb31Sql), Some(ssb31Sql))

  /** SSB 4.1 shape: profit by (year, customer nation) over the full
    * 7-instance star — the widest SSB join. Profit = revenue minus a
    * retailprice-derived cost proxy (the fixture has no supplycost);
    * the whole expression is one fixed-point term so the unit-sum stays
    * exact. Dims broadcast; the same-region predicate keeps the
    * supplier-nation instance as a residual, not a join key.
    */
  private val ssb41Sql = s"""
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
             cn.n_name AS c_nation,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount) - 0.5 * l_quantity * p_retailprice", 4)} AS profit
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN part ON p_partkey = l_partkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN region cr ON cr.r_regionkey = cn.n_regionkey
      WHERE cr.r_name = 'AMERICA' AND sn.n_regionkey = cn.n_regionkey
        AND p_type IN ('ECONOMY', 'PROMO')
      GROUP BY yr, c_nation
      ORDER BY yr, c_nation"""
  val qSsb41 = QDef("q_ssb_q41", sqlQ(ssb41Sql), Some(ssb41Sql))

  val defs: Seq[QDef] = Seq(qSsb21, qSsb31, qSsb41)
}
