package graft.queries

import graft.{Exact, QDef, QModule}

/** Fifth TPC-DS-shape batch (Q1/Q17/Q39/Q75), covering planner paths the
  * first four batches still miss: a correlated scalar aggregate in the
  * WHERE clause comparing each row to its GROUP's average (Q1), a
  * three-instance fact chain joined on composite keys with event-order
  * predicates (Q17), a statistics band (coefficient of variation) feeding
  * a consecutive-period self-join (Q39), and a prior/current-period
  * decline report over a UNION ALL of channels (Q75). Reference suite:
  * `/root/reference/sql/core/src/test/resources/tpcds/q1.sql`, `q17.sql`,
  * `q39a.sql`, `q75.sql` — shapes adapted to the fixture star schema
  * (FIXTURES.md §1: one fact, so "channels" map to `l_linestatus` and
  * "store returns" to `l_returnflag`). Same Spark∩DuckDB ANSI text is
  * query and oracle; every band/threshold compare is cross-multiplied
  * exact BIGINT units — no float boundary can flip a row across engines.
  */
object Tpcds5 extends QModule {

  /** TPC-DS Q1 shape, correlated-subquery formulation: customers whose
    * return total exceeds 1.2× their nation's average. The twin of
    * `q_tpcds_q1` (Pipeline.scala), which writes the same semantics as a
    * window over the aggregate — THIS text instead puts two correlated
    * scalar aggregates in the WHERE clause, exercising Catalyst's
    * decorrelation rewrite: both subqueries collapse to one per-nation
    * aggregate joined back on the correlation key (plan-asserted in
    * OperatorSpec) — never a per-row subquery execution. The 1.2×
    * average compare is exact: `ret·5·count > 6·sum` (6/5 = 1.2), all
    * BIGINT units, so no float-boundary row flips. At 100×: `ret` is
    * bounded by customers, the nation aggregate by nations — both tiny
    * next to the fact scan that builds them.
    */
  private val q1Sql = s"""
      WITH ret AS (
        SELECT o_custkey AS cust, ${Exact.usumSql("l_extendedprice", 2)} AS ret_units
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY o_custkey),
      nat_ret AS (
        SELECT c_custkey AS cust, CAST(c_nationkey AS BIGINT) AS nat, ret_units
        FROM ret JOIN customer ON c_custkey = cust)
      SELECT cust AS c_custkey, nat AS c_nationkey,
             (CAST(ret_units AS DOUBLE) / 1e2) AS ret_total
      FROM nat_ret x
      WHERE ret_units * 5 * (SELECT COUNT(*) FROM nat_ret y WHERE y.nat = x.nat)
            > 6 * (SELECT CAST(SUM(ret_units) AS BIGINT) FROM nat_ret y WHERE y.nat = x.nat)
      ORDER BY c_custkey"""
  val qTpcdsQ1Corr = QDef("q_tpcds_q1corr", sqlQ(q1Sql), Some(q1Sql))

  /** TPC-DS Q17 shape: sale → return → repurchase chains. Three
    * instances of the fact (filtered by return flag = the fixture's
    * channel analog) chain on the composite (customer, brand) key with
    * event-order predicates, then aggregate per brand. The joins are
    * composite-key equi-joins (sort-merge/broadcast eligible) with the
    * order predicates as post-join filters — the planner never sees a
    * non-equi join. Quantity sums stay BIGINT (integral by fixture).
    * Grain choice is scale-load-bearing: TPC-H keeps rows-per-customer
    * constant as SF grows, so per-(cust,brand) flag counts stay O(1)
    * (measured max 7 at sf0.1) and the 3-way chain join is linear in the
    * fact — whereas a coarser key (e.g. nation) would make it cubic in
    * SF. The fixture's (cust,part) grain is chain-empty (0 cells at
    * sf0.1), so brand is the tightest key that exercises the shape.
    * The oracle text differs structurally: DuckDB plans the 3-way
    * equi+date-inequality join as an IEJoin on the DATE (equi keys as
    * residual — measured 123 s at sf0.01 vs Spark's 2 s hash join), so
    * the oracle stages the two joins through a MATERIALIZED pair CTE,
    * which restores its hash plan (0.1 s / 1.8 s). Same algebra, row-
    * identical — verified against the slow single-statement run.
    */
  private val q17Sql = """
      WITH sale AS (
        SELECT o_custkey AS cust, p_brand AS br, o_orderdate AS d,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                      JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'A'),
      ret AS (
        SELECT o_custkey AS cust, p_brand AS br, o_orderdate AS d,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                      JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'R'),
      rep AS (
        SELECT o_custkey AS cust, p_brand AS br, o_orderdate AS d,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                      JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'N')
      SELECT s.br AS p_brand, COUNT(*) AS n_chains,
             CAST(SUM(s.q) AS BIGINT) AS sale_qty,
             CAST(SUM(r.q) AS BIGINT) AS ret_qty,
             CAST(SUM(p2.q) AS BIGINT) AS rep_qty
      FROM sale s
      JOIN ret r ON r.cust = s.cust AND r.br = s.br AND r.d >= s.d
      JOIN rep p2 ON p2.cust = s.cust AND p2.br = s.br AND p2.d >= r.d
      GROUP BY s.br
      ORDER BY p_brand"""

  /** DuckDB twin of [[q17Sql]]: identical CTEs, but the chain is staged
    * through a MATERIALIZED pair CTE so DuckDB hash-joins on the equi
    * keys instead of IEJoining on the date inequality (see scaladoc).
    */
  private val q17OracleSql = """
      WITH sale AS (
        SELECT o_custkey AS cust, p_brand AS br, o_orderdate AS d,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                      JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'A'),
      ret AS (
        SELECT o_custkey AS cust, p_brand AS br, o_orderdate AS d,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                      JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'R'),
      rep AS (
        SELECT o_custkey AS cust, p_brand AS br, o_orderdate AS d,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                      JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'N'),
      pair AS MATERIALIZED (
        SELECT s.cust, s.br, s.q AS sq, r.q AS rq, r.d AS rd
        FROM sale s
        JOIN ret r ON r.cust = s.cust AND r.br = s.br AND r.d >= s.d)
      SELECT x.br AS p_brand, COUNT(*) AS n_chains,
             CAST(SUM(x.sq) AS BIGINT) AS sale_qty,
             CAST(SUM(x.rq) AS BIGINT) AS ret_qty,
             CAST(SUM(p2.q) AS BIGINT) AS rep_qty
      FROM pair x
      JOIN rep p2 ON p2.cust = x.cust AND p2.br = x.br AND p2.d >= x.rd
      GROUP BY x.br
      ORDER BY p_brand"""
  val qTpcdsQ17 = QDef("q_tpcds_q17", sqlQ(q17Sql), Some(q17OracleSql), bench = true)

  /** TPC-DS Q39 shape: supplier-months whose quantity stream is VOLATILE
    * (coefficient of variation > 0.55), self-joined to the consecutive
    * month — both periods must qualify. The CoV band is the Q39 stdev/
    * mean filter with the division cross-multiplied away:
    * `var > 0.3025·mean²  ⟺  400·n·(n·Σx² − (Σx)²) > 121·(Σx)²·(n−1)`
    * — exact BIGINT (quantities ≤ 50 ⇒ safe to ~3·10⁴ rows per
    * supplier-month; the fixture is orders of magnitude under). The
    * self-join runs on the AGGREGATED grain (supplier × month), bounded
    * by suppliers × months regardless of fact size.
    */
  private val q39Sql = """
      WITH inv AS (
        SELECT l_suppkey AS sk,
               CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS BIGINT) AS m,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS ss
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY l_suppkey, YEAR(o_orderdate) * 12 + MONTH(o_orderdate)),
      vol AS (
        SELECT sk, m, n
        FROM inv
        WHERE n > 1 AND 400 * n * (n * ss - s * s) > 121 * s * s * (n - 1))
      SELECT v1.sk AS suppkey, v1.m AS m1, v1.n AS n1, v2.m AS m2, v2.n AS n2
      FROM vol v1 JOIN vol v2 ON v1.sk = v2.sk AND v2.m = v1.m + 1
      ORDER BY suppkey, m1"""
  val qTpcdsQ39 = QDef("q_tpcds_q39", sqlQ(q39Sql), Some(q39Sql))

  /** TPC-DS Q75 shape: year-over-year revenue DECLINE by brand over a
    * UNION ALL of channels (fixture: the two line statuses). Channels
    * union before one aggregation; prior and current year meet in a
    * self-join of the aggregated grain; the >10% decline band is
    * cross-multiplied (`curr·10 < prev·9`) in exact units. At 100× the
    * self-join input is brands × years — constant — while the union
    * legs stream through one aggregate each.
    */
  private val q75Sql = s"""
      WITH chan AS (
        SELECT p_brand AS brand, CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
               l_extendedprice AS price
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                      JOIN part ON p_partkey = l_partkey
        WHERE l_linestatus = 'F'
        UNION ALL
        SELECT p_brand, CAST(YEAR(o_orderdate) AS BIGINT), l_extendedprice
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                      JOIN part ON p_partkey = l_partkey
        WHERE l_linestatus = 'O'),
      yearly AS (
        SELECT brand, yr, ${Exact.usumSql("price", 2)} AS rev, COUNT(*) AS n
        FROM chan GROUP BY brand, yr)
      SELECT c.brand, p.yr AS prev_yr, c.yr AS curr_yr,
             (CAST(p.rev AS DOUBLE) / 1e2) AS prev_rev,
             (CAST(c.rev AS DOUBLE) / 1e2) AS curr_rev
      FROM yearly c JOIN yearly p ON c.brand = p.brand AND c.yr = p.yr + 1
      WHERE c.rev * 10 < p.rev * 9
      ORDER BY c.brand, c.yr"""
  val qTpcdsQ75 = QDef("q_tpcds_q75", sqlQ(q75Sql), Some(q75Sql))

  val defs: Seq[QDef] = Seq(qTpcdsQ1Corr, qTpcdsQ17, qTpcdsQ39, qTpcdsQ75)
}
