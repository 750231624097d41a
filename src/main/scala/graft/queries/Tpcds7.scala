package graft.queries

import graft.{Exact, QDef, QModule}

/** Seventh TPC-DS-shape batch (Q94/Q9/Q2/Q62) — four planner paths the
  * first six batches still miss. Reference suite:
  * `/root/reference/sql/core/src/test/resources/tpcds/q94.sql`, `q9.sql`,
  * `q2.sql`, `q62.sql` — shapes adapted to the fixture star schema. The
  * same Spark∩DuckDB ANSI text is query and oracle except where a
  * function spelling differs (weekday/isodow, datediff), which is
  * parameterized per dialect with identical semantics.
  */
object Tpcds7 extends QModule {

  /** TPC-DS Q94 shape ("web orders shipped from multiple warehouses with
    * no returns"): a global COUNT(DISTINCT order) + exact money sum over
    * a fact restricted by BOTH an EXISTS (another lineitem of the same
    * order from a different supplier — correlated equi+non-equi semi)
    * and a NOT EXISTS (no returned lineitem in the order — anti).
    * Planner paths: semi AND anti join against the same fact feeding one
    * distinct-aggregate — q21's multi-entry fact pattern but collapsed
    * into a single global distinct-count, so the aggregate is the
    * two-phase partial/final COUNT(DISTINCT) path, not a grouped window.
    * Scale: both subqueries join on l_orderkey — co-partitioned with the
    * outer fact shuffle, each order's lines meet on one reducer; nothing
    * fans out beyond lines-per-order (constant in SF).
    */
  private val q94Sql = s"""
      SELECT CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS order_count,
             ${Exact.dsumSql("l1.l_extendedprice", 2)} AS total_price
      FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE year(o_orderdate) = 1996
        AND o_orderstatus = 'F'
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_returnflag = 'R')"""
  val qTpcdsQ94 = QDef("q_tpcds_q94", sqlQ(q94Sql), Some(q94Sql))

  /** TPC-DS Q9 shape: five quantity-band statistics, each chosen by a
    * CASE over a scalar COUNT subquery — when the band is populous
    * enough report its average price, otherwise its average discount.
    * Planner path: 15 independent scalar subqueries in one projection
    * over a one-row dim anchor — the subquery-reuse/parallel-subquery
    * execution path none of the join-shaped batches exercise. Scale:
    * each subquery is a single map-side-combinable aggregate over a
    * pushed band predicate; Spark runs them as independent broadcastable
    * single-row plans (and at 100 TB a deployment fuses them into one
    * conditional-aggregate scan — the q62 shape below — trading subquery
    * parallelism for one pass; both forms are linear).
    */
  private def q9Band(lo: Int, hi: Int): String = {
    val in = s"FROM lineitem WHERE l_quantity BETWEEN $lo AND $hi"
    s"""CASE WHEN (SELECT COUNT(*) $in) > 12000
       THEN (SELECT ${Exact.davgSql("l_extendedprice", 2)} $in)
       ELSE (SELECT ${Exact.davgSql("l_discount", 4)} $in)
       END AS band_${lo}_$hi"""
  }
  private val q9Sql = s"""
      SELECT ${Seq((1, 10), (11, 20), (21, 30), (31, 40), (41, 50))
        .map { case (lo, hi) => q9Band(lo, hi) }.mkString(",\n             ")}
      FROM region WHERE r_regionkey = 0"""
  val qTpcdsQ9 = QDef("q_tpcds_q9", sqlQ(q9Sql), Some(q9Sql))

  /** TPC-DS Q2 shape: week-over-year comparison — weekly revenue pivoted
    * by day-of-week (7 conditional exact sums), then the 1996 weeks
    * self-joined to the 1997 weeks on week number, emitting per-dow
    * ratios. Planner paths: conditional-aggregate pivot on derived
    * calendar keys + an aggregate-grain self-join (two instances of the
    * same weekly CTE under different year predicates). The dow spelling
    * differs per dialect (Spark `weekday`+1 ≡ DuckDB `isodow`, both
    * 1=Monday); weeks 2–50 keep ISO week-53/year-boundary rows out so
    * `year()` and ISO week agree in both engines. Each ratio is one
    * double division of exact BIGINT unit sums (empty cells are NULL in
    * both engines — SUM over no rows). Scale: the pivot aggregate is one
    * map-side-combinable pass at (year, week) grain — ~100 rows at any
    * SF — so the self-join is dimension-sized.
    */
  private def q2Sql(dialect: String): String = {
    val dow = dialect match {
      case "spark" => "weekday(o_orderdate) + 1"
      case _       => "isodow(o_orderdate)"
    }
    val days = Seq("mon", "tue", "wed", "thu", "fri", "sat", "sun")
    val pivots = days.zipWithIndex.map { case (d, i) =>
      s"${Exact.usumSql(s"CASE WHEN $dow = ${i + 1} THEN o_totalprice END", 2)} AS ${d}_units"
    }.mkString(",\n               ")
    val ratios = days.map(d =>
      s"CAST(w1.${d}_units AS DOUBLE) / CAST(w2.${d}_units AS DOUBLE) AS ${d}_ratio")
      .mkString(",\n             ")
    s"""
      WITH wk AS (
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(weekofyear(o_orderdate) AS INT) AS wk,
               $pivots
        FROM orders
        WHERE year(o_orderdate) IN (1996, 1997)
          AND weekofyear(o_orderdate) BETWEEN 2 AND 50
        GROUP BY yr, wk)
      SELECT w1.wk AS wk, $ratios
      FROM wk w1 JOIN wk w2 ON w1.wk = w2.wk
      WHERE w1.yr = 1996 AND w2.yr = 1997"""
  }
  val qTpcdsQ2 = QDef("q_tpcds_q2", sqlQ(q2Sql("spark")), Some(q2Sql("duck")))

  /** TPC-DS Q62 shape: shipping-latency bucket matrix — days between
    * order and ship date routed into five CASE buckets of conditional
    * counts, grouped by order priority. (The fixture's ship dates are
    * uncorrelated with order dates, so a negative bucket exists — kept,
    * it is data-honest.) The datediff spelling differs per dialect with
    * identical day-boundary semantics on midnight timestamps. Planner
    * path: wide multi-CASE conditional aggregation over a fact-fact
    * equi-join — the one-pass fused form of Q9's subquery fan. Scale:
    * one sort-merge join on l_orderkey, one map-side-combinable
    * aggregate to 5 rows; the CASE routing adds zero shuffle.
    */
  private def q62Sql(dialect: String): String = {
    val dd = dialect match {
      case "spark" => "datediff(l_shipdate, o_orderdate)"
      case _       => "date_diff('day', o_orderdate, l_shipdate)"
    }
    def bucket(cond: String, name: String) =
      s"CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS $name"
    s"""
      SELECT o_orderpriority,
             ${bucket(s"$dd < 0", "d_early")},
             ${bucket(s"$dd BETWEEN 0 AND 30", "d_30")},
             ${bucket(s"$dd BETWEEN 31 AND 60", "d_60")},
             ${bucket(s"$dd BETWEEN 61 AND 90", "d_90")},
             ${bucket(s"$dd > 90", "d_late")},
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority"""
  }
  val qTpcdsQ62 = QDef("q_tpcds_q62", sqlQ(q62Sql("spark")), Some(q62Sql("duck")))

  val defs: Seq[QDef] = Seq(qTpcdsQ94, qTpcdsQ9, qTpcdsQ2, qTpcdsQ62)
}
