package graft.queries

import graft.{QDef, QModule}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function surface (SURVEY.md §2.5: WindowExec frame variants,
  * ranking, offset, aggregate-over-window). Every ordering that feeds a
  * row-addressed function (row_number, lag, running sum) is made total with
  * a key tiebreak, so results are deterministic under any partitioning;
  * rank/dense_rank/percent_rank/cume_dist keep value-only orderings to
  * exercise tie semantics (which are order-insensitive by definition).
  */
object Windows extends QModule {

  val qWinRank = QDef(
    "q_win_rank",
    (s, d) => {
      val byBal = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
      val total = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer").select(
        col("c_custkey"), col("c_nationkey"),
        rank().over(byBal).as("rnk"),
        dense_rank().over(byBal).as("drnk"),
        row_number().over(total).as("rn"))
    },
    Some("""
      SELECT c_custkey, c_nationkey,
        CAST(rank() OVER w1 AS INTEGER) AS rnk,
        CAST(dense_rank() OVER w1 AS INTEGER) AS drnk,
        CAST(row_number() OVER w2 AS INTEGER) AS rn
      FROM customer
      WINDOW w1 AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC),
             w2 AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)"""),
    bench = true)

  val qWinLagLead = QDef(
    "q_win_laglead",
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders").select(
        col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
    },
    Some("""
      SELECT o_orderkey,
        lag(o_totalprice, 1) OVER w AS prev_price,
        lead(o_totalprice, 1) OVER w AS next_price,
        o_totalprice - lag(o_totalprice, 1) OVER w AS delta
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""))

  /** Running sum, ROWS frame, exact decimal accumulation. */
  val qWinRunsum = QDef(
    "q_win_runsum",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").select(
        col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).over(w)
          .cast("double").as("run_spend"))
    },
    Some("""
      SELECT o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
      FROM orders"""),
    bench = true)

  /** RANGE frame over a numeric (epoch-micros) ordering: trailing-7-day
    * order count/value per priority class.
    */
  private val range7Sql = (tsExpr: String) => s"""
      SELECT o_orderkey,
        CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS spend_7d
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY $tsExpr
                   RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)"""
  val qWinRange = QDef(
    "q_win_range",
    sqlQ(range7Sql("unix_micros(CAST(o_orderdate AS TIMESTAMP))")),
    Some(range7Sql("epoch_us(o_orderdate)")))

  /** Builtin-semantics DEMO of global ntile/percent_rank/cume_dist — the
    * unpartitioned window is the single-task anti-pattern at scale, so this
    * is spec-only (not declared): [[qWinNtileDist]] is the canonical form,
    * and a spec asserts this demo produces the identical answer.
    */
  val qWinNtile = QDef(
    "q_win_ntile",
    (s, d) => {
      val total = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      val byBal = Window.orderBy(col("c_acctbal"))
      t(s, d, "customer").select(
        col("c_custkey"),
        ntile(4).over(total).as("quartile"),
        percent_rank().over(byBal).as("pr"),
        cume_dist().over(byBal).as("cd"))
    },
    Some("""
      SELECT c_custkey,
        CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile,
        percent_rank() OVER (ORDER BY c_acctbal) AS pr,
        cume_dist() OVER (ORDER BY c_acctbal) AS cd
      FROM customer"""))

  /** The CANONICAL global ntile/percent_rank/cume_dist: same answer as
    * the [[qWinNtile]] demo (same oracle), but no row ever passes through
    * a global single-task window. Two passes:
    *   1. histogram: count per distinct order-key value (distributed
    *      groupBy), then ONE tiny window over the histogram computes each
    *      value's cumulative offset — the single-task step touches
    *      #distinct-values rows, not #rows (money-typed keys are bounded;
    *      at 100 TB this is the standard histogram/offset trick);
    *   2. join offsets back (broadcast-able) and compute the global
    *      row_number inside a PARTITIONED window (per value, by tiebreak),
    *      then derive ntile/percent_rank/cume_dist arithmetically from
    *      (offset + local rn, group count, total n).
    * ntile boundary math mirrors Spark/DuckDB exactly: with n = 4q + r,
    * the first r tiles take q+1 rows.
    */
  val qWinNtileDist = QDef(
    "q_win_ntile_dist",
    (s, d) => {
      val c = t(s, d, "customer").select("c_custkey", "c_acctbal")
      val hist = c.groupBy("c_acctbal").agg(count(lit(1)).as("cnt"))
      // r12: the cumulative histogram offset is a two-pass distributed
      // prefix sum (GlobalOrder) — the previous unpartitioned window ran
      // the whole histogram through one task (bounded for money-typed
      // keys, but the shape generalizes to any key domain).
      val off = graft.operators.GlobalOrder.prefixSum(
        hist, Seq(col("c_acctbal")), col("cnt"), "off")
      val tot = c.agg(count(lit(1)).as("n"))
      val wIn = Window.partitionBy("c_acctbal").orderBy("c_custkey")
      c.join(off, "c_acctbal")
        .crossJoin(broadcast(tot))
        .withColumn("rn", row_number().over(wIn) + col("off"))
        .selectExpr(
          "c_custkey",
          // ntile(4): first (n % 4) tiles hold (n div 4)+1 rows. The ELSE
          // branch is reachable only when n >= 4 (for n < 4 every rn
          // satisfies the WHEN), but greatest(..,1) keeps the idiom total
          // under ANSI for any table size (ADVICE r3).
          """CAST(CASE WHEN rn <= (n % 4) * (n div 4 + 1)
                       THEN (rn - 1) div (n div 4 + 1) + 1
                       ELSE (n % 4) + (rn - 1 - (n % 4) * (n div 4 + 1)) div greatest(n div 4, 1) + 1
                  END AS INT) AS quartile""",
          // rank()-1 = offset of the value group; n = 1 pins pr to 0.0
          // (the single-row percent_rank convention) instead of 0/0
          "CASE WHEN n = 1 THEN 0.0 ELSE off / (n - 1) END AS pr",
          "(off + cnt) / n AS cd")
    },
    Some("""
      SELECT c_custkey,
        CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile,
        percent_rank() OVER (ORDER BY c_acctbal) AS pr,
        cume_dist() OVER (ORDER BY c_acctbal) AS cd
      FROM customer"""))

  /** Bounded sliding ROWS frame (2 preceding .. 1 following) and a
    * numeric-offset RANGE frame (acctbal ± 100) — the remaining
    * WindowFunctionFrame variants (offset/sliding/shrinking). The RANGE
    * branch is partitioned by c_nationkey so no row ever passes through a
    * global single-task window (it still exercises the sliding-RANGE
    * WindowFunctionFrame variant; the per-nation frame is the shape a
    * cluster can parallelize).
    */
  val qWinFrames = QDef(
    "q_win_frames",
    (s, d) => {
      val byCust = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val sliding = byCust.rowsBetween(-2, 1)
      val range = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal")).rangeBetween(-100L, 100L)
      val o = t(s, d, "orders").select(
        col("o_orderkey"),
        count(lit(1)).over(sliding).as("w_cnt"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .over(sliding).cast("double").as("w_sum"))
      val c = t(s, d, "customer").select(
        col("c_custkey").as("o_orderkey"),
        count(lit(1)).over(range).as("w_cnt"),
        lit(null).cast("double").as("w_sum"))
      o.unionByName(c)
    },
    Some("""
      SELECT o_orderkey,
        CAST(COUNT(*) OVER w AS BIGINT) AS w_cnt,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS w_sum
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
      UNION ALL
      SELECT c_custkey AS o_orderkey,
        CAST(COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                            RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS BIGINT) AS w_cnt,
        CAST(NULL AS DOUBLE) AS w_sum
      FROM customer"""))

  /** first_value / last_value / nth_value over a full-partition frame with
    * a total (unique-key) ordering — deterministic by construction. One
    * shared ANSI text for both engines.
    */
  private val firstLastSql = """
      SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS ln,
        first_value(l_partkey) OVER w AS first_pk,
        last_value(l_partkey) OVER w AS last_pk,
        nth_value(l_partkey, 2) OVER w AS second_pk
      FROM lineitem
      WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""
  val qWinFirstLast = QDef("q_win_firstlast", sqlQ(firstLastSql), Some(firstLastSql))

  /** Keep-latest-per-key dedup via row_number (the window-dedup idiom). */
  val qWinLatest = QDef(
    "q_win_latest",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_order"))
    },
    Some("""
      SELECT o_custkey, o_orderkey AS latest_order FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1"""))

  /** IGNORE NULLS navigation — "previous/latest non-null observation", the
    * gap-filling idiom (last F-status price seen so far per customer). The
    * ordering key is unique per partition so both forms are deterministic.
    * Spark spells the modifier postfix (`LAG(x) IGNORE NULLS`), DuckDB
    * in-call (`LAG(x IGNORE NULLS)`) — same semantics, split texts.
    */
  private def ignoreNullsSql(dialect: String): String = {
    val probe = "CASE WHEN o_orderstatus = 'F' THEN o_totalprice END"
    val (lagE, lastE) = dialect match {
      case "spark" => (s"LAG($probe) IGNORE NULLS",
        s"LAST_VALUE($probe) IGNORE NULLS")
      case _ => (s"LAG($probe IGNORE NULLS)", s"LAST_VALUE($probe IGNORE NULLS)")
    }
    s"""
      SELECT o_orderkey,
             $lagE OVER w AS prev_f_price,
             $lastE OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS latest_f_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)"""
  }
  val qWinIgnoreNulls = QDef(
    "q_win_ignorenulls",
    sqlQ(ignoreNullsSql("spark")),
    Some(ignoreNullsSql("duck")))

  // qWinNtile is deliberately NOT declared — spec-only demo (see its doc)
  val defs: Seq[QDef] = Seq(
    qWinRank, qWinLagLead, qWinRunsum, qWinRange, qWinNtileDist,
    qWinFrames, qWinFirstLast, qWinLatest, qWinIgnoreNulls)
}
