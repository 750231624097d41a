package graft.queries

import graft.{QDef, QModule}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DataFrameStatFunctions surface (SURVEY.md §2.8 stat helpers: crosstab,
  * cov/corr, approxQuantile, freqItems, sampleBy) plus deterministic
  * covariance/correlation via exact power sums (the merge-order-safe
  * variant of CentralMomentAgg — required for a value oracle, and the
  * right pattern for reproducible stats at 100 TB).
  */
object Stats extends QModule {

  val qStatCrosstab = QDef(
    "q_stat_crosstab",
    (s, d) => t(s, d, "lineitem").stat.crosstab("l_returnflag", "l_linestatus"),
    Some("""
      SELECT l_returnflag AS "l_returnflag_l_linestatus",
        CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS "F",
        CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS "O"
      FROM lineitem GROUP BY l_returnflag"""))

  /** Exact sample covariance + Pearson correlation from decimal power
    * sums, identical double expression tree on both sides.
    */
  val qStatCovCorr = QDef(
    "q_stat_covcorr",
    (s, d) => {
      val x = col("l_quantity").cast(DecimalType(12, 2))
      val y = col("l_extendedprice").cast(DecimalType(12, 2))
      val g = t(s, d, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
      val cov = (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - lit(1))
      val vx = (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - lit(1))
      val vy = (col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - lit(1))
      g.select(col("l_returnflag"), col("n"),
        cov.as("cov_qp"), (cov / (sqrt(vx) * sqrt(vy))).as("corr_qp"))
    },
    Some("""
      WITH g AS (
        SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        (sxy - sx * sy / n) / (n - 1) AS cov_qp,
        ((sxy - sx * sy / n) / (n - 1)) /
          (sqrt((sxx - sx * sx / n) / (n - 1)) * sqrt((syy - sy * sy / n) / (n - 1))) AS corr_qp
      FROM g"""))

  /** Built-in stat aggregates (covar_samp/corr/stddev/skewness/kurtosis):
    * float merge order makes them run-dependent in the last ulps, so the
    * driver does a rows-only check; OperatorSpec bounds them against the
    * exact-decimal versions.
    */
  val qStatBuiltin = QDef(
    "q_stat_builtin",
    (s, d) => t(s, d, "lineitem").groupBy("l_returnflag").agg(
      covar_samp(col("l_quantity"), col("l_extendedprice")).as("cov_b"),
      corr(col("l_quantity"), col("l_extendedprice")).as("corr_b"),
      stddev(col("l_quantity")).as("std_b"),
      skewness(col("l_quantity")).as("skew_b"),
      kurtosis(col("l_quantity")).as("kurt_b")),
    None)

  /** Greenwald-Khanna approxQuantile (driver-side helper wrapped back
    * into a frame; deterministic for a fixed dataset+epsilon, but no
    * cross-engine oracle).
    */
  val qStatApproxQuantile = QDef(
    "q_stat_approxquantile",
    (s, d) => {
      val qs = t(s, d, "lineitem").stat
        .approxQuantile("l_extendedprice", Array(0.25, 0.5, 0.75), 0.01)
      import s.implicits._
      qs.toSeq.zip(Seq("q25", "q50", "q75")).map(_.swap).toDF("q", "v")
    },
    None)

  /** Deterministic stratified sample: exact per-key Bernoulli via md5 of
    * the primary key — reproducible across engines AND cluster sizes
    * (unlike seed-based sample(), whose draw depends on partitioning).
    */
  val qStatSampleBy = QDef(
    "q_stat_samplebin",
    (s, d) => t(s, d, "orders")
      .filter(expr("instr('0123456789abcdef', substring(md5(CAST(o_orderkey AS STRING)), 1, 1)) - 1 < 4"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt")),
    Some("""
      SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
      WHERE strpos('0123456789abcdef', substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 < 4
      GROUP BY o_orderstatus"""))

  /** Training-mixture sampling: per-STRATUM keep rates (en 50%, de 25%,
    * fr 12.5%, others dropped) decided by a 256-bucket hash of the
    * primary key — the deterministic generalization of [[qStatSampleBy]]
    * that weights a corpus into a data mix. Reproducible across engines,
    * retries, and cluster sizes; rates change by editing one CASE arm.
    */
  private def mixtureSql(dialect: String): String = {
    val pos = dialect match { case "spark" => "instr"; case _ => "strpos" }
    val hexDig = (i: Int) =>
      s"($pos('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), $i, 1)) - 1)"
    s"""
      SELECT lang, COUNT(*) AS kept
      FROM documents
      WHERE 16 * ${hexDig(1)} + ${hexDig(2)} <
            CASE lang WHEN 'en' THEN 128 WHEN 'de' THEN 64 WHEN 'fr' THEN 32 ELSE 0 END
      GROUP BY lang"""
  }
  val qStatMixture = QDef(
    "q_stat_mixture",
    sqlQ(mixtureSql("spark")),
    Some(mixtureSql("duck")))

  /** Linear-regression family (SURVEY §2.8 regr_*): slope, intercept and
    * r² from exact decimal power sums — the same mirrored-double-tree
    * pattern as [[qStatCovCorr]], so values are engine-equal and
    * merge-order independent. One shared ANSI text runs in both engines.
    */
  private val regrSql = """
      WITH g AS (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, CAST(n AS BIGINT) AS regr_n,
        (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
        ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
          ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
      FROM g"""
  val qStatRegr = QDef("q_stat_regr", sqlQ(regrSql), Some(regrSql))

  /** The built-in regr_* SQL names (regr_count/avgx/avgy/slope/intercept/
    * r2) — double merge order makes the float ones run-dependent in the
    * last ulps, so rows-only like [[qStatBuiltin]]; q_stat_regr is the
    * exact-valued equivalent.
    */
  val qStatRegrBuiltin = QDef(
    "q_stat_regr_builtin",
    sqlQ("""
      SELECT l_returnflag,
        regr_count(l_extendedprice, l_quantity) AS rc,
        regr_avgx(l_extendedprice, l_quantity) AS rax,
        regr_avgy(l_extendedprice, l_quantity) AS ray,
        regr_slope(l_extendedprice, l_quantity) AS rs,
        regr_intercept(l_extendedprice, l_quantity) AS ri,
        regr_r2(l_extendedprice, l_quantity) AS rr2
      FROM lineitem GROUP BY l_returnflag"""),
    None)

  /** Per-source quota sampling: keep at most K documents per source,
    * chosen by a deterministic content-hash order (md5 of the id, id
    * tiebreak) — the source-balancing step of a training mixture. The
    * rank filter plans as WindowGroupLimit (same pushdown as
    * q_topk_perkey), so each partition keeps ≤K rows before the final
    * window — one shuffle on source, never a global sort. Hot sources at
    * 100 TB: pre-aggregate with the salted two-pass idiom
    * ([[graft.operators.Salt]]) if a single source key dominates.
    */
  private val quotaSql = """
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
        FROM documents) ranked
      WHERE rn <= 10"""
  val qStatQuota = QDef("q_stat_quota", sqlQ(quotaSql), Some(quotaSql))

  val defs: Seq[QDef] = Seq(
    qStatCrosstab, qStatCovCorr, qStatBuiltin, qStatApproxQuantile, qStatSampleBy,
    qStatMixture, qStatRegr, qStatRegrBuiltin, qStatQuota)
}
