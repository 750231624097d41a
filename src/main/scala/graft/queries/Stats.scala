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
    *
    * The decimal→double step goes THROUGH A STRING on both sides: engines
    * disagree on direct decimal→double once the sum needs more than 53
    * bits (DuckDB computes `(double)units · 10⁻ˢᶜᵃˡᵉ` — two roundings —
    * where Spark's BigDecimal.doubleValue rounds once; measured 1-ulp
    * divergence on syy ≈ 7.4e15 at the ×10 fixture), while decimal→string
    * is exact and string→double is correctly-rounded strtod in both. One
    * extra format/parse per GROUP (not per row) buys scale-independent
    * determinism.
    */
  val qStatCovCorr = QDef(
    "q_stat_covcorr",
    (s, d) => {
      val x = col("l_quantity").cast(DecimalType(12, 2))
      val y = col("l_extendedprice").cast(DecimalType(12, 2))
      def d2(c: org.apache.spark.sql.Column) = c.cast("string").cast("double")
      val g = t(s, d, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        d2(sum(x)).as("sx"),
        d2(sum(y)).as("sy"),
        d2(sum(x * x)).as("sxx"),
        d2(sum(y * y)).as("syy"),
        d2(sum(x * y)).as("sxy"))
      val cov = (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - lit(1))
      val vx = (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - lit(1))
      val vy = (col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - lit(1))
      g.select(col("l_returnflag"), col("n"),
        cov.as("cov_qp"), (cov / (sqrt(vx) * sqrt(vy))).as("corr_qp"))
    },
    Some("""
      WITH g AS (
        SELECT l_returnflag, COUNT(*) AS n,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sx,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sy,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxx,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS syy,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        (sxy - sx * sy / n) / (n - 1) AS cov_qp,
        ((sxy - sx * sy / n) / (n - 1)) /
          (sqrt((sxx - sx * sx / n) / (n - 1)) * sqrt((syy - sy * sy / n) / (n - 1))) AS corr_qp
      FROM g"""))

  /** Built-in stat aggregates (covar_samp/corr/stddev/skewness/kurtosis):
    * float merge order makes the raw values run-dependent in the last
    * ulps, so instead of emitting them the query emits DERIVED CHECKS —
    * each engine's builtin compared against the exact power-sum form at
    * 1e-9 mixed (absolute+relative) tolerance, a margin ~10^6 above ulp
    * drift yet ~10^6 below any algorithmic error. The definitions differ
    * per engine (Spark skewness/kurtosis are the population g1/g2;
    * DuckDB's are the bias-corrected sample G1/G2 — verified empirically),
    * so each dialect checks against ITS definition; only the booleans
    * (plus the exact group count) are hash-compared.
    */
  private def builtinSql(dialect: String): String = {
    val (skewE, kurtE) = dialect match {
      case "spark" => ("g1", "g2")
      case _ => ("g1 * sqrt(n * (n - 1)) / (n - 2)",
        "((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6)")
    }
    s"""
      WITH g AS (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS n,
          covar_samp(l_quantity, l_extendedprice) AS cov_b,
          corr(l_quantity, l_extendedprice) AS corr_b,
          stddev(l_quantity) AS std_b,
          skewness(l_quantity) AS skew_b,
          kurtosis(l_quantity) AS kurt_b,
          CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
          CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
          CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
          CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s4,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag),
      m AS (
        SELECT l_returnflag, n, cov_b, corr_b, std_b, skew_b, kurt_b,
          s2 - s1 * s1 / n AS m2,
          s3 - 3 * s1 * s2 / n + 2 * s1 * s1 * s1 / (n * n) AS m3,
          s4 - 4 * s1 * s3 / n + 6 * s1 * s1 * s2 / (n * n)
             - 3 * s1 * s1 * s1 * s1 / (n * n * n) AS m4,
          sxy - s1 * sy / n AS cxy,
          syy - sy * sy / n AS cyy
        FROM g),
      e AS (
        SELECT l_returnflag, n, cov_b, corr_b, std_b, skew_b, kurt_b, m2, cxy, cyy,
          sqrt(n) * m3 / (m2 * sqrt(m2)) AS g1,
          n * m4 / (m2 * m2) - 3 AS g2
        FROM m)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        abs(cov_b - cxy / (n - 1)) <= 1e-9 * (1 + abs(cxy / (n - 1))) AS cov_ok,
        abs(corr_b - cxy / sqrt(m2 * cyy)) <= 1e-9 * (1 + abs(cxy / sqrt(m2 * cyy))) AS corr_ok,
        abs(std_b - sqrt(m2 / (n - 1))) <= 1e-9 * (1 + sqrt(m2 / (n - 1))) AS std_ok,
        abs(skew_b - ($skewE)) <= 1e-9 * (1 + abs($skewE)) AS skew_ok,
        abs(kurt_b - ($kurtE)) <= 1e-9 * (1 + abs($kurtE)) AS kurt_ok
      FROM e"""
  }
  val qStatBuiltin = QDef(
    "q_stat_builtin",
    sqlQ(builtinSql("spark")),
    Some(builtinSql("duck")))

  /** Greenwald-Khanna approxQuantile (driver-side helper wrapped back
    * into a frame). The raw values are algorithm-specific, so the query
    * emits the GK CONTRACT instead: the returned value's exact rank
    * interval [count(<v)+1, count(<=v)] must intersect
    * [floor((phi-eps)n), ceil((phi+eps)n)] — Spark checks its GK result,
    * the oracle checks DuckDB's exact interpolated quantile (which
    * trivially satisfies the same bound, computed the same way).
    */
  val qStatApproxQuantile = QDef(
    "q_stat_approxquantile",
    (s, d) => {
      val eps = 0.01
      val li = t(s, d, "lineitem")
      val qs = li.stat
        .approxQuantile("l_extendedprice", Array(0.25, 0.5, 0.75), eps)
      import s.implicits._
      val probes = Seq(("q25", 0.25, qs(0)), ("q50", 0.50, qs(1)), ("q75", 0.75, qs(2)))
        .toDF("q", "phi", "v")
      li.crossJoin(broadcast(probes))
        .groupBy("q", "phi", "v")
        .agg(
          sum(when(col("l_extendedprice") < col("v"), 1L).otherwise(0L)).as("lt"),
          sum(when(col("l_extendedprice") <= col("v"), 1L).otherwise(0L)).as("le"),
          count(lit(1)).as("cnt"))
        .select(col("q"),
          (col("lt") + lit(1) <= ceil((col("phi") + lit(eps)) * col("cnt")) &&
            col("le") >= floor((col("phi") - lit(eps)) * col("cnt"))).as("rank_ok"))
    },
    Some("""
      WITH n AS (SELECT COUNT(*) AS cnt FROM lineitem),
      b AS (
        SELECT 'q25' AS q, 0.25 AS phi, quantile_cont(l_extendedprice, 0.25) AS v FROM lineitem
        UNION ALL
        SELECT 'q50', 0.50, quantile_cont(l_extendedprice, 0.50) FROM lineitem
        UNION ALL
        SELECT 'q75', 0.75, quantile_cont(l_extendedprice, 0.75) FROM lineitem),
      r AS (
        SELECT q, phi, v, cnt,
          (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice < b.v) AS lt,
          (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= b.v) AS le
        FROM b, n)
      SELECT q, (lt + 1 <= ceil((phi + 0.01) * cnt))
             AND (le >= floor((phi - 0.01) * cnt)) AS rank_ok
      FROM r"""))

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

  /** Deterministic train/val/test split (~80/10/10): each document's
    * split is a pure function of a 256-bucket hash of its primary key —
    * the split a training pipeline must be able to reproduce on any
    * engine, any cluster size, any retry, with no shuffled global sort
    * or seed-dependent RNG. A pure projection + one aggregate: splitting
    * 100 TB costs one scan. Per-(lang, split) counts and char volumes
    * make leakage/imbalance auditable in the same pass.
    */
  private def splitSql(dialect: String): String = {
    val pos = dialect match { case "spark" => "instr"; case _ => "strpos" }
    val hexDig = (i: Int) =>
      s"($pos('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), $i, 1)) - 1)"
    s"""
      SELECT lang, split, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM (SELECT lang, n_chars,
                   CASE WHEN h < 205 THEN 'train'
                        WHEN h < 230 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT lang, n_chars,
                         16 * ${hexDig(1)} + ${hexDig(2)} AS h
                  FROM documents) x) tagged
      GROUP BY lang, split ORDER BY lang, split"""
  }
  val qStatSplit = QDef(
    "q_stat_split",
    sqlQ(splitSql("spark")),
    Some(splitSql("duck")))

  /** Linear-regression family (SURVEY §2.8 regr_*): slope, intercept and
    * r² from exact decimal power sums — the same mirrored-double-tree
    * pattern as [[qStatCovCorr]], so values are engine-equal and
    * merge-order independent. One shared ANSI text runs in both engines.
    */
  private val regrSql = """
      WITH g AS (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sx,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sy,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxy,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxx,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, CAST(n AS BIGINT) AS regr_n,
        (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
        ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
          ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
      FROM g"""
  val qStatRegr = QDef("q_stat_regr", sqlQ(regrSql), Some(regrSql))

  /** The built-in regr_* SQL names (regr_count/avgx/avgy/slope/intercept/
    * r2): definitions are SQL-standard and shared by both engines, but the
    * float values are merge-order-dependent in the last ulps — so like
    * [[qStatBuiltin]] the query emits derived checks (each engine's
    * builtin vs the exact power-sum form, 1e-9 mixed tolerance) plus the
    * exactly-comparable regr_count. One shared ANSI text runs on both.
    */
  private val regrBuiltinSql = """
      WITH g AS (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS n,
          regr_count(l_extendedprice, l_quantity) AS rc,
          regr_avgx(l_extendedprice, l_quantity) AS rax,
          regr_avgy(l_extendedprice, l_quantity) AS ray,
          regr_slope(l_extendedprice, l_quantity) AS rs,
          regr_intercept(l_extendedprice, l_quantity) AS ri,
          regr_r2(l_extendedprice, l_quantity) AS rr2,
          CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag),
      e AS (
        SELECT l_returnflag, n, rc, rax, ray, rs, ri, rr2,
          (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_e,
          sx / n AS ax_e,
          sy / n AS ay_e,
          ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
            ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2_e
        FROM g)
      SELECT l_returnflag,
        CAST(rc AS BIGINT) AS rc,
        abs(rax - ax_e) <= 1e-9 * (1 + abs(ax_e)) AS rax_ok,
        abs(ray - ay_e) <= 1e-9 * (1 + abs(ay_e)) AS ray_ok,
        abs(rs - slope_e) <= 1e-9 * (1 + abs(slope_e)) AS rs_ok,
        abs(ri - (ay_e - slope_e * ax_e)) <= 1e-9 * (1 + abs(ay_e - slope_e * ax_e)) AS ri_ok,
        abs(rr2 - r2_e) <= 1e-9 * (1 + abs(r2_e)) AS rr2_ok
      FROM e"""
  val qStatRegrBuiltin = QDef(
    "q_stat_regr_builtin",
    sqlQ(regrBuiltinSql),
    Some(regrBuiltinSql))

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

  /** Token-budget mixture selection — the "assemble a 1T-token training
    * mix" primitive: each language gets a TOKEN budget (not a doc-count
    * quota like [[qStatQuota]]), documents are taken in deterministic
    * content-hash order, and a doc is kept iff its per-lang cumulative
    * token count still fits the budget. The running sum is exact BIGINT
    * over whitespace token counts, so the cut point is identical on any
    * engine, cluster size, or retry.
    *
    * Scale (100 TB): one scan projecting (lang, doc, n_tok), one shuffle
    * on lang, one ordered window per partition. A language big enough to
    * swamp a single partition's sort gets the two-pass prefix-sum form
    * (shard by hash prefix, per-shard subtotals broadcast as offsets) —
    * the same fallback documented for q_text_pack; the decision logic
    * (cum ≤ budget) is unchanged.
    */
  private def tokenBudgetSql(dialect: String): String = {
    val nTok = dialect match {
      case "spark" => "CAST(size(split(text, ' ')) AS BIGINT)"
      case _       => "CAST(len(string_split(text, ' ')) AS BIGINT)"
    }
    s"""
      SELECT lang, doc_id, n_tok, cum_tok FROM (
        SELECT lang, doc_id, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS STRING)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        FROM (SELECT lang, doc_id, $nTok AS n_tok FROM documents) t) c
      WHERE cum_tok <= CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2500 ELSE 1500 END"""
  }
  val qStatTokenBudget = QDef(
    "q_stat_token_budget",
    sqlQ(tokenBudgetSql("spark")),
    Some(tokenBudgetSql("duck")))

  /** Column-profiling pass (the deequ/data-quality primitive a pipeline
    * runs before trusting a new drop): per column — row count, null
    * count, exact distinct count, lexical min/max (stringified so one
    * schema profiles every type). ONE scan computes every profile: the
    * wide aggregate row unpivots into per-column rows, and the multiple
    * COUNT(DISTINCT) legs exercise Catalyst's multi-distinct Expand
    * rewrite. At 100 TB the same shape swaps exact distinct for the
    * approx_count_distinct / HLL-sketch twins (q_agg_approx,
    * q_agg_hllsketch) — the plan is otherwise identical.
    */
  private val profileSql: String = {
    val cols = Seq("l_quantity", "l_discount", "l_returnflag", "l_shipdate")
    val aggs = cols.map { c =>
      s"""COUNT($c) AS nn_$c, CAST(COUNT(DISTINCT $c) AS BIGINT) AS nd_$c,
          CAST(MIN(CAST($c AS STRING)) AS STRING) AS min_$c,
          CAST(MAX(CAST($c AS STRING)) AS STRING) AS max_$c"""
    }.mkString(",\n")
    val rows = cols.map { c =>
      s"""SELECT '$c' AS col, n, n - nn_$c AS n_null, nd_$c AS n_distinct,
                 min_$c AS min_s, max_$c AS max_s FROM a"""
    }.mkString("\nUNION ALL ")
    s"""
      WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, $aggs FROM lineitem)
      $rows"""
  }
  val qStatProfile = QDef(
    "q_stat_profile",
    sqlQ(profileSql),
    Some(profileSql))

  /** Systematic PPS sampling — probability-proportional-to-size document
    * selection per language (the weighted complement of [[qStatQuota]]'s
    * uniform per-source K): in the deterministic md5 order, each doc
    * owns the weight interval (cum − n_chars, cum], and a doc is
    * selected iff a multiple of `step = total DIV 10` falls in its
    * interval — so selection probability is proportional to n_chars
    * (the char/token-weighted sampling a data-mix pipeline wants: long
    * docs shouldn't be undersampled by uniform doc picks), ~10 docs per
    * language by construction, and everything is EXACT BIGINT
    * arithmetic in one window pass (no pow/ln priority keys, which are
    * not cross-engine reproducible). Docs longer than `step` cap at one
    * selection — the standard systematic-sampling behavior.
    *
    * Scale: one per-lang-partitioned running-sum window over doc
    * metadata only (text never read); same shape as q_stat_token_budget.
    */
  private def ppsSql(dialect: String): String = {
    val idiv = dialect match { case "spark" => "DIV"; case _ => "//" }
    s"""
      WITH cum AS (
        SELECT doc_id, lang, n_chars,
               SUM(n_chars) OVER (PARTITION BY lang
                 ORDER BY md5(CONCAT('pps:', CAST(doc_id AS STRING))), doc_id
                 ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(n_chars) OVER (PARTITION BY lang) AS tot
        FROM documents)
      SELECT doc_id, lang, n_chars, CAST(cw AS BIGINT) AS cum_chars
      FROM cum
      WHERE (cw - n_chars) $idiv GREATEST(tot $idiv 10, 1)
          < cw $idiv GREATEST(tot $idiv 10, 1)"""
  }
  val qStatPps = QDef(
    "q_stat_pps",
    sqlQ(ppsSql("spark")),
    Some(ppsSql("duck")))

  val defs: Seq[QDef] = Seq(
    qStatCrosstab, qStatCovCorr, qStatBuiltin, qStatApproxQuantile, qStatSampleBy,
    qStatMixture, qStatSplit, qStatRegr, qStatRegrBuiltin, qStatQuota,
    qStatTokenBudget, qStatProfile, qStatPps)
}
