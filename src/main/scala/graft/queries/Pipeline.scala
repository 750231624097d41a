package graft.queries

import graft.{Exact, QDef, QModule}

/** Composite analytics — classic warehouse shapes (TPC-H-style) and the
  * end-to-end training-data-pipeline flagship, each chaining many of the
  * §2 operators in one plan. These are the queries whose PLAN matters
  * most at 100 TB: filter pushdown into every scan, broadcast dims,
  * partial aggregation before each shuffle — all verified shapes.
  */
object Pipeline extends QModule {

  /** TPC-H Q3 shape: shipping priority — join, filter, agg, top-k. */
  private val q3Sql = s"""
      SELECT l_orderkey,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-30'
        AND l_shipdate > TIMESTAMP '1998-06-30'
      GROUP BY l_orderkey
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""
  val qTpchQ3 = QDef("q_tpch_q3", sqlQ(q3Sql), Some(q3Sql), bench = true)

  /** TPC-H Q5 shape: local-supplier volume across 5 joined tables. */
  private val q5Sql = s"""
      SELECT n_name,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name"""
  val qTpchQ5 = QDef("q_tpch_q5", sqlQ(q5Sql), Some(q5Sql), bench = true)

  /** TPC-H Q10-ish: returned-item customers ranked by lost revenue. */
  private val q10Sql = s"""
      SELECT c_custkey, c_name,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS lost,
             COUNT(*) AS n_items
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name
      ORDER BY lost DESC, c_custkey LIMIT 20"""
  val qTpchQ10 = QDef("q_tpch_q10", sqlQ(q10Sql), Some(q10Sql))

  /** TPC-H Q18 shape: large-volume customers — HAVING over an aggregate
    * subquery feeding a semi join, then a 3-table join + re-aggregation.
    */
  private val q18Sql = s"""
      SELECT c_name, c_custkey, o_orderkey,
             ${Exact.dsumSql("l_quantity")} AS sum_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(28,4))) > 250)
      GROUP BY c_name, c_custkey, o_orderkey
      ORDER BY sum_qty DESC, o_orderkey LIMIT 20"""
  val qTpchQ18 = QDef("q_tpch_q18", sqlQ(q18Sql), Some(q18Sql))

  /** TPC-DS Q1 shape (windowed agg over a CTE): customers whose returned
    * revenue exceeds 1.2× their nation's average. Stresses CTE reuse, a
    * 3-table join feeding an aggregate, a window over the AGGREGATE's
    * output (tiny — one row per customer), and top-k. All arithmetic stays
    * in exact BIGINT units until the final projection, so the 1.2×
    * threshold compare is one correctly-rounded double op on both engines
    * (`x * n > 1.2 * s` instead of AVG, whose merge order is unstable).
    * Scale: the window partitions by nation over per-customer rows — at
    * 100 TB that is #customers rows, not #lineitems, and hash-partitions
    * across the cluster.
    */
  private val dsQ1Sql = s"""
      WITH cust_returns AS (
        SELECT c_custkey, c_nationkey,
               ${Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS units
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_nationkey)
      SELECT c_custkey, CAST(units AS DOUBLE) / 1e4 AS total_ret
      FROM (SELECT c_custkey, units,
                   CAST(SUM(units) OVER (PARTITION BY c_nationkey) AS BIGINT) AS nat_units,
                   COUNT(*) OVER (PARTITION BY c_nationkey) AS nat_n
            FROM cust_returns) w
      WHERE CAST(units AS DOUBLE) * nat_n > 1.2 * CAST(nat_units AS DOUBLE)
      ORDER BY total_ret DESC, c_custkey LIMIT 25"""
  val qTpcdsQ1 = QDef("q_tpcds_q1", sqlQ(dsQ1Sql), Some(dsQ1Sql), bench = true)

  /** TPC-DS Q27 shape: rollup over a snowflaked fact — lineitem joined to
    * part and supplier→nation dims, aggregated at (nation, brand), nation
    * subtotal, and grand-total grain in one Expand pass. Dims broadcast;
    * the rollup costs one shuffle of partial aggregates × 3 grouping sets.
    */
  private val dsQ27Sql = s"""
      SELECT n_name, p_brand, COUNT(*) AS n_items,
             ${Exact.dsumSql("l_quantity")} AS sum_qty,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation ON n_nationkey = s_nationkey
                    JOIN part ON p_partkey = l_partkey
      WHERE p_size <= 15
      GROUP BY ROLLUP(n_name, p_brand)"""
  val qTpcdsQ27 = QDef("q_tpcds_q27", sqlQ(dsQ27Sql), Some(dsQ27Sql), bench = true)

  /** TPC-DS Q64 shape: a deep join chain — 9 table instances (nation and
    * region each joined twice under aliases, customer-side and
    * supplier-side) into one grouped result. The planner stress the
    * reference's 103-file TPC-DS suite exercises most: join-order freedom
    * across mixed broadcast/shuffle joins. The four dim instances
    * broadcast; the fact chain (lineitem⋈orders⋈customer) sort-merges on
    * its natural keys.
    */
  private val dsQ64Sql = s"""
      SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation, p_brand,
             COUNT(*) AS n_items,
             ${Exact.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN part     ON p_partkey = l_partkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN region cr ON cr.r_regionkey = cn.n_regionkey
        JOIN region sr ON sr.r_regionkey = sn.n_regionkey
      WHERE cr.r_name = 'ASIA' AND sr.r_name IN ('ASIA', 'EUROPE')
        AND p_size <= 20
      GROUP BY cn.n_name, sn.n_name, p_brand
      ORDER BY revenue DESC, cust_nation, supp_nation, p_brand LIMIT 30"""
  val qTpcdsQ64 = QDef("q_tpcds_q64", sqlQ(dsQ64Sql), Some(dsQ64Sql), bench = true)

  /** The flagship training-data pipeline in ONE plan: language filter →
    * quality scoring → fingerprint dedup (keep min doc_id) → embedding
    * join → per-language corpus stats. Every stage is the oracle-verified
    * operator from its own module; this query proves they compose.
    */
  private def pipelineSql(dialect: String): String = {
    val replG = dialect match { case "spark" => ""; case _ => ", 'g'" }
    val dotSelf = dialect match {
      case "spark" => "dot_f(embedding, embedding)"
      case _ =>
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip(embedding, embedding), " +
          "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, v) -> acc + v)"
    }
    // Word scoring: the spark side splits ONCE in a subquery and counts
    // stop words with the native codegen'd `count_in` — the portable
    // filter-HOF idiom (kept as the DuckDB mirror) runs an interpreted
    // closure per word per document, the r2 flagship hot spot. Both count
    // words equal to a member of the stop set, so the int/int division is
    // value-identical.
    val scored = dialect match {
      case "spark" => """
        SELECT doc_id, lang, size(w) AS n_words,
               count_in(w, 'the', 'a', 'of', 'and') / size(w) AS stop_ratio,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' +', ' '))) AS fp
        FROM (SELECT doc_id, lang, text, split(text, ' ') AS w
              FROM documents WHERE lang IN ('en', 'de', 'fr'))"""
      case _ => s"""
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
               len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and'))
                 / len(string_split(text, ' ')) AS stop_ratio,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''$replG), ' +', ' '$replG))) AS fp
        FROM documents
        WHERE lang IN ('en', 'de', 'fr')"""
    }
    s"""
      WITH scored AS ($scored),
      quality AS (
        SELECT * FROM scored WHERE n_words >= 20 AND stop_ratio < 0.5),
      dedup AS (
        SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY fp),
      kept AS (
        SELECT q.doc_id, q.lang, q.n_words, q.stop_ratio
        FROM quality q JOIN dedup d ON q.doc_id = d.doc_id),
      joined AS (
        SELECT k.lang, k.n_words, k.stop_ratio, sqrt($dotSelf) AS nrm
        FROM kept k JOIN embeddings e ON k.doc_id = e.vec_id)
      SELECT lang, COUNT(*) AS n_docs,
             ${if (dialect == "spark") "SUM(n_words)" else "CAST(SUM(n_words) AS BIGINT)"} AS total_words,
             ${Exact.dsumSql("nrm", 6)} AS sum_norm
      FROM joined GROUP BY lang"""
  }

  val qPipelineClean = QDef(
    "q_pipeline_clean",
    sqlQ(pipelineSql("spark")),
    Some(pipelineSql("duck")),
    bench = true)

  /** The EMBEDDING-side curation flagship — [[qPipelineClean]]'s twin for
    * the no-labels corpus: SemDeDup-style semantic dedup decisions inside
    * LEARNED clusters (the memoized IVF index from [[Sim.ivfIndex]] — the
    * quantizer is never retrained at decision time), survivors joined to
    * their documents through a metadata gate (lang + length), then
    * deterministically md5-sharded into 16 output buckets with a per-shard
    * manifest (docs, distinct langs, char volume) — the artifact a
    * training-data writer consumes.
    *
    * Scale: the pair stage is cell-blocked (Σ cell², the SemDeDup knob),
    * removal is a distinct projection + one left-anti join, the doc join
    * keys on doc_id (co-partitionable with the corpus layout), and the
    * shard key is pure content-md5 — deterministic under retry and
    * cluster size, same contract [[graft.RetrySpec]] proves by injection.
    */
  private val pipelineEmbedDuckSql: String = s"""
      WITH ${Sim.fineListsCtes("duck")},
      rem AS (SELECT DISTINCT b.vec_id
              FROM fine a JOIN fine b
                ON a.cell = b.cell AND a.vec_id < b.vec_id
              WHERE ${Sim.dot("duck", "a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= CAST(0.4 AS DOUBLE)),
      kept AS (SELECT l.vec_id FROM fine l LEFT JOIN rem r ON r.vec_id = l.vec_id
               WHERE r.vec_id IS NULL),
      surv AS (SELECT d.doc_id, d.lang, d.n_chars
               FROM documents d JOIN kept k ON k.vec_id = d.doc_id
               WHERE d.lang IN ('en', 'de', 'fr') AND d.n_chars >= 60)
      SELECT CAST(strpos('0123456789abcdef',
               substring(md5(CONCAT('embshard:', CAST(doc_id AS VARCHAR))), 1, 1)) - 1 AS INT) AS shard,
             COUNT(*) AS n_docs,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM surv GROUP BY 1"""

  val qPipelineEmbed = QDef(
    "q_pipeline_embed",
    (s, d) => {
      import org.apache.spark.sql.functions._
      // fine grid cells (Sim.fineIndex), not the label-count coarse cells:
      // the SemDeDup pair join is Σ cell², linear only if cell size is
      // capped — the coarse form degenerated to n² at the ×100 fixture
      val lists = Sim.fineIndex(s, d)
      val a = lists.select(col("vec_id").as("a_id"), col("embedding").as("ae"),
        col("nrm").as("an"), col("cell"))
      val b = lists.select(col("vec_id").as("b_id"), col("embedding").as("be"),
        col("nrm").as("bn"), col("cell"))
      val removed = a.join(b, "cell")
        .where(col("a_id") < col("b_id"))
        .where((expr(Sim.dot("spark", "ae", "be")) / (col("an") * col("bn")))
          >= lit(0.4))
        .select(col("b_id").as("vec_id")).distinct()
      val kept = lists.select("vec_id").join(removed, Seq("vec_id"), "left_anti")
      val surv = t(s, d, "documents")
        .where(col("lang").isin("en", "de", "fr") && col("n_chars") >= 60)
        .join(kept, col("doc_id") === kept("vec_id"))
      surv
        .withColumn("shard", expr(
          "CAST(instr('0123456789abcdef', " +
            "substring(md5(CONCAT('embshard:', CAST(doc_id AS STRING))), 1, 1)) - 1 AS INT)"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"))
        .select("shard", "n_docs", "n_langs", "total_chars")
    },
    Some(pipelineEmbedDuckSql),
    bench = true)

  /** The TRAINING-MIX flagship — "assemble the data mix" end to end in
    * ONE plan over ONE corpus scan: DSIR importance selection (keep the
    * top quarter by target-domain likelihood ratio — [[Text.dsirCtes]],
    * the exact chain q_text_dsir pins), then the per-language TOKEN
    * budget cut in deterministic md5 order (the q_stat_token_budget
    * decision, applied to the selected docs' own token counts), then a
    * 16-way md5 shard manifest (docs, tokens, langs per shard) — what a
    * training-data writer consumes.
    *
    * This is the third flagship composition: [[qPipelineClean]] gates on
    * stored labels, [[qPipelineEmbed]] on learned embedding clusters,
    * and this one on corpus statistics alone (no labels, no embeddings).
    *
    * Scale: the DSIR chain is a single linear pipeline off one corpus
    * explode (see q_text_dsir's plan audit); the budget cut adds one
    * lang-keyed exchange over ALREADY-SELECTED doc-grain rows; the shard
    * aggregate is map-side combinable. Nothing downstream of the explode
    * ever rereads the corpus — `lang` and token counts ride the chain.
    */
  private def pipelineMixSql(dialect: String): String = {
    val (pos, str) = dialect match {
      case "spark" => ("instr", "STRING")
      case _       => ("strpos", "VARCHAR")
    }
    s"""
      WITH ${Text.dsirCtes(dialect)},
      kept AS (SELECT doc_id, lang, n_grams,
                      md5(CONCAT('mix:', CAST(doc_id AS $str))) AS mk
               FROM ranked WHERE rn * 4 <= n_docs),
      cut AS (SELECT doc_id, lang, n_grams, mk,
                     CAST(SUM(n_grams) OVER (PARTITION BY lang
                       ORDER BY mk, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
              FROM kept),
      surv AS (SELECT doc_id, lang, n_grams FROM cut
               WHERE cum <= CASE lang WHEN 'en' THEN 2000 ELSE 800 END)
      SELECT CAST($pos('0123456789abcdef',
               substring(md5(CONCAT('mixshard:', CAST(doc_id AS $str))), 1, 1)) - 1 AS INT) AS shard,
             COUNT(*) AS n_docs,
             CAST(SUM(n_grams) AS BIGINT) AS n_toks,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM surv GROUP BY 1"""
  }

  val qPipelineMix = QDef(
    "q_pipeline_mix",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      // Spark side rides Text.dsirRanked (no global single-partition
      // windows, r12); the cut/shard stages below mirror the oracle text
      // expression-for-expression. The lang window is PARTITIONED — the
      // scale shape is unchanged.
      val kept = Text.dsirRanked(s, d)
        .where(expr("rn * 4 <= n_docs"))
        .selectExpr("doc_id", "lang", "n_grams",
          "md5(CONCAT('mix:', CAST(doc_id AS STRING))) AS mk")
      val wCut = Window.partitionBy("lang").orderBy(col("mk"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val surv = kept
        .withColumn("cum", sum("n_grams").over(wCut).cast("long"))
        .where(expr("cum <= CASE lang WHEN 'en' THEN 2000 ELSE 800 END"))
      surv
        .selectExpr("""CAST(instr('0123456789abcdef',
            substring(md5(CONCAT('mixshard:', CAST(doc_id AS STRING))), 1, 1)) - 1 AS INT) AS shard""",
          "lang", "n_grams")
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_grams").cast("long").as("n_toks"),
          countDistinct(col("lang")).cast("long").as("n_langs"))
    },
    Some(pipelineMixSql("duck")),
    bench = true)

  val defs: Seq[QDef] = Seq(qTpchQ3, qTpchQ5, qTpchQ10, qTpchQ18,
    qTpcdsQ1, qTpcdsQ27, qTpcdsQ64, qPipelineClean, qPipelineEmbed,
    qPipelineMix)
}
