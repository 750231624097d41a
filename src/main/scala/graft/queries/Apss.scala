package graft.queries

import graft.{QDef, QModule}

/** Exact all-pairs similarity self-join with PREFIX FILTERING
  * (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
  * WWW 2007; prefix/positional lemmas per Xiao et al., WWW 2008 ppjoin)
  * — the EXACT counterpart of the LSH/MinHash candidate paths in
  * [[Dedup]]/[[Sim]]: every document pair whose binary-cosine
  * similarity over distinct word-3-shingle sets meets the threshold,
  * with NO probabilistic miss.
  *
  * The term space is word 3-SHINGLES (the discriminative grain the
  * MinHash chain already uses — unigram word sets over the synthetic
  * corpus put ~70% of ALL pairs over threshold, leaving nothing to
  * filter), identified by their 60-bit `md5_long` ids exactly as the
  * MinHash signatures are — every join/aggregate key is a BIGINT, not
  * a 25-char string, and the ORACLE hashes identically (the scheme is
  * DEFINED over hashed ids, the [[Dedup]] stance). Similarity is
  * binary cosine `o / sqrt(na*nb)` (o = shared shingle ids), so the
  * threshold test is pure integer arithmetic:
  * `cos >= 0.7  <=>  100*o*o >= 49*na*nb` — no floats anywhere, the
  * output hash-compares exactly.
  *
  * Candidate generation is entirely in the plan (no driver loop):
  *   - canonical term order = (document frequency ASC, id ASC): rare
  *     shingles first, so prefixes index the SELECTIVE posting lists
  *     and boilerplate shingles stay out of candidate generation;
  *   - length filter: o <= na and o >= t*sqrt(na*nb) force
  *     49*nb <= 100*na for a qualifying pair (na <= nb);
  *   - overlap lower bound: o >= ceil(t*na) (probe side's own size)
  *     AND o >= ceil(t^2*nb) (index side's, via the length filter), so
  *     by the prefix lemma — if |A∩B| >= o' then the (|A|-o'+1)- and
  *     (|B|-o'+1)-prefixes under one global term order intersect — the
  *     PROBE prefix is the smaller doc's first `na - ceil(7*na/10) + 1`
  *     terms and the INDEX prefix is the larger doc's first
  *     `nb - ceil(49*nb/100) + 1`; both contain the lemma's required
  *     prefixes, so the equi-join on the id key misses nothing;
  *   - POSITIONAL filter: the smallest matched term is the smallest
  *     SHARED term s1 for any pair that can qualify (s1 is in both
  *     prefixes by the lemma's pigeonhole), and every shared term
  *     ranks at-or-after s1 in both docs, so
  *     o <= least(na - min(pa) + 1, nb - min(pb) + 1); pairs whose
  *     bound already fails the threshold never reach verification.
  *
  * Verification counts the exact overlap for surviving pairs only —
  * the posting join is RANK-BOUNDED by the same s1 positions (shared
  * terms cannot rank before s1; for a pair whose true s1 was not
  * matched, the undercount only lowers o, and the test is monotone, so
  * no false positive can emerge and qualifying pairs count exactly).
  * The positional posting index (doc, id, n, rank) is built ONCE per
  * (session, dir) via [[graft.SessionCache]] — the index-build/probe
  * split of the IVF/PQ family; steady-state cost is the candidate join
  * + bounded verify.
  *
  * Scale (100 TB): the posting index is the tf-idf table's shape; the
  * candidate join meets probe-prefix entries with index-prefix entries
  * per term id, and verify is bounded by surviving candidates x suffix
  * length. The ORACLE runs the UNFILTERED brute-force self-join (every
  * co-occurring pair scored) — a hash match proves prefix + positional
  * filtering LOSSLESS, not just plausible.
  */
object Apss extends QModule {

  /** The memoized positional posting index `apss_pos`: one row per
    * (doc, shingle id) with the doc's set size and the id's rank in
    * the canonical (df ASC, id ASC) order.
    *
    * Built CTE-FREE and composed with DataFrame ops over the persisted
    * shingle table — an analyzed plan carrying WithCTE/CTERelationRef
    * nodes never matches in CacheManager's cached-plan substitution, so
    * a CTE-structured index SILENTLY REBUILDS on every query (the same
    * gotcha [[Sim.ivfIndex]] documents; caught here by ApssSpec's
    * plan-contract test — the spec asserts InMemoryRelation leaves).
    */
  private def posView(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = graft.SessionCache.memo(s, s"apss_w:$d") {
      // VIEW-FREE on purpose: a cached plan that references the
      // `documents` TEMP VIEW is invalidated (uncached, cascade) the
      // moment any other sf-dir run re-registers that view — Spark's
      // replace-view invalidation. Loading structurally keeps the memo
      // alive across multi-dir sessions (found by ApssSpec's plan
      // contract failing only in full-suite order).
      graft.Tables.ensureFunctions(s)
      // fanOut: the one-time posting-index build digests every shingle;
      // single-row-group fixture scans otherwise run it on one core (r11)
      graft.Tables.fanOut(graft.Tables.load(s, d, "documents"))
        .selectExpr("doc_id", "split(lower(text), ' ') AS ws")
        .where("size(ws) >= 3")
        .selectExpr("doc_id",
          "explode(transform(sequence(0, size(ws) - 3), " +
            "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh")
        .selectExpr("doc_id", "md5_long(sh) AS term")
        .distinct()
        .persist()
    }
    val pos = graft.SessionCache.memo(s, s"apss_pos:$d") {
      val sz = w.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val dfreq = w.groupBy("term").agg(count(lit(1)).as("df"))
      w.join(dfreq, "term").join(sz, "doc_id")
        .select(col("doc_id"), col("term"), col("n"),
          row_number().over(
            Window.partitionBy("doc_id").orderBy(col("df"), col("term"))).as("p"))
        .persist()
    }
    pos.createOrReplaceTempView("apss_pos")
  }

  /** Engine side: probe-prefix x index-prefix candidates, positional
    * prune, rank-bounded exact verify.
    */
  private val apssSpark = """
    WITH pref AS (
      SELECT doc_id, term, n, p FROM apss_pos
      WHERE p <= n - ((7 * n + 9) DIV 10) + 1),
    idx AS (
      SELECT doc_id, term, n, p FROM apss_pos
      WHERE p <= n - ((49 * n + 99) DIV 100) + 1),
    cand AS (
      SELECT pr.doc_id AS ca, fx.doc_id AS cb, pr.n AS na, fx.n AS nb,
             MIN(pr.p) AS mpa, MIN(fx.p) AS mpb
      FROM pref pr JOIN idx fx ON pr.term = fx.term
      WHERE (pr.n < fx.n OR (pr.n = fx.n AND pr.doc_id < fx.doc_id))
        AND 49 * fx.n <= 100 * pr.n
      GROUP BY pr.doc_id, fx.doc_id, pr.n, fx.n),
    pruned AS (
      SELECT ca, cb, na, nb, mpa, mpb FROM cand
      WHERE 100 * LEAST(na - mpa + 1, nb - mpb + 1)
                * LEAST(na - mpa + 1, nb - mpb + 1) >= 49 * na * nb),
    ovl AS (
      SELECT c.ca, c.cb, c.na, c.nb, COUNT(*) AS o
      FROM pruned c
      JOIN apss_pos wa ON wa.doc_id = c.ca AND wa.p >= c.mpa
      JOIN apss_pos wb ON wb.doc_id = c.cb AND wb.term = wa.term AND wb.p >= c.mpb
      GROUP BY c.ca, c.cb, c.na, c.nb)
    SELECT LEAST(ca, cb) AS a_id, GREATEST(ca, cb) AS b_id, o,
           IF(ca < cb, na, nb) AS na, IF(ca < cb, nb, na) AS nb
    FROM ovl
    WHERE 100 * o * o >= 49 * na * nb"""

  /** Oracle: brute force over the SAME hashed ids — every pair sharing
    * any id is scored, no filter. A different computation path reaching
    * the same rows is what makes the hash gate a losslessness PROOF for
    * the filters (the same bar as q_dedup_jaccard's exact verify).
    */
  private val apssDuck = """
    WITH w AS (
      SELECT DISTINCT doc_id,
             CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) AS term FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - 1),
                 i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents)
        WHERE len(ws) >= 3)),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY doc_id),
    ovl AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS o
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT a_id, b_id, o, sa.n AS na, sb.n AS nb
    FROM ovl
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
    WHERE 100 * o * o >= 49 * sa.n * sb.n"""

  val qSimApss = QDef(
    "q_sim_apss",
    (s, d) => { posView(s, d); s.sql(apssSpark) },
    Some(apssDuck),
    bench = true)

  /** EXACT incremental admission (VERDICT r10 Next #7): the newest ~15%
    * of the corpus (doc_id above the 85%-of-max cutoff — the incremental
    * split) probes the SAME memoized posting index for qualifying
    * partners among everything OLDER (accumulated docs and
    * earlier-in-batch docs alike — the q_dedup_incremental partner rule,
    * but with the exact no-miss guarantee instead of LSH probability).
    *
    * Filter legality under new-vs-old pairing (sizes unordered): a
    * qualifying pair has o ≥ t·√(na·nb), which forces BOTH length
    * conditions (t²·na ≤ nb and t²·nb ≤ na) and makes the required
    * prefix on EACH side no longer than the t² prefix
    * (n − ⌈t²·n⌉ + 1) — so both sides index/probe that longer prefix
    * and the equi-join misses no qualifying pair; the positional prune
    * and rank-bounded verify carry over unchanged (their arguments are
    * side-symmetric). Candidates are O(batch-prefix × posting-list) —
    * the accumulated side is only ever probed through the term-id
    * equi-join, never rescanned pairwise (ApssSpec pins the plan).
    *
    * Oracle: the UNFILTERED brute force restricted to pairs whose newer
    * side is in the batch — hash equality proves the incremental filter
    * chain lossless, same bar as q_sim_apss.
    */
  private val apssIncSpark = """
    WITH cut AS (SELECT (MAX(doc_id) * 85) DIV 100 AS c FROM documents),
    probe AS (
      SELECT doc_id, term, n, p FROM apss_pos
      WHERE doc_id > (SELECT c FROM cut)
        AND p <= n - ((49 * n + 99) DIV 100) + 1),
    idx AS (
      SELECT doc_id, term, n, p FROM apss_pos
      WHERE p <= n - ((49 * n + 99) DIV 100) + 1),
    cand AS (
      SELECT fx.doc_id AS ca, pr.doc_id AS cb, fx.n AS na, pr.n AS nb,
             MIN(fx.p) AS mpa, MIN(pr.p) AS mpb
      FROM probe pr JOIN idx fx ON pr.term = fx.term
      WHERE fx.doc_id < pr.doc_id
        AND 49 * fx.n <= 100 * pr.n AND 49 * pr.n <= 100 * fx.n
      GROUP BY fx.doc_id, pr.doc_id, fx.n, pr.n),
    pruned AS (
      SELECT ca, cb, na, nb, mpa, mpb FROM cand
      WHERE 100 * LEAST(na - mpa + 1, nb - mpb + 1)
                * LEAST(na - mpa + 1, nb - mpb + 1) >= 49 * na * nb),
    ovl AS (
      SELECT c.ca, c.cb, c.na, c.nb, COUNT(*) AS o
      FROM pruned c
      JOIN apss_pos wa ON wa.doc_id = c.ca AND wa.p >= c.mpa
      JOIN apss_pos wb ON wb.doc_id = c.cb AND wb.term = wa.term AND wb.p >= c.mpb
      GROUP BY c.ca, c.cb, c.na, c.nb)
    SELECT ca AS a_id, cb AS b_id, o, na, nb
    FROM ovl
    WHERE 100 * o * o >= 49 * na * nb"""

  private val apssIncDuck = """
    WITH w AS (
      SELECT DISTINCT doc_id,
             CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) AS term FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - 1),
                 i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents)
        WHERE len(ws) >= 3)),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY doc_id),
    cut AS (SELECT CAST(MAX(doc_id) * 85 // 100 AS BIGINT) AS c FROM documents),
    ovl AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS o
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      WHERE b.doc_id > (SELECT c FROM cut)
      GROUP BY a.doc_id, b.doc_id)
    SELECT a_id, b_id, o, sa.n AS na, sb.n AS nb
    FROM ovl
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
    WHERE 100 * o * o >= 49 * sa.n * sb.n"""

  val qSimApssIncremental = QDef(
    "q_sim_apss_incremental",
    (s, d) => { graft.Tables.register(s, d); posView(s, d); s.sql(apssIncSpark) },
    Some(apssIncDuck))

  val defs: Seq[QDef] = Seq(qSimApss, qSimApssIncremental)
}
