package graft.queries

import graft.{QDef, QModule}

/** Byte-pair-encoding token counting — the TOKENIZER grain every real
  * training-data budget is denominated in (whitespace words under-count
  * 2-3× on sub-word vocabularies). A toy merge-rank vocabulary stands in
  * for a learned one — determinism and the execution shape are the
  * point, not linguistic fidelity: the merge table is the broadcast
  * dimension (in SQL-text form here, a broadcast lookup at vocab scale),
  * and encoding is a pure per-document projection — ONE corpus scan,
  * zero shuffles, zero UDFs, zero higher-order functions.
  *
  * Execution shape (the round-10 re-plan): the token stream is a
  * delimiter-joined STRING (`|c|h|a|r|s|`, spaces ride along as
  * unmergeable word-boundary tokens) and each merge rule `(a, b) → ab`
  * is TWO sequential `replace('|a|b|', '|ab|')` calls — plain codegen'd
  * string scans. Two passes are exact, not heuristic: `replace` is
  * left-to-right non-overlapping, so a match consumes the shared
  * delimiter of the NEXT adjacent site; a missed site is always
  * preceded by a merged one, so missed sites are never adjacent and the
  * second pass catches them all. With distinct-token rules (a ≠ b,
  * which this vocabulary keeps by construction) merge sites are
  * disjoint and merging cannot create new sites, so two-pass replace ≡
  * the greedy left-to-right fold — pinned corpus-wide against an
  * independent plain-Scala fold in `BpeSpec`. The first cut of this
  * query folded per-word arrays through nested `aggregate` HOFs —
  * interpreted, O(len²) accumulator copies, measured 32.9 s at sf0.1;
  * this shape runs the same semantics in milliseconds-per-thousand-docs
  * entirely inside WholeStageCodegen.
  *
  * Scale (100 TB): the whole computation partitions with the scan,
  * prunes to `text`/`lang`, and adds NO exchange; the budget-cut twin
  * inherits q_stat_token_budget's one-shuffle window shape with the BPE
  * grain swapped in. Assumes the corpus alphabet excludes the `|`
  * delimiter (true of the normalized text the pipeline feeds it; any
  * reserved sentinel works).
  */
object Bpe extends QModule {

  /** Merge rules in rank order: (left, right) → left+right, all with
    * left ≠ right (the two-pass-replace exactness precondition). Chains
    * build corpus-frequent whole words (table, value, scan, hash, part,
    * row, key) through their intermediate pairs.
    */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "a", "b" -> "l", "ta" -> "bl", "tabl" -> "e",
    "v" -> "a", "l" -> "u", "va" -> "lu", "valu" -> "e",
    "s" -> "c", "sc" -> "a", "sca" -> "n",
    "h" -> "a", "ha" -> "s", "has" -> "h",
    "p" -> "a", "pa" -> "r", "par" -> "t",
    "r" -> "o", "ro" -> "w",
    "k" -> "e", "ke" -> "y")

  /** The delimited token stream of `e` after all merges — dialect-split
    * only in the char-explode regex (`$1` vs `\1`, and DuckDB's explicit
    * global flag); the 2×|merges| `replace` tower is shared text.
    */
  def tokenStream(e: String, dialect: String): String = {
    val exploded = dialect match {
      case "spark" => s"concat(regexp_replace($e, '(.)', '|$$1'), '|')"
      case _       => s"concat(regexp_replace($e, '(.)', '|\\1', 'g'), '|')"
    }
    merges.foldLeft(exploded) { case (s, (a, b)) =>
      s"replace(replace($s, '|$a|$b|', '|$a$b|'), '|$a|$b|', '|$a$b|')"
    }
  }

  /** BIGINT BPE token count of `e` (spaces excluded: they ride the
    * stream as boundary tokens and are subtracted back out).
    */
  def bpeCount(e: String, dialect: String): String = {
    val s = tokenStream(e, dialect)
    s"""CAST(length($s) - length(replace($s, '|', '')) - 1
        - (length($e) - length(replace($e, ' ', ''))) AS BIGINT)"""
  }

  private def nWs(e: String): String =
    s"CAST(CASE WHEN $e = '' THEN 0 ELSE length($e) - length(replace($e, ' ', '')) + 1 END AS BIGINT)"

  private def bpeCountSql(dialect: String): String =
    s"""SELECT doc_id, lang,
          ${nWs("text")} AS n_ws,
          ${bpeCount("text", dialect)} AS n_bpe
        FROM documents"""

  /** Tokenizer-grain counting over the corpus. */
  val qTextBpe = QDef(
    "q_text_bpe",
    sqlQ(bpeCountSql("spark")),
    Some(bpeCountSql("duck")),
    bench = true)

  /** The q_stat_token_budget mixture cut at the BPE grain: per-language
    * TOKENIZER-token budgets, documents admitted in deterministic
    * content-hash order while the exact BIGINT running sum fits.
    */
  private def bpeBudgetSql(dialect: String): String =
    s"""
      SELECT lang, doc_id, n_tok, cum_tok FROM (
        SELECT lang, doc_id, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS STRING)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        FROM (SELECT lang, doc_id, ${bpeCount("text", dialect)} AS n_tok
              FROM documents) t) c
      WHERE cum_tok <= CASE lang WHEN 'en' THEN 9000 WHEN 'zh' THEN 4500 ELSE 2500 END"""
  val qStatBpeBudget = QDef(
    "q_stat_bpe_budget",
    sqlQ(bpeBudgetSql("spark")),
    Some(bpeBudgetSql("duck")))

  /** Sequence packing at the BPE grain — q_text_pack's twin with the
    * tokenizer token count as the unit and a 1024-token context window
    * (BPE counts run ~2× whitespace words on this corpus): greedy
    * deterministic-order packing with exact BIGINT running offsets, so
    * every engine/retry computes the same bin placement. Same scale
    * shape: one lang-keyed exchange, one ordered window.
    */
  val qTextBpePack: QDef = {
    def sql(dialect: String): String = s"""
      WITH toks AS (
        SELECT doc_id, lang, ${bpeCount("text", dialect)} AS n_tok
        FROM documents),
      cum AS (
        SELECT doc_id, lang, n_tok,
               COALESCE(SUM(n_tok) OVER (PARTITION BY lang
                                         ORDER BY md5(CAST(doc_id AS STRING)), doc_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM toks)
      SELECT doc_id, lang, n_tok,
             CAST(FLOOR(CAST(cum_before AS DOUBLE) / 1024.0) AS BIGINT) AS first_bin,
             CAST(FLOOR(CAST(cum_before + n_tok - 1 AS DOUBLE) / 1024.0) AS BIGINT) AS last_bin,
             CAST(cum_before % 1024 AS BIGINT) AS bin_offset
      FROM cum"""
    QDef("q_text_bpe_pack", sqlQ(sql("spark")), Some(sql("duck")))
  }

  /** BPE vocabulary TRAINING — learn the merge table from the corpus
    * instead of assuming one: K iterations of "count adjacent token
    * pairs (within words), merge the most frequent" — the actual BPE
    * training loop (Sennrich 2016), expressed relationally. Each
    * iteration is ONE corpus pass: a pair-explode into a map-side-
    * combinable count (distinct pairs are vocabulary-bounded, so the
    * shuffle carries |vocab|² partials per map task, independent of
    * corpus size), a 1-row argmax to the driver (the bounds-probe
    * precedent — the learned pair IS driver state, it parameterizes the
    * next plan), and the two-pass-replace merge application from
    * [[tokenStream]]. The token stream snaps through `Iterate` per
    * round (lineage stays flat; previous generation released).
    *
    * ALPHABET-COMPLETE (r11): the trainer accepts ANY corpus character,
    * including the stream delimiter `|`, the escape `\`, and quotes.
    * Corpus chars are stream-escaped (`\`→`\q`, `|`→`\p`) so a bare `|`
    * appears ONLY as a token delimiter — the literal `replace` of
    * `|l|r|` then provably aligns on whole tokens (no unit ends in `\`,
    * so the escape image is sequential-replace decodable, and escaping
    * is a concatenation homomorphism so merged tokens stay escaped).
    * Learned merges are applied VALUE-level (Column literals, never SQL
    * text splicing) and unescaped only in the emitted merge table.
    *
    * Determinism: argmax ties break on (count DESC, left, right) — the
    * learned table is engine/retry/partitioning-stable, which is why
    * the DuckDB oracle (the same loop as K MATERIALIZED CTE levels with
    * scalar-subquery merge parameters, identically escaped)
    * hash-matches it, and `BpeSpec` re-learns the table with an
    * independent plain-Scala trainer — including over a corpus of
    * quotes/pipes/backslashes only.
    *
    * Scale (100 TB): K corpus passes is the honest cost of BPE training
    * (production trainers pay the same passes with delta tricks); the
    * per-pass shuffle is vocabulary-bounded, never corpus-bounded.
    */
  val TrainIters = 8

  /** Decode one stream-escaped token (see scaladoc above for why the
    * two sequential replaces are exact).
    */
  def unescape(s: String): String = s.replace("\\p", "|").replace("\\q", "\\")

  /** Run the training loop over any one-STRING-column corpus frame;
    * returns the learned (rank, l, r) merge table with UNescaped tokens.
    */
  def train(corpus: org.apache.spark.sql.DataFrame, iters: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val s = corpus.sparkSession
    import s.implicits._
    val text = col(corpus.columns.head)
    // escape, then split into one delimited unit per corpus char
    // (`(\\.|.)` — an escape pair or a single char)
    val escaped = replace(replace(text, lit("\\"), lit("\\q")), lit("|"), lit("\\p"))
    var st = graft.operators.Iterate.snap(
      corpus.select(concat(regexp_replace(escaped, "(\\\\.|.)", "|$1"), lit("|")).as("st")),
      reliable = false)
    val merges = Seq.newBuilder[(Int, String, String)]
    for (k <- 1 to iters) {
      val top = st
        .selectExpr("filter(split(st, '[|]'), t -> t != '') AS w")
        .where("size(w) >= 2")
        .selectExpr("explode(transform(sequence(1, size(w) - 1), " +
          "i -> named_struct('l', element_at(w, i), 'r', element_at(w, i + 1)))) AS p")
        .selectExpr("p.l AS l", "p.r AS r")
        .where("l <> ' ' AND r <> ' '")
        .groupBy("l", "r").count()
        // tie-break on the UNescaped tokens (the user-visible alphabet),
        // so the learned table is independent of the escape encoding
        .orderBy(col("count").desc,
          replace(replace(col("l"), lit("\\p"), lit("|")), lit("\\q"), lit("\\")),
          replace(replace(col("r"), lit("\\p"), lit("|")), lit("\\q"), lit("\\")))
        .limit(1).head()
      val (l, r) = (top.getString(0), top.getString(1))
      val prev = st
      st = graft.operators.Iterate.snap(
        st.select(
          replace(replace(col("st"), lit(s"|$l|$r|"), lit(s"|$l$r|")),
            lit(s"|$l|$r|"), lit(s"|$l$r|")).as("st")),
        reliable = false)
      prev.unpersist()
      merges += ((k, unescape(l), unescape(r)))
    }
    st.unpersist()
    merges.result().toDF("rank", "l", "r")
  }

  /** The ADVERSARIAL corpus variant the declared trainer runs on: vowels
    * become quote / pipe / backslash / dot / comma, so the learned
    * vocabulary contains the stream's own delimiter and escape chars.
    */
  val TrainTranslateFrom = "aeiou"
  val TrainTranslateTo = "'|\\.,"

  val qTextBpeTrain = QDef(
    "q_text_bpe_train",
    (s, d) => {
      import org.apache.spark.sql.functions._
      graft.Tables.register(s, d)
      train(
        s.sql("SELECT text FROM documents")
          .select(translate(col("text"), TrainTranslateFrom, TrainTranslateTo).as("text")),
        TrainIters)
    },
    Some {
      // identical escaping in DuckDB (its literals are escape-free, so
      // '\' is one backslash): translate → \→\q → |→\p → unit explode
      val t0expr = "concat(regexp_replace(replace(replace(" +
        "translate(text, 'aeiou', '''|\\.,'), " +
        "'\\', '\\q'), '|', '\\p'), '(\\\\.|.)', '|\\1', 'g'), '|')"
      val parts = scala.collection.mutable.ArrayBuffer(
        s"t0 AS MATERIALIZED (SELECT $t0expr AS st FROM documents)")
      val sel = scala.collection.mutable.ArrayBuffer.empty[String]
      for (k <- 1 to TrainIters) {
        val prev = s"t${k - 1}"
        parts += s"""p$k AS MATERIALIZED (
          SELECT l, r FROM (
            SELECT pr[1] AS l, pr[2] AS r, COUNT(*) AS cnt
            FROM (SELECT unnest(list_zip(w, w[2:])) AS pr
                  FROM (SELECT list_filter(string_split(st, '|'), t -> t <> '') AS w FROM $prev))
            WHERE pr[1] <> ' ' AND pr[2] <> ' ' AND pr[2] IS NOT NULL
            GROUP BY 1, 2) x
          ORDER BY cnt DESC, replace(replace(l, '\\p', '|'), '\\q', '\\'),
                   replace(replace(r, '\\p', '|'), '\\q', '\\') LIMIT 1)"""
        val pat = s"'|' || (SELECT l FROM p$k) || '|' || (SELECT r FROM p$k) || '|'"
        val tgt = s"'|' || (SELECT l FROM p$k) || (SELECT r FROM p$k) || '|'"
        parts += s"t$k AS MATERIALIZED (SELECT replace(replace(st, $pat, $tgt), $pat, $tgt) AS st FROM $prev)"
        sel += s"SELECT $k AS rank, replace(replace(l, '\\p', '|'), '\\q', '\\') AS l," +
          s" replace(replace(r, '\\p', '|'), '\\q', '\\') AS r FROM p$k"
      }
      "WITH " + parts.mkString(",\n") + "\n" + sel.mkString(" UNION ALL ")
    })

  val defs: Seq[QDef] = Seq(qTextBpe, qStatBpeBudget, qTextBpePack, qTextBpeTrain)
}
