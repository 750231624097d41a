package graft.queries

import graft.{QDef, QModule}

/** Byte-pair-encoding token counting — the TOKENIZER grain every real
  * training-data budget is denominated in (whitespace words under-count
  * 2-3× on sub-word vocabularies). A toy merge-rank vocabulary stands in
  * for a learned one — determinism and the execution shape are the
  * point, not linguistic fidelity: the merge table is the broadcast
  * dimension (in SQL-text form here, a broadcast lookup at vocab scale),
  * and encoding is a pure per-document projection — ONE corpus scan,
  * zero shuffles, zero UDFs.
  *
  * Encoding semantics (identical in both dialects, and pinned against a
  * plain-Scala reference in `BpeSpec`): a word is split to characters,
  * then each merge rule `(a, b) → ab` is applied in rank order as one
  * greedy left-to-right pass — expressed as an ordered fold
  * (`aggregate` HOF in Spark; `list_reduce` in DuckDB, which uses the
  * first element as the seed, so elements are wrapped in single-element
  * lists to make the accumulator a token list). Applying each rule once
  * in rank order is the standard greedy approximation of priority-queue
  * BPE encoding; on a vocabulary whose merges are learned bottom-up
  * (each rule's inputs exist before it) the two diverge only on
  * adversarial token chains.
  *
  * Scale (100 TB): the whole computation is a codegen-friendly
  * projection over `documents` — it partitions with the scan, pushes
  * down column pruning (only `text`/`lang` read), and adds NO exchange;
  * the budget-cut twin inherits q_stat_token_budget's one-shuffle
  * window shape with the BPE grain swapped in.
  */
object Bpe extends QModule {

  /** Merge rules in rank order: (left, right) → left+right. Chains build
    * corpus-frequent whole words (table, value, scan, hash, part, row,
    * key) through their intermediate pairs; (l,l) exercises the doubled-
    * letter greedy case ("lla" folds left: [ll, a]).
    */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "a", "b" -> "l", "ta" -> "bl", "tabl" -> "e",
    "v" -> "a", "l" -> "u", "va" -> "lu", "valu" -> "e",
    "s" -> "c", "sc" -> "a", "sca" -> "n",
    "h" -> "a", "ha" -> "s", "has" -> "h",
    "p" -> "a", "pa" -> "r", "par" -> "t",
    "r" -> "o", "ro" -> "w",
    "k" -> "e", "ke" -> "y",
    "l" -> "l")

  /** Spark SQL: BPE token array of one word expression. */
  def sparkTokens(word: String): String =
    merges.zipWithIndex.foldLeft(
      s"filter(split($word, ''), c0 -> c0 != '')") { case (prev, ((a, b), k)) =>
      val (acc, x) = (s"a$k", s"x$k")
      s"""aggregate($prev, CAST(array() AS ARRAY<STRING>),
          ($acc, $x) -> IF(get($acc, size($acc) - 1) = '$a' AND $x = '$b',
            concat(slice($acc, 1, size($acc) - 1), array('$a$b')),
            concat($acc, array($x))))"""
    }

  /** DuckDB SQL: BPE token list of one word expression. `list_reduce`
    * seeds from the first element, so each pass wraps tokens in
    * single-element lists; `acc[1:-2]` is drop-last.
    */
  def duckTokens(word: String): String =
    merges.zipWithIndex.foldLeft(
      s"string_split($word, '')") { case (prev, ((a, b), k)) =>
      val (acc, x, w) = (s"a$k", s"x$k", s"w$k")
      s"""list_reduce(list_transform($prev, $w -> [$w]),
          ($acc, $x) -> CASE WHEN $acc[-1] = '$a' AND $x[1] = '$b'
            THEN list_append($acc[1:-2], '$a$b')
            ELSE list_append($acc, $x[1]) END)"""
    }

  private def bpeCountSql(dialect: String): String = dialect match {
    case "spark" =>
      s"""SELECT doc_id, lang,
            CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT) AS n_ws,
            aggregate(transform(filter(split(text, ' '), w -> w != ''),
                w -> ${sparkTokens("w")}),
              CAST(0 AS BIGINT), (s, t) -> s + size(t)) AS n_bpe
          FROM documents"""
    case _ =>
      s"""SELECT doc_id, lang,
            CAST(len(list_filter(string_split(text, ' '), w -> w != '')) AS BIGINT) AS n_ws,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(list_filter(string_split(text, ' '), w -> w != ''),
                  w -> CAST(len(${duckTokens("w")}) AS BIGINT))),
              (s, t) -> s + t) AS n_bpe
          FROM documents"""
  }

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
  private def bpeBudgetSql(dialect: String): String = {
    val nTok = dialect match {
      case "spark" =>
        s"""aggregate(transform(filter(split(text, ' '), w -> w != ''),
              w -> ${sparkTokens("w")}),
            CAST(0 AS BIGINT), (s, t) -> s + size(t))"""
      case _ =>
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(list_filter(string_split(text, ' '), w -> w != ''),
                w -> CAST(len(${duckTokens("w")}) AS BIGINT))),
            (s, t) -> s + t)"""
    }
    s"""
      SELECT lang, doc_id, n_tok, cum_tok FROM (
        SELECT lang, doc_id, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS STRING)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        FROM (SELECT lang, doc_id, $nTok AS n_tok FROM documents) t) c
      WHERE cum_tok <= CASE lang WHEN 'en' THEN 9000 WHEN 'zh' THEN 4500 ELSE 2500 END"""
  }
  val qStatBpeBudget = QDef(
    "q_stat_bpe_budget",
    sqlQ(bpeBudgetSql("spark")),
    Some(bpeBudgetSql("duck")))

  val defs: Seq[QDef] = Seq(qTextBpe, qStatBpeBudget)
}
