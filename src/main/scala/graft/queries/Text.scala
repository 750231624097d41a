package graft.queries

import graft.{QDef, QModule}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline (builder brief /
  * SURVEY.md §7.5): quality scoring, language-ID heuristic, token
  * counting, document fingerprinting. All pure per-row projections +
  * one aggregation — embarrassingly parallel, no shuffle except final
  * groupBys; ratios are int/int double divisions so results are exact and
  * engine-independent.
  */
object Text extends QModule {

  private val stopCondSpark = "x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and'"
  private val stopCondDuck = "x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and'"

  val qTextQuality = QDef(
    "q_text_quality",
    (s, d) => t(s, d, "documents")
      .withColumn("w", split(col("text"), " "))
      .selectExpr(
        "doc_id",
        "size(w) AS n_words",
        "length(text) AS len",
        "(length(text) - (size(w) - 1)) / size(w) AS avg_wlen",
        s"size(filter(w, $stopCondSpark)) / size(w) AS stop_ratio",
        "size(array_distinct(w)) / size(w) AS ttr",
        s"2.0 * (size(filter(w, $stopCondSpark)) / size(w)) " +
          "+ 0.1 * ((length(text) - (size(w) - 1)) / size(w)) " +
          "+ (size(array_distinct(w)) / size(w)) AS quality"),
    Some(s"""
      SELECT doc_id,
        CAST(len(w) AS INTEGER) AS n_words,
        CAST(length(text) AS INTEGER) AS len,
        (length(text) - (len(w) - 1)) / len(w) AS avg_wlen,
        len(list_filter(w, $stopCondDuck)) / len(w) AS stop_ratio,
        len(list_distinct(w)) / len(w) AS ttr,
        2.0 * (len(list_filter(w, $stopCondDuck)) / len(w))
          + 0.1 * ((length(text) - (len(w) - 1)) / len(w))
          + (len(list_distinct(w)) / len(w)) AS quality
      FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)"""),
    bench = true)

  /** N-gram-marker language ID: hit counts against per-language marker
    * sets, argmax with a fixed precedence. (The fixture vocabulary is
    * English-ish for every labeled lang, so the interesting part is the
    * deterministic scoring, not the labels.)
    */
  val qTextLangid = QDef(
    "q_text_langid",
    (s, d) => t(s, d, "documents")
      .withColumn("w", split(col("text"), " "))
      .selectExpr(
        "doc_id",
        s"size(filter(w, $stopCondSpark)) AS en_hits",
        s"CASE WHEN size(filter(w, $stopCondSpark)) > 0 THEN 'en' ELSE 'und' END AS guess",
        s"(CASE WHEN size(filter(w, $stopCondSpark)) > 0 THEN 'en' ELSE 'und' END) = lang AS agree"),
    Some(s"""
      SELECT doc_id,
        CAST(len(list_filter(w, $stopCondDuck)) AS INTEGER) AS en_hits,
        CASE WHEN len(list_filter(w, $stopCondDuck)) > 0 THEN 'en' ELSE 'und' END AS guess,
        (CASE WHEN len(list_filter(w, $stopCondDuck)) > 0 THEN 'en' ELSE 'und' END) = lang AS agree
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)"""))

  val qTextTokens = QDef(
    "q_text_tokens",
    (s, d) => t(s, d, "documents").selectExpr(
      "doc_id",
      "size(split(text, ' ')) AS n_ws",
      "size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS n_re",
      "CAST(ceil(length(text) / CAST(4 AS DOUBLE)) AS BIGINT) AS bpe_est"),
    Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
        CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS n_re,
        CAST(ceil(length(text) / CAST(4 AS DOUBLE)) AS BIGINT) AS bpe_est
      FROM documents"""))

  /** Normalized-content fingerprint (the canonical pre-dedup step). */
  val qTextFprint = QDef(
    "q_text_fprint",
    (s, d) => t(s, d, "documents").selectExpr(
      "doc_id",
      "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' +', ' '))) AS fp"),
    Some("""
      SELECT doc_id,
        md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
      FROM documents"""))

  /** Rolling polynomial hash over the token stream — an ordered fold
    * (Spark `aggregate`), which DuckDB SQL can't express positionally, so
    * it's rows-only for the driver; the ScalaTest spec pins exact values.
    */
  val qTextRollhash = QDef(
    "q_text_rollhash",
    (s, d) => t(s, d, "documents").selectExpr(
      "doc_id",
      "aggregate(split(text, ' '), 0L, (acc, x) -> " +
        "(acc * 31 + length(x) * 7 + ascii(substring(x, 1, 1))) % 1000000007) AS rh"),
    None)

  val defs: Seq[QDef] = Seq(
    qTextQuality, qTextLangid, qTextTokens, qTextFprint, qTextRollhash)
}
