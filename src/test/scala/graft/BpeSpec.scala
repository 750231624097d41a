package graft

import graft.queries.Bpe

/** BPE token counting ([[graft.queries.Bpe]]) vs an INDEPENDENT
  * plain-Scala reference: the greedy rank-ordered merge loop
  * reimplemented imperatively (no Spark, no SQL) and brute-forced over
  * every document — the same replicate-the-scheme bar as AdmissionSpec.
  * A shared misreading of `aggregate`/`list_reduce` fold semantics in
  * the two SQL dialects cannot pass it.
  */
class BpeSpec extends SparkSpecBase {

  /** Reference: chars, then one greedy left-to-right pass per merge rank. */
  private def bpeRef(word: String): Vector[String] = {
    var toks = word.split("").filter(_.nonEmpty).toVector
    for ((a, b) <- Bpe.merges) {
      var acc = Vector.empty[String]
      for (x <- toks) {
        if (acc.nonEmpty && acc.last == a && x == b) acc = acc.init :+ (a + b)
        else acc = acc :+ x
      }
      toks = acc
    }
    toks
  }

  private def engineTokens(word: String): Seq[String] = {
    val lit = "'" + word + "'"
    spark.sql(s"SELECT ${Bpe.tokenStream(lit, "spark")} AS t")
      .collect().head.getString(0)
      .split("\\|").filter(_.nonEmpty).toSeq
  }

  test("merge-chain and two-pass-replace greedy semantics (unit words)") {
    // table builds through ta/bl/tabl/table; tatata... chains are the
    // adversarial case for left-to-right replace (a match consumes the
    // next site's shared delimiter — the second pass must recover it);
    // words with no applicable merge stay character-split.
    assert(engineTokens("table") === Seq("table"))
    assert(bpeRef("table") === Vector("table"))
    assert(engineTokens("tatata") === Seq("ta", "ta", "ta"))
    assert(engineTokens("tatatatata") === Seq("ta", "ta", "ta", "ta", "ta"))
    assert(engineTokens("tat") === Seq("ta", "t"))
    assert(engineTokens("xyz") === Seq("x", "y", "z"))
    assert(engineTokens("scanner") === Seq("scan", "n", "e", "r"))
    for (w <- Seq("table", "tatata", "tatatatata", "tat", "xyz", "scanner",
        "value", "hash", "partkey", "keyvalue", "tables", "a", "papapa"))
      assert(engineTokens(w) === bpeRef(w), s"engine diverged on '$w'")
  }

  test("q_text_bpe counts equal the plain-Scala reference corpus-wide") {
    val got = Bpe.qTextBpe.fn(spark, sf)
      .select("doc_id", "n_ws", "n_bpe")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    for ((id, text) <- docs) {
      val words = text.split(" ").filter(_.nonEmpty)
      val want = (words.length.toLong, words.map(bpeRef(_).size.toLong).sum)
      assert(got(id) === want, s"doc $id diverged from the reference")
    }
  }

  /** Independent reimplementation of the training loop: token streams as
    * Vector[String], pair counts in a Map, greedy (count DESC, l, r)
    * argmax, literal greedy merge application — no Spark, no SQL, no
    * string-replace trick, NO stream escaping (the merge applies on
    * token VECTORS, so the reference has no delimiter to protect).
    */
  private def refTrain(docs: Seq[String], iters: Int): Seq[(Int, String, String)] = {
    var streams: Seq[Vector[String]] =
      docs.map(_.split("").filter(_.nonEmpty).toVector)
    (1 to iters).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for (s <- streams; (a, b) <- s.zip(s.drop(1)) if a != " " && b != " ")
        counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
      val ((l, r), _) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      streams = streams.map { s =>
        var acc = Vector.empty[String]
        for (x <- s) {
          if (acc.nonEmpty && acc.last == l && x == r) acc = acc.init :+ (l + r)
          else acc = acc :+ x
        }
        acc
      }
      (k, l, r)
    }
  }

  test("q_text_bpe_train learns the same merge table as a plain-Scala trainer") {
    // the declared query trains on the punctuated corpus variant (vowels
    // → quote/pipe/backslash/dot/comma); the reference mirrors the
    // translate with a plain char map
    val docs = Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0)).toSeq
      .map(_.map(c => Bpe.TrainTranslateFrom.indexOf(c) match {
        case -1 => c
        case i  => Bpe.TrainTranslateTo(i)
      }))
    val want = refTrain(docs, Bpe.TrainIters)
    val got = graft.queries.Bpe.qTextBpeTrain.fn(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      .sortBy(_._1)
    assert(got === want, "learned merge table diverged from the reference trainer")
    // the adversarial alphabet must actually be learned, not skipped:
    // some merge must touch a non-word character
    assert(got.exists { case (_, l, r) => !(l + r).matches("[\\w]+") },
      s"translated corpus should force punctuation merges: $got")
    // sanity: at least one learned merge must COMPOSE (one side is itself
    // a merged token), proving the iterations feed each other
    val singles = got.map(m => m._2 + m._3)
    assert(got.exists(m => m._2.length > 1 || m._3.length > 1),
      s"no compositional merge learned in ${Bpe.TrainIters} iters: $singles")
  }

  test("trainer handles the delimiter/escape alphabet itself: quotes, pipes, backslashes") {
    // corpus made ONLY of the stream's own delimiter (`|`), its escape
    // (`\`), the escape suffix letters (q, p), and quotes — every way the
    // old literal-splicing design could break. Pinned to the same
    // plain-Scala vector trainer, which never escapes anything.
    import spark.implicits._
    val docs = Seq(
      """\|'q \|'q \|'q""",
      """p\\p p\\p ||'""",
      """'q'q |p| \\\|""",
      """\|'q p\\p ||'""")
    val iters = 6
    val want = refTrain(docs, iters)
    val got = graft.queries.Bpe.train(docs.toDF("text"), iters)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      .sortBy(_._1)
    assert(got === want,
      s"adversarial-alphabet merge table diverged:\n got $got\nwant $want")
    assert(want.exists { case (_, l, r) => (l + r).exists("\\|'".contains(_)) },
      s"fixture failed to force delimiter/escape merges: $want")
  }

  test("budget cut is the token-budget window at the BPE grain") {
    // Every admitted doc fits its language budget, and the cut is tight:
    // cum_tok is the exact running sum in md5(doc_id) order.
    val rows = Bpe.qStatBpeBudget.fn(spark, sf)
      .select("lang", "doc_id", "n_tok", "cum_tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val budget = Map("en" -> 9000L, "zh" -> 4500L).withDefaultValue(2500L)
    for ((lang, _, _, cum) <- rows) assert(cum <= budget(lang))
    // per-language: cum_tok of the md5-ordered admitted docs telescopes
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_._4)
      assert(inOrder.scanLeft(0L)(_ + _._3).tail.toSeq === inOrder.map(_._4).toSeq)
    }
  }
}
