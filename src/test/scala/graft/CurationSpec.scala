package graft

/** Constructed-input proofs for the mixture/selection curation operators:
  * DSIR importance weighting (q_text_dsir) and token-budget mixture
  * selection (q_stat_token_budget). The fixture corpus exercises them at
  * scale and the DuckDB oracle pins cross-engine equality; these suites
  * pin the SEMANTICS — the exact log2-bucket arithmetic and the exact
  * budget cut under the md5 order — against hand-computed / brute-force
  * references. Uses the [[Tables.seed]] test seam with synthetic "dir"
  * keys so the shared session's real fixture memos are untouched.
  */
class CurationSpec extends SparkSpecBase {

  private def seedDocs(dir: String, docs: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    Tables.names.filter(_ != "documents").foreach { n =>
      Tables.seed(spark, dir, n, Tables.load(spark, sf, n))
    }
    Tables.seed(spark, dir, "documents",
      docs.toDF("doc_id", "text", "lang").selectExpr(
        "doc_id", "text", "lang", "'synth' AS source", "length(text) AS n_chars"))
  }

  test("q_text_dsir computes the exact per-doc log2-bucket likelihood ratio") {
    val dir = "synth://dsir"
    // counts: aa cb=3 ct=2 -> lb(3)-lb(4) = 1-2 = -1
    //         bb cb=3 ct=3 -> lb(4)-lb(4) = 0
    //         cc cb=1 ct=0 -> lb(1)-lb(2) = 0-1 = -1
    // totals: nb=7 nt=5 -> lb(5)-lb(7) = 2-2 = 0
    seedDocs(dir, Seq(
      (1L, "aa aa bb", "en"),
      (2L, "aa cc", "fr"),
      (3L, "bb bb", "en")))
    val rows = SparkEntry.queries("q_text_dsir")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
      .toSet
    assert(rows == Set(
      (3L, 2L, 0.0, 1L, 0),            // d3: 2*0/2 - 0
      (1L, 3L, -2.0 / 3.0, 2L, 0),     // d1: (2*(-1) + 0)/3
      (2L, 2L, -1.0, 3L, 0)),          // d2: ((-1) + (-1))/2; top-25% of 3 docs = none
      s"got $rows")
  }

  test("q_text_dsir keep flag marks exactly the top quarter") {
    val dir = "synth://dsir-keep"
    // 8 docs: 4 pure-target-vocab (en), 4 pure-background-vocab (fr).
    // Every en doc outranks every fr doc; top-25% of 8 = 2 kept, and the
    // llr tie among the 4 en docs breaks by doc_id.
    val docs = (1L to 4L).map(i => (i, "tt tt tt", "en")) ++
      (5L to 8L).map(i => (i, "ff ff ff", "fr"))
    seedDocs(dir, docs)
    val kept = SparkEntry.queries("q_text_dsir")(spark, dir)
      .collect().filter(_.getInt(4) == 1).map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"got $kept")
  }

  /** Brute-force reference of the budget cut: md5-of-doc_id order per
    * lang, exact cumulative token counts, keep while cum <= budget.
    */
  private def bruteBudget(docs: Seq[(Long, String, String)],
      budget: String => Long): Set[(String, Long, Long, Long)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    docs.groupBy(_._3).flatMap { case (lang, ds) =>
      val ordered = ds.map { case (id, text, _) =>
        (id, text.split(" ").length.toLong, md5hex(id.toString))
      }.sortBy { case (id, _, k) => (k, id) }
      var cum = 0L
      ordered.flatMap { case (id, n, _) =>
        cum += n
        if (cum <= budget(lang)) Some((lang, id, n, cum)) else None
      }
    }.toSet
  }

  test("q_stat_token_budget cuts each language at its exact token budget") {
    val dir = "synth://tokbudget"
    // en: 60 docs x 100 tokens = 6000 > budget 5000 -> exactly 50 kept;
    // zh: 30 x 100 = 3000 > 2500 -> 25 kept; de: 10 x 100 = 1000 < 1500
    // -> all 10 kept (budget does not bind).
    val text100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = (1L to 60L).map(i => (i, text100, "en")) ++
      (101L to 130L).map(i => (i, text100, "zh")) ++
      (201L to 210L).map(i => (i, text100, "de"))
    seedDocs(dir, docs)
    val got = SparkEntry.queries("q_stat_token_budget")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = bruteBudget(docs,
      l => if (l == "en") 5000L else if (l == "zh") 2500L else 1500L)
    assert(got.count(_._1 == "en") == 50 && got.count(_._1 == "zh") == 25 &&
      got.count(_._1 == "de") == 10, s"unexpected per-lang counts in $got")
    assert(got == want)
  }

  test("q_stat_leakage_split: no verified near-dup pair straddles a split") {
    // The eval-integrity invariant stated directly: for every verified
    // Jaccard pair, both docs carry the same cluster AND the same split
    // (per-doc hashing would violate this for every split dup pair); the
    // split covers every document exactly once and all three splits are
    // inhabited at fixture scale.
    val split = SparkEntry.queries("q_stat_leakage_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val docs = Tables.load(spark, sf, "documents").count()
    assert(split.size.toLong == docs, "split must cover every document once")
    val pairs = graft.queries.Dedup.qDedupJaccard.fn(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain verified near-dup pairs")
    for ((a, b) <- pairs) {
      assert(split(a)._1 == split(b)._1, s"pair ($a,$b) in different clusters")
      assert(split(a)._2 == split(b)._2, s"near-dup pair ($a,$b) straddles splits")
    }
    val frac = split.values.groupBy(_._2).view.mapValues(_.size.toDouble / split.size)
    assert(frac.keySet == Set("train", "val", "test"))
    assert(frac("train") > 0.5, s"train fraction off: $frac")
  }

  test("q_stat_pps selects exactly the systematic weight-interval crossings") {
    val dir = "synth://pps"
    // one language, hand-controllable weights via text length
    val docs = (1L to 40L).map(i => (i, "x" * (10 * i).toInt, "en"))
    seedDocs(dir, docs)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // independent reference: same rule in plain Scala
    val ordered = docs.map { case (id, t, _) => (id, t.length.toLong) }
      .sortBy { case (id, _) => (md5hex(s"pps:$id"), id) }
    val tot = ordered.map(_._2).sum
    val step = math.max(tot / 10, 1)
    var cw = 0L
    val expect = ordered.flatMap { case (id, n) =>
      cw += n
      if ((cw - n) / step < cw / step) Some(id) else None
    }.toSet
    val got = SparkEntry.queries("q_stat_pps")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect, s"got $got expected $expect")
    // every multiple of step falls in exactly one interval and no doc
    // outweighs the step here, so the count is exactly tot/step = 10
    assert(expect.size == 10, s"systematic count: ${expect.size}")
  }

  test("q_text_nbayes recovers planted class vocabularies out-of-fold") {
    val dir = "synth://nbayes"
    // Three classes with DISJOINT planted vocabularies plus shared noise
    // words — the signal a seed classifier must pick up. The fixture
    // corpus can't show this (its lang labels are text-independent);
    // this corpus can: out-of-fold accuracy must be 100%.
    val vocab = Map("aa" -> "alpha beta gamma", "bb" -> "delta eps zeta",
      "cc" -> "theta iota kappa")
    val docs = (1L to 200L).map { i =>
      val c = Seq("aa", "bb", "cc")((i % 3).toInt)
      (i, s"${vocab(c)} noise common word ${vocab(c)}", c)
    }
    seedDocs(dir, docs)
    // replicate the md5 split to know which docs are scored
    def h(id: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.take(2), 16)
    }
    val expectTest = docs.filter(d => h(d._1) >= 230).map(d => d._1 -> d._3).toMap
    assert(expectTest.size == 20)
    val rows = SparkEntry.queries("q_text_nbayes")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(4)))
    assert(rows.map(_._1).toSet == expectTest.keySet, "scored docs != md5 test slice")
    for ((id, tru, pred, hit) <- rows) {
      assert(tru == expectTest(id))
      assert(pred == tru, s"doc $id: predicted $pred, planted class $tru")
      assert(hit == 1)
    }
  }
}
