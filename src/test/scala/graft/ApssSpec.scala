package graft

/** Constructed-corpus proofs for q_sim_apss — exact all-pairs similarity
  * with prefix filtering. The DuckDB oracle already pins losslessness on
  * the fixture corpus (the oracle is the UNFILTERED brute force); this
  * suite pins the semantics against an independent plain-Scala reference
  * on corpora built to stress the filter's edges: identical docs, just-
  * above/just-below-threshold pairs, size-mismatched pairs the length
  * filter must kill, and a randomized corpus. Uses the [[Tables.seed]]
  * test seam so the shared session's fixture memos are untouched.
  */
class ApssSpec extends SparkSpecBase {

  private def seedDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    Tables.names.filter(_ != "documents").foreach { n =>
      Tables.seed(spark, dir, n, Tables.load(spark, sf, n))
    }
    Tables.seed(spark, dir, "documents",
      docs.toDF("doc_id", "text").selectExpr(
        "doc_id", "text", "'en' AS lang", "'synth' AS source",
        "length(text) AS n_chars"))
  }

  /** The scheme's term id, reimplemented independently: value of the
    * first 15 hex digits of md5 (what `md5_long` computes).
    */
  private def md5Long(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Independent reference: distinct hashed word-3-shingle sets, every
    * pair, integer threshold test — no prefix filter, no Spark.
    */
  private def brute(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, text) =>
      val ws = text.toLowerCase.split(" ", -1)
      val sh =
        if (ws.length >= 3) ws.sliding(3).map(g => md5Long(g.mkString(" "))).toSet
        else Set.empty[Long]
      id -> sh
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      o = (sa & sb).size.toLong
      na = sa.size.toLong; nb = sb.size.toLong
      if o > 0 && 100 * o * o >= 49 * na * nb
    } yield (a, b, o, na, nb)).toSet
  }

  private def run(dir: String): Set[(Long, Long, Long, Long, Long)] =
    SparkEntry.queries("q_sim_apss")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("q_sim_apss equals the unfiltered brute force on threshold-edge corpora") {
    val dir = "synth://apss-edge"
    // a/b identical (cos 1), a/c one changed word (high but < 1),
    // d/e share exactly half their shingles, f is a size-mismatched
    // superset of a (length filter must drop it BEFORE verify would),
    // g shares nothing.
    val docs = Seq(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
      2L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
      3L -> "w1 w2 w3 w4 wX w6 w7 w8 w9 w10",
      4L -> "a1 a2 a3 a4 a5 a6",
      5L -> "a1 a2 a3 a4 b5 b6",
      6L -> ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " + (1 to 40).map(i => s"z$i").mkString(" ")),
      7L -> "q1 q2 q3 q4 q5")
    seedDocs(dir, docs)
    val expected = brute(docs)
    assert(run(dir) == expected, s"expected $expected")
    // the edge corpus must actually exercise both outcomes
    assert(expected.exists(p => p._1 == 1L && p._2 == 2L), "identical pair missing")
    assert(!expected.exists(p => p._2 == 6L), "length filter case unexpectedly qualified")
  }

  test("q_sim_apss plans candidate equi-joins over the memoized index, never all-pairs") {
    val df = SparkEntry.queries("q_sim_apss")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"all-pairs operator in the APSS plan:\n$plan")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("InMemoryRelation"),
      "candidate/verify stages must read the memoized positional index, not rescan parquet")
  }

  test("q_sim_apss equals the brute force on a randomized near-dup corpus") {
    val dir = "synth://apss-rand"
    val rnd = new scala.util.Random(42)
    val base = (1 to 30).map(i => s"t${rnd.nextInt(12)}")
    // 40 docs: random mutations of a shared template at varying edit rates,
    // so similarities spread across the threshold.
    val docs = (1L to 40L).map { id =>
      val mutRate = rnd.nextDouble() * 0.5
      id -> base.map(w => if (rnd.nextDouble() < mutRate) s"m${rnd.nextInt(20)}" else w)
        .mkString(" ")
    }
    seedDocs(dir, docs)
    val expected = brute(docs)
    assert(expected.nonEmpty, "randomized corpus produced no qualifying pairs")
    assert(run(dir) == expected)
  }
}
