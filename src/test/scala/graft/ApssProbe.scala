package graft

/** Dev tool: q_sim_apss wall-clock + the prefix filter's candidate
  * reduction vs the unfiltered co-occurring pair space. Run:
  *   sbt "Test/runMain graft.ApssProbe /root/testdata/sf0.1"
  *
  * `boiler <nDocs>` mode seeds the ADVERSARIAL corpus the filter exists
  * for — every doc shares a boilerplate tail (the web-crawl shape:
  * headers, footers, licenses), so EVERY pair co-occurs and the
  * unfiltered pair space is n²/2 while true near-dups stay rare — and
  * races the filtered plan against the brute-force pair-stream plan
  * (the DuckDB oracle's shape) in the same engine:
  *   sbt "Test/runMain graft.ApssProbe boiler 6000"
  */
object ApssProbe {

  private def boilerDocs(n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(11)
    val boiler = (1 to 37).map(i => s"footer$i").mkString(" ")
    (1L to n.toLong).map { id =>
      // ~2% planted near-dups of the previous doc; others unique bodies
      if (id > 1 && rnd.nextInt(50) == 0) {
        val prev = (1 to 40).map(i => s"w${id - 1}_$i")
        (id, (prev.take(38) :+ s"mut$id").mkString(" ") + " " + boiler)
      } else
        (id, (1 to 40).map(i => s"w${id}_$i").mkString(" ") + " " + boiler)
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("boiler"))
      return boilerMain(args.lift(1).map(_.toInt).getOrElse(6000),
        brute = !args.contains("nobrute"))
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("apss-probe")
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q_sim_apss")(spark, d).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      SparkEntry.queries("q_sim_apss")(spark, d).count()
      println(f"[apss] $d: $n qualifying pairs — cold (index build) $cold%.2fs, steady ${(System.nanoTime() - t1) / 1e9}%.2fs")

      // candidate volume at each filter stage, vs the unfiltered space
      val Array(cand, pruned) = spark.sql("""
        WITH pref AS (SELECT doc_id, term, n, p FROM apss_pos
                      WHERE p <= n - ((7 * n + 9) DIV 10) + 1),
        idx AS (SELECT doc_id, term, n, p FROM apss_pos
                WHERE p <= n - ((49 * n + 99) DIV 100) + 1),
        cand AS (
          SELECT pr.doc_id AS ca, fx.doc_id AS cb, pr.n AS na, fx.n AS nb,
                 MIN(pr.p) AS mpa, MIN(fx.p) AS mpb
          FROM pref pr JOIN idx fx ON pr.term = fx.term
          WHERE (pr.n < fx.n OR (pr.n = fx.n AND pr.doc_id < fx.doc_id))
            AND 49 * fx.n <= 100 * pr.n
          GROUP BY pr.doc_id, fx.doc_id, pr.n, fx.n)
        SELECT COUNT(*),
               COUNT(IF(100 * LEAST(na - mpa + 1, nb - mpb + 1)
                            * LEAST(na - mpa + 1, nb - mpb + 1) >= 49 * na * nb, 1, NULL))
        FROM cand""").head() match { case r => Array(r.getLong(0), r.getLong(1)) }
      val brute = spark.sql("""
        SELECT COUNT(*) FROM (
          SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
          FROM apss_pos a JOIN apss_pos b
            ON a.term = b.term AND a.doc_id < b.doc_id)""").head().getLong(0)
      println(f"[apss] candidates: prefix $cand -> positional $pruned vs unfiltered co-occurring pairs: $brute (${brute.toDouble / math.max(1, pruned)}%.1fx reduction)")
    } finally spark.stop()
  }

  private def boilerMain(n: Int, brute: Boolean): Unit = {
    val spark = Engine.session("apss-boiler")
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      val dir = s"synth://apss-boiler-$n"
      Tables.names.filter(_ != "documents").foreach { t =>
        Tables.seed(spark, dir, t, Tables.load(spark, "/root/testdata/sf0.001", t))
      }
      Tables.seed(spark, dir, "documents",
        boilerDocs(n).toDF("doc_id", "text").selectExpr(
          "doc_id", "text", "'en' AS lang", "'synth' AS source",
          "length(text) AS n_chars"))

      System.err.println(s"[apss-boiler] seeded $n docs")
      // filtered plan (cold = index build + probe, then steady)
      var t0 = System.nanoTime()
      val filtered = SparkEntry.queries("q_sim_apss")(spark, dir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      SparkEntry.queries("q_sim_apss")(spark, dir).count()
      val steady = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[apss-boiler] n=$n: $filtered pairs — filtered cold $cold%.1fs / steady $steady%.1fs")
      if (!brute) return

      // brute-force pair stream over the SAME memoized posting index
      // (the oracle's plan shape, best case for it: index prebuilt)
      t0 = System.nanoTime()
      val bruteRows = spark.sql("""
        WITH sz AS (SELECT doc_id, MIN(n) AS n FROM apss_pos GROUP BY doc_id),
        ovl AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS o
          FROM apss_pos a JOIN apss_pos b
            ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT COUNT(*) FROM ovl
        JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
        WHERE 100 * o * o >= 49 * sa.n * sb.n""").head().getLong(0)
      val bruteSec = (System.nanoTime() - t0) / 1e9
      println(f"[apss-boiler] n=$n: $filtered pairs — filtered cold $cold%.1fs / steady $steady%.1fs; brute pair-stream $bruteSec%.1fs ($bruteRows rows) — pair space ${n.toLong * (n - 1) / 2} co-occurring")
    } finally spark.stop()
  }
}
