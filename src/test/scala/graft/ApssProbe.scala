package graft

/** Dev tool: q_sim_apss wall-clock + the prefix filter's candidate
  * reduction vs the unfiltered co-occurring pair space. Run:
  *   sbt "Test/runMain graft.ApssProbe /root/testdata/sf0.1"
  */
object ApssProbe {
  def main(args: Array[String]): Unit = {
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
}
