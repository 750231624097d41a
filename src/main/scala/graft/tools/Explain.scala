package graft.tools

/** Dev tool: print the formatted physical plan (and steady-state timing)
  * of one declared query — `runMain graft.tools.Explain <query> [sfDir]`.
  * Runs the query twice through the noop sink so session-memoized
  * artifacts (SessionCache views, table plan memos) are warm, i.e. the
  * reported time and plan are the steady-state per-query cost the bench
  * measures — the number the VERDICT's plan audits grade.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.builder("graft-explain", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] steady-state: ${(System.nanoTime - t0) / 1e9}%.3f s")
      df.explain("formatted")
    } finally spark.stop()
  }
}
