package graft

/** Dev tool: print the executed-plan skeleton (joins/exchanges/windows/
  * aggregates) of named declared queries at a given SF dir, after running
  * them so AQE finalizes. Usage:
  *
  *   sbt "Test/runMain graft.PlanAudit /root/testdata/sf0.1 q_tpcds_q64 ..."
  *
  * No args → audits every bench-flagged query.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.benchQueries.map(_.name)
    val spark = Engine.session("plan-audit")
    try {
      for (n <- names) {
        println(s"===== $n =====")
        val df = SparkEntry.queries(n)(spark, sf)
        df.collect() // finalize AQE
        val interesting = df.queryExecution.executedPlan.toString.linesIterator
          .filter(l => Seq("Join", "Exchange", "Window", "Expand",
            "TakeOrdered", "HashAggregate", "Scan parquet").exists(l.contains))
          .map(_.replaceAll("\\[plan_id=\\d+\\]", "").take(170))
        println(interesting.mkString("\n"))
      }
    } finally {
      SessionCache.clear(spark)
      Tables.clear(spark)
      spark.stop()
    }
  }
}
