package graft.tools

/** Dump the steady-state (round-2) Pregel superstep plan of the graph
  * bench members to files — the plan evidence for the iterative queries,
  * whose FINAL frame is just a scan of the converged state
  * (`graft.Explain` shows a 15-line select; the claim-bearing plan is the
  * per-superstep one `Pregel.lastPlans` pins).
  *
  * `sbt "runMain graft.tools.PregelPlanDump <sf-dir> <out-dir> [suffix]"`
  */
object PregelPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/r11"
    val suffix = if (args.length > 2) args(2) else "after"
    val spark = graft.Engine.session("graft-pregel-plan-dump")
    try {
      for (q <- Seq("q_graph_sssp", "q_graph_cc", "q_graph_rank")) {
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      import scala.jdk.CollectionConverters._
      for ((tag, plan) <- graft.operators.Pregel.lastPlans.asScala) {
        val p = java.nio.file.Paths.get(outDir, s"q_graph_${tag}_superstep_$suffix.txt")
        java.nio.file.Files.writeString(p, plan + "\n")
        println(s"wrote $p")
      }
    } finally spark.stop()
  }
}
