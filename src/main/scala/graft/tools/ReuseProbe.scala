package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: does non-AQE physical planning reuse identical duplicated
  * exchanges over checkpoint-scan leaves (the fused-Pregel shape)? Builds
  * state→messages→fold twice-referencing compositions at k=2 inside a
  * Pregel-style loop session and prints whether `ReusedExchange` appears.
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("graft-reuse-probe")
    import spark.implicits._
    val verts = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "v")
    val edges = (1L to 999L).map(i => (i, i + 1)).toDF("src", "dst")
    val ls = org.apache.spark.sql.graft.InternalSnap.loopSession(verts, 4)
    val cur = graft.operators.Iterate.snapKeyed(verts, Seq("id"), 4, false, Some(ls))
    val e = graft.operators.Iterate.snapKeyed(edges, Seq("src"), 4, false, Some(ls))
    def relax(state: org.apache.spark.sql.DataFrame) = {
      val tri = e.join(state.select(col("id").as("_sid"), col("v").as("_sv"))
        .hint("shuffle_hash"), col("src") === col("_sid"))
      val delivered = tri.select(col("dst").as("id"), col("_sv").as("m"))
        .groupBy("id").agg(min("m").as("m")).hint("shuffle_hash")
      state.join(delivered, Seq("id"), "left")
        .withColumn("v", least(col("v"), col("m"))).drop("m")
    }
    val fused = relax(relax(cur))
    val plan = fused.queryExecution.executedPlan.toString
    val nEx = "(?m)^\\s*(?:[+:][- ]+)*Exchange ".r.findAllIn(plan).size
    val nRe = "ReusedExchange".r.findAllIn(plan).size
    println(s"[reuse-probe] loopSession exchanges=$nEx reused=$nRe")
    // Where does canonical equality break? Compare the two d1 exchanges.
    val exs = fused.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    if (exs.size >= 2) {
      val Seq(a, b) = exs.takeRight(2).toSeq
      var pa: org.apache.spark.sql.execution.SparkPlan = a
      var pb: org.apache.spark.sql.execution.SparkPlan = b
      var depth = 0
      while (pa.children.nonEmpty && pb.children.nonEmpty) {
        println(s"[reuse-probe] depth $depth ${pa.nodeName}/${pb.nodeName} " +
          s"sameResult=${pa.sameResult(pb)}")
        pa = pa.children.head; pb = pb.children.head; depth += 1
      }
      println(s"[reuse-probe] leaf ${pa.nodeName}/${pb.nodeName} sameResult=${pa.sameResult(pb)}")
      println(s"[reuse-probe] leaf canonical a=${pa.canonicalized}")
      println(s"[reuse-probe] leaf canonical b=${pb.canonicalized}")
      (pa.canonicalized, pb.canonicalized) match {
        case (ra: org.apache.spark.sql.execution.RDDScanExec,
              rb: org.apache.spark.sql.execution.RDDScanExec) =>
          println(s"[reuse-probe] part a=${ra.outputPartitioning} b=${rb.outputPartitioning}")
          println(s"[reuse-probe] ord a=${ra.outputOrdering} b=${rb.outputOrdering}")
          println(s"[reuse-probe] rddEq=${ra.rdd eq rb.rdd} nameEq=${ra.name == rb.name} outEq=${ra.output == rb.output} caseEq=${ra == rb}")
        case _ => ()
      }
    }
    if (sys.env.get("SPARK_GRAFT_REUSE_PLAN").contains("1")) println(plan)
    spark.stop()
  }
}
