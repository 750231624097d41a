package graft.tools

import scala.jdk.CollectionConverters._

import graft.{Engine, SparkEntry}
import graft.operators.Pregel

/** Dev tool: time a Pregel-backed query's supersteps under ad-hoc Spark
  * conf overrides — the measurement loop for cutting the per-superstep
  * driver floor (scheduling + AQE re-planning + checkpoint cost), which
  * a per-query bench total averages away.
  *
  * Usage:
  *   sbt "runMain graft.tools.GraphProbe <sf-dir> <query> [k=v ...]"
  * e.g.
  *   sbt "runMain graft.tools.GraphProbe /root/testdata/sf0.01 q_graph_rank \
  *        spark.sql.adaptive.enabled=false"
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val name = if (args.length > 1) args(1) else "q_graph_rank"
    val confs = args.drop(2).toSeq.map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val b = Engine.builder("graft-graph-probe", s"local[$cpus]", cpus)
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
      for (pass <- 1 to passes) { // pass 1 warms codegen; pass 2 is the read
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        println(f"pass $pass: total $total%.2fs  confs=${confs.map(c => c._1 + "=" + c._2).mkString(",")}")
        Pregel.lastRuns.asScala.toSeq.sortBy(_._1).foreach { case (tag, rs) =>
          val line = rs.zipWithIndex
            .map { case ((n, s), i) => f"${i + 1}:$n%d/${s}%.2fs" }.mkString(" ")
          println(s"  [$tag] $line")
        }
      }
    } finally spark.stop()
  }
}
