package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print the formatted physical plan of declared queries.
  *
  * Usage: `sbt "runMain graft.Explain <sf-dir> <name>[,<name>...]"` —
  * the plan-iteration loop SURVEY §7 prescribes (explain, fix the shape,
  * re-explain) without writing a scratch main each time.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      else Seq("q_join_multi")
    val spark = Engine.builder("graft-explain", "local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n' — see SparkEntry.queries.keys"))
      println(s"\n===== $n =====")
      println(fn(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted")))
    } finally spark.stop()
  }
}
