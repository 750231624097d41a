package graft.tools

import org.apache.spark.sql.functions._

/** Micro-decomposition of the kcore co-purchase edge build (r11): times
  * each sub-plan through the noop sink to locate the pathological stage.
  * `sbt "runMain graft.tools.KcoreBuildProbe <sf-dir>"`
  */
object KcoreBuildProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val s = graft.Engine.session("graft-kcore-build-probe")
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[kbp] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    try {
      val raw = graft.Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("a"))
      val li = graft.Tables.fanOut(raw)
      time("scan+fan")(li)
      val joined = li.hint("shuffle_hash")
        .join(li.select(col("ok").as("ok2"), col("a").as("b")),
          col("ok") === col("ok2") && col("a") < col("b"))
      time("join only")(joined)
      time("join+agg")(joined
        .groupBy("a", "b").agg(countDistinct("ok").as("nord"))
        .where(col("nord") >= 2).select("a", "b"))
      time("join+agg plain count")(joined
        .groupBy("a", "b").agg(count(lit(1)).as("nord"))
        .where(col("nord") >= 2).select("a", "b"))
      time("join+distinct+agg")(joined
        .select("a", "b", "ok").distinct()
        .groupBy("a", "b").agg(count(lit(1)).as("nord"))
        .where(col("nord") >= 2).select("a", "b"))
      // the shipped build shape's formatted plan, for plans/r11 evidence
      val shipped = joined
        .select("a", "b", "ok").distinct()
        .groupBy("a", "b").agg(count(lit(1)).as("nord"))
        .where(col("nord") >= 2).select("a", "b")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("plans/r11/q_graph_kcore_build_after.txt"),
        shipped.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      val noAqe = s.newSession()
      noAqe.conf.set("spark.sql.adaptive.enabled", "false")
      graft.Tables.clear(noAqe)
      val raw2 = graft.Tables.load(noAqe, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("a"))
      val li2 = graft.Tables.fanOut(raw2)
      val joined2 = li2.hint("shuffle_hash")
        .join(li2.select(col("ok").as("ok2"), col("a").as("b")),
          col("ok") === col("ok2") && col("a") < col("b"))
      time("join+agg NO-AQE")(joined2
        .groupBy("a", "b").agg(countDistinct("ok").as("nord"))
        .where(col("nord") >= 2).select("a", "b"))
    } finally s.stop()
  }
}
