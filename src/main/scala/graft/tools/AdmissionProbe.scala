package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Tables}
import graft.streaming.Admission

/** Dev tool: drive [[graft.streaming.Admission]] over a fixture's
  * documents in B equal batches and print per-batch seconds — the
  * flat-floor evidence for the streaming near-dup admission path
  * (per-batch cost must not grow with the accumulated corpus).
  *
  * Usage: sbt "runMain graft.tools.AdmissionProbe [sf-dir] [batches] [block|table]"
  * `table` runs the production substitution (DmlCatalog parquet append
  * tables) instead of the default block-manager delta store.
  */
object AdmissionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val batches = if (args.length > 1) args(1).toInt else 12
    val mode = if (args.length > 2) args(2) else "block"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.builder("graft-admission-probe", s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"),
          (ntile(batches).over(org.apache.spark.sql.expressions.Window
            .orderBy("doc_id")) - 1).as("b"))
        .persist()
      val total = docs.count()

      val store =
        if (mode == "table") {
          spark.conf.set("spark.sql.catalog.graft_dml",
            classOf[graft.sources.DmlCatalog].getName)
          spark.sql("DROP TABLE IF EXISTS graft_dml.admp_idx")
          spark.sql("DROP TABLE IF EXISTS graft_dml.admp_sh")
          Admission.tableStore(spark, "graft_dml", "admp")
        } else null
      var admitted = 0L
      val adm = new Admission(spark,
        df => admitted += df.where(col("keep")).count(), store = store)

      println(s"[admission-probe] $total docs, $batches batches, store=$mode")
      val times = (0 until batches).map { b =>
        val t0 = System.nanoTime()
        adm.step(docs.where(col("b") === b).select("doc_id", "text"), b.toLong)
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[admission-probe] batch ${b + 1}%3d/$batches  $s%6.2f s")
        s
      }
      val head = times.take(3).sum / 3
      val tail = times.takeRight(3).sum / 3
      println(f"[admission-probe] head-3 avg $head%.2f s, tail-3 avg $tail%.2f s " +
        f"(ratio ${tail / head}%.2f), $admitted%,d admitted, " +
        f"${total / times.sum}%.0f docs/s overall")
      adm.close()
    } finally spark.stop()
  }
}
