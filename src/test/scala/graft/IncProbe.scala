package graft

import org.apache.spark.sql.functions._

/** Dev tool: decompose q_dedup_incremental's steady cost into its stages
  * (band probe, candidate distinct, verify, final admission join) by
  * timing progressively larger prefixes of the same plan. Run:
  *   sbt "Test/runMain graft.IncProbe /root/testdata/sf0.1"
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("inc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    try {
      def time[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"  $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
        r
      }
      // Warm the memoized band index (build pass, not timed per stage)
      time("warm: full query") {
        SparkEntry.queries("q_dedup_incremental")(spark, d).count()
      }
      for (pass <- 1 to 2) {
        println(s"pass $pass")
        time("full query") {
          SparkEntry.queries("q_dedup_incremental")(spark, d).count()
        }
        val bd = SessionCache.memo(spark, s"dedup-bands:$d")(
          sys.error("bands memo must exist"))
        time("band index scan") { bd.count() }
        val thr = Tables.load(spark, d, "documents")
          .agg(floor(max(col("doc_id")) * 0.9).cast("long").as("thr"))
        val withThr = bd.crossJoin(broadcast(thr))
        val idx = withThr
          .select(col("doc_id").as("old_id"), col("band"), col("bucket"))
        val probe = withThr.where(col("doc_id") > col("thr"))
          .select(col("doc_id").as("new_id"),
            col("band").as("band2"), col("bucket").as("bucket2"))
        val cand = idx.join(probe,
            col("band") === col("band2") && col("bucket") === col("bucket2") &&
              col("old_id") < col("new_id"))
          .select("old_id", "new_id").distinct()
        val nc = time("candidates") { cand.count() }
        println(s"  candidates = $nc")
        val candDocs = cand.select(col("old_id").as("doc_id"))
          .union(cand.select(col("new_id").as("doc_id"))).distinct()
        time("candDocs broadcast job") { candDocs.count() }
      }
    } finally {
      SessionCache.clear(spark)
      Tables.clear(spark)
      spark.stop()
    }
  }
}
