package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Admission

/** Dev tool: throughput of the streaming near-dup admission pipeline —
  * feeds a fixture's documents through [[Admission]] in fixed-size
  * micro-batches and prints per-batch latency + sustained docs/s. The
  * number that matters at scale is the TREND across batches: the
  * accumulated index grows every step, so flat per-batch latency means
  * admission cost is probe-bound (O(batch·bands)), not corpus-bound.
  *
  *   sbt "Test/runMain graft.AdmissionProbe /root/testdata/sf0.1 500"
  */
object AdmissionProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchSize = if (args.length > 1) args(1).toInt else 500
    val spark = Engine.session("admission-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    try {
      val docs = Tables.load(spark, d, "documents")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      val flagged = new java.util.concurrent.atomic.AtomicLong
      val adm = new Admission(spark,
        df => flagged.addAndGet(df.where(!org.apache.spark.sql.functions.col("keep")).count()))
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          adm.step(b, id))
        .start()
      val t0 = System.nanoTime()
      var i = 0
      var accumulated = 0L
      docs.grouped(batchSize).foreach { g =>
        val b0 = System.nanoTime()
        input.addData(g)
        q.processAllAvailable()
        i += 1
        accumulated += g.size
        // The number that matters is the TREND of per-batch seconds as
        // `acc` (the accumulated index size) grows — flat = corpus-free.
        println(f"batch $i%3d (${g.size} docs, acc=$accumulated%7d): " +
          f"${(System.nanoTime() - b0) / 1e9}%.2fs")
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"total: ${docs.size} docs in $total%.1fs = ${docs.size / total}%.0f docs/s; " +
        s"dups flagged: ${flagged.get()}")
      q.stop(); adm.close()
    } finally spark.stop()
  }
}
