package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Measurement harness for one declared query (guide §1: measure first).
  *
  * `sbt "runMain graft.tools.QueryProbe <sf-dir> <name>[,<name>...] [runs]"`
  * runs each query `runs` times (default 3) through the noop sink and
  * prints, per run: wall seconds, Spark job count, stage count, task
  * count, shuffle bytes written, and records read — the per-query
  * decomposition the bench's single wall-clock number hides. Steady-state
  * cost at tiny SF is dominated by plan STRUCTURE (stages × scheduling
  * floor), so the job/stage counts are the optimization target as much as
  * the seconds.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq.map(_.trim) else Seq("q_join_multi")
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = graft.Engine.session("graft-query-probe")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val recs = new java.util.concurrent.atomic.AtomicLong
    val stageDetail = sys.env.get("SPARK_GRAFT_PROBE_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (stageDetail) {
          val i = e.stageInfo
          val ms = (for (a <- i.completionTime; b <- i.submissionTime)
            yield a - b).getOrElse(-1L)
          if (ms >= 300)
            println(f"[probe-stage] id=${i.stageId} ${ms}ms tasks=${i.numTasks} ${i.name.take(90)}")
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          recs.addAndGet(m.inputMetrics.recordsRead)
        }
      }
    })
    try names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n, sys.error(s"unknown query '$n'"))
      for (r <- 1 to runs) {
        val (j0, s0, t0, w0, i0) =
          (jobs.get, stages.get, tasks.get, shufW.get, recs.get)
        val n0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - n0) / 1e9
        Thread.sleep(300) // drain listener bus before snapshotting deltas
        println(f"[probe] $n run$r: $dt%.2f s  jobs=${jobs.get - j0}  " +
          f"stages=${stages.get - s0}  tasks=${tasks.get - t0}  " +
          f"shuffleW=${(shufW.get - w0) / 1024}KB  recordsRead=${recs.get - i0}")
      }
    } finally spark.stop()
  }
}
