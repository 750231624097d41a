package graft

import java.sql.Timestamp

import graft.streaming.Streams
import graft.streaming.Streams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured-Streaming specs (SURVEY.md §5 StreamTest pattern): feed the
  * sf0.001 events through MemoryStream in micro-batches and assert the
  * incremental results equal the batch computation of the same graph.
  */
class StreamingSpec extends SparkSpecBase {

  private lazy val batchEvents: Seq[Event] = {
    val rows = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
    rows.map(r => Event(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.ts.getTime, e.event_id)).toSeq
  }

  private def runStream[T](name: String, mode: OutputMode,
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      chunks: Seq[Seq[Event]]): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = build(input.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  private def chunked(es: Seq[Event], n: Int = 8): Seq[Seq[Event]] = {
    val size = math.max(1, es.size / n)
    es.grouped(size).toSeq
  }

  test("streaming tumbling counts (complete mode) equal batch") {
    val got = runStream("t_tumb", OutputMode.Complete,
      df => Streams.tumblingCounts(df), chunked(batchEvents))
      .select("ws", "event_type", "cnt")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = Tables.load(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("streaming dedup removes duplicate event_ids across micro-batches") {
    val es = batchEvents.take(200)
    val withDups = chunked(es, 4) :+ es.take(50) // re-feed within watermark
    val got = runStream("t_dedup", OutputMode.Append,
      df => Streams.dedupStream(df), withDups)
    assert(got.count() == es.size)
    assert(got.select("event_id").distinct().count() == es.size)
  }

  test("stream-stream purchase-click join equals batch join") {
    val got = runStream("t_join", OutputMode.Append,
      df => Streams.purchaseClickJoin(df).select("p_id", "c_id"), chunked(batchEvents))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.load(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val want = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") <= col("p_ts"))
      .select("p_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("streaming session_window (append) emits watermark-closed sessions equal to batch") {
    val sentinel = Event(-1L, new Timestamp(batchEvents.last.ts.getTime + 10L * 24 * 3600 * 1000),
      -999L, "view", 0.0)
    val got = runStream("t_sw", OutputMode.Append,
      df => Streams.sessionWindows(df), chunked(batchEvents) :+ Seq(sentinel))
      .filter(col("user_id") =!= -999L)
      .select("user_id", "ss", "cnt")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val want = Tables.load(spark, sf, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("checkpoint recovery: restart resumes exactly-once (no reprocessing)") {
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("graft-ckpt-in").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
    val schema = ev.schema
    val seen = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]())
    val total = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = spark.readStream.schema(schema).json(inDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select("event_id").collect().map(_.getLong(0))
        total.addAndGet(ids.length)
        ids.foreach(id => seen.add(id)): Unit
      }
      .start()
    ev.limit(120).write.mode("append").json(inDir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val afterFirst = total.get()
    // new files + restart from the same checkpoint: the WAL (OffsetSeqLog/
    // CommitLog) must skip everything already committed
    ev.orderBy(col("event_id").desc).limit(80).write.mode("append").json(inDir)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(afterFirst == 120, s"first run processed $afterFirst")
    assert(total.get() == 200, s"reprocessing detected: ${total.get()} rows total")
  }

  test("chained stateful operators: streaming dedup feeding windowed aggregation") {
    val es = batchEvents.take(400)
    val withDups = chunked(es, 4) :+ es.take(80)
    val got = runStream("t_chain", OutputMode.Append,
      df => Streams.dedupStream(df) // already watermarked on ts
        .groupBy(window(col("ts"), "1 hour")).count()
        .select(col("window.start").as("ws"), col("count")),
      withDups)
    // append mode withholds windows not yet passed by the watermark; every
    // emitted window must match the batch count over the DEDUPED input
    val want = spark.createDataFrame(spark.sparkContext.parallelize(es.map(e =>
        org.apache.spark.sql.Row(e.event_id, e.ts))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .groupBy(window(col("ts"), "1 hour")).count()
      .select(col("window.start").as("ws"), col("count"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val gotRows = got.collect().map(r => r.getTimestamp(0) -> r.getLong(1))
    assert(gotRows.nonEmpty, "no windows emitted")
    gotRows.foreach { case (ws, n) =>
      assert(want.get(ws).contains(n), s"window $ws: got $n want ${want.get(ws)}")
    }
  }

  test("flatMapGroupsWithState sessionization matches batch session_window") {
    import spark.implicits._
    // sentinel far-future event forces the watermark past every real
    // session so event-time timeouts flush them all
    val sentinel = Event(-1L, new Timestamp(batchEvents.last.ts.getTime + 10L * 24 * 3600 * 1000),
      -999L, "view", 0.0)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.sessionizeFMGWS(input.toDS())
      .writeStream.format("memory").queryName("t_sess").outputMode(OutputMode.Append).start()
    try {
      chunked(batchEvents, 8).foreach { c => input.addData(c); q.processAllAvailable() }
      input.addData(Seq(sentinel)); q.processAllAvailable()
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_sess").filter(col("user_id") =!= -999L)
      .select("user_id", "session_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Tables.load(spark, sf, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("ss_us"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt)).toSet
    assert(got == want)
  }
}
