package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Streaming throughput/latency benchmark (VERDICT r5 #2): the
  * BASELINE.json north star names Structured Streaming optimization as
  * this engine's Sol-delta analog — overlap ingest with computation via
  * micro-batch pipelining — and until now every streaming operator was
  * spec'd but none was TIMED. This main measures a stateful pipeline's
  * steady-state rows/sec and per-batch latency and prints one JSON line,
  * like [[Bench]].
  *
  * Pipeline under test (the canonical training-data ingest shape):
  * rate-micro-batch source → explode ×2 (manufactures real duplicates)
  * → `dropDuplicatesWithinWatermark` (RocksDB-backed dedup state)
  * → watermarked 5 s tumbling-window aggregation, update mode → noop
  * sink. Three configs isolate where time goes:
  *   - `stateless`: projection+filter only — the scheduling/source floor;
  *   - `stateful_rocksdb`: the engine default (off-heap state,
  *     incremental checkpoints — the 100 TB posture);
  *   - `stateful_hdfs`: HDFSBackedStateStoreProvider (on-heap) — the
  *     comparison point for the store knob.
  *
  * Methodology mirrors Bench: the `rate-micro-batch` source emits an
  * EXACT row count per batch (unlike `rate`, which is wall-clock bound),
  * so batches are comparable; the first `warmup` batches are excluded
  * (session/codegen/state-store spin-up); throughput = Σ input rows / Σ
  * triggerExecution over the measured window; latency percentiles come
  * from the StreamingQueryListener's progress events, the same channel a
  * production monitor would use. Knobs via env: SPARK_GRAFT_STREAM_ROWS
  * (rows/batch), SPARK_GRAFT_STREAM_BATCHES, SPARK_GRAFT_STREAM_WARMUP.
  */
object StreamBench {

  final case class BatchStat(batchId: Long, inputRows: Long, triggerMs: Long)

  /** Collects per-batch progress for ONE query run (scoped by runId —
    * the listener bus replays queued events of earlier queries).
    */
  private final class Progress extends StreamingQueryListener {
    @volatile var runId: java.util.UUID = _
    val stats = new ConcurrentLinkedQueue[BatchStat]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (runId != null && p.runId == runId && p.numInputRows > 0) {
        stats.add(BatchStat(p.batchId, p.numInputRows,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)))
      }
    }
  }

  private def pct(xs: Seq[Long], q: Double): Long =
    if (xs.isEmpty) -1L
    else {
      val s = xs.sorted
      s(math.min(s.size - 1, math.ceil(q * s.size).toInt - 1).max(0))
    }

  /** Runs one config for `batches` completed batches; returns
    * (rows/sec steady-state, p50 ms, p95 ms, measured batches, rows).
    */
  private def run(
      spark: SparkSession, name: String, graph: String, provider: String,
      rowsPerBatch: Int, batches: Int, warmup: Int,
      extraConfs: Map[String, String] = Map.empty): (Double, Long, Long, Int, Long) = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    extraConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft-sb-$name").toString
    def mkSrc = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("numPartitions", "8")
      .load()
      .select(col("timestamp").as("event_time"), col("value"))
    val src = mkSrc
    val df: DataFrame = graph match {
      case "stateless" =>
        src.select(col("value"), col("event_time"),
            pmod(col("value"), lit(100)).as("agg_key"))
          .where(col("value") % 7 =!= 0)
      case "tws" =>
        // custom-state path (transformWithState): the funnel machine from
        // Streams — one tiny ValueState per user, every row a point
        // read+write against the store. user = value % 50k keeps ~50k hot
        // keys; rate-micro-batch's monotone `value` makes each user's
        // events arrive in ts order, so the machine does real transitions.
        import org.apache.spark.sql.Encoders
        implicit val evEnc: org.apache.spark.sql.Encoder[graft.streaming.Streams.Event] =
          Encoders.product[graft.streaming.Streams.Event]
        val events = src.select(
          col("value").as("event_id"),
          col("event_time").cast("timestamp").as("ts"),
          pmod(col("value"), lit(50000)).cast("long").as("user_id"),
          element_at(
            array(lit("view"), lit("click"), lit("purchase")),
            (pmod(col("value"), lit(3)) + 1).cast("int")).as("event_type"),
          (col("value") % 100 / 10.0).as("value"))
          .as[graft.streaming.Streams.Event]
        graft.streaming.Streams.funnelTWS(events).toDF()
      case "heavy" =>
        // bounded-state sketch path: SpaceSaving heavy hitters — 80% of
        // traffic concentrates on 16 hot items, 20% is unique cold churn
        // that exercises min-eviction; state per shard is a CONSTANT
        // 16-entry MapState + one counter regardless of the key space,
        // so this measures the sketch's per-row cost, not state growth.
        import org.apache.spark.sql.Encoders
        implicit val evEnc: org.apache.spark.sql.Encoder[graft.streaming.Streams.Event] =
          Encoders.product[graft.streaming.Streams.Event]
        val events = src.select(
          col("value").as("event_id"),
          col("event_time").cast("timestamp").as("ts"),
          when(pmod(col("value"), lit(10)) < 8, pmod(col("value"), lit(16)))
            .otherwise(col("value")).cast("long").as("user_id"),
          lit("view").as("event_type"),
          lit(1.0).as("value"))
          .as[graft.streaming.Streams.Event]
        graft.streaming.Streams.heavyHittersTWS(events, shards = 8, capacity = 16).toDF()
      case "join" =>
        // stream-stream inner join (the remaining stateful operator family
        // the bench didn't cover): two INDEPENDENT rate sources emitting
        // the same id sequence, joined on the id inside a ±5 s event-time
        // window. Every row keeps join state until the watermark passes
        // the range bound, so this measures SymmetricHashJoin's two-sided
        // state commit; each row matches exactly its twin (monotone
        // unique values), so output cardinality is exact and steady.
        val imp = mkSrc.select(
            col("event_time").as("imp_time"), col("value").as("ad_id"))
          .withWatermark("imp_time", "10 seconds")
        val clk = mkSrc.select(
            col("event_time").as("clk_time"), col("value").as("click_id"))
          .withWatermark("clk_time", "10 seconds")
        imp.join(clk, expr(
          """ad_id = click_id AND
             clk_time >= imp_time - INTERVAL 5 SECONDS AND
             clk_time <= imp_time + INTERVAL 5 SECONDS"""))
      case "largeAgg" =>
        // LARGE-state aggregation: `value` is monotone UNIQUE, so every
        // row inserts a brand-new state key — after B batches the store
        // holds B×rowsPerBatch live entries (tens of millions at the
        // large-state settings), never evicted (update mode, no window).
        // This is the workload RocksDB is the default FOR: the on-heap
        // HDFS store must hold (and snapshot) every entry in the JVM
        // heap, RocksDB keeps them off-heap with incremental
        // checkpoints. The toy-state configs above measure per-batch
        // overhead; this measures state-capacity scaling.
        src.groupBy(col("value").as("k"))
          .agg(count(lit(1)).as("n"), sum("value").as("sum_v"))
      case "chained" =>
        // MULTI-stateful-operator graph: stream-stream interval join
        // feeding a watermarked tumbling-window aggregation in ONE query
        // (two stateful operators, one state checkpoint). Spark 3.4+
        // tracks a per-operator watermark (the agg's input watermark is
        // the join's OUTPUT watermark, delayed by the join's interval
        // bound), which is exactly the subtlety StreamingSpec pins for
        // correctness; this config prices it. Append mode — the agg
        // emits a window only once the propagated watermark passes it.
        val imp = mkSrc.select(
            col("event_time").as("imp_time"), col("value").as("ad_id"))
          .withWatermark("imp_time", "10 seconds")
        val clk = mkSrc.select(
            col("event_time").as("clk_time"), col("value").as("click_id"))
          .withWatermark("clk_time", "10 seconds")
        imp.join(clk, expr(
            """ad_id = click_id AND
               clk_time >= imp_time - INTERVAL 5 SECONDS AND
               clk_time <= imp_time + INTERVAL 5 SECONDS"""))
          .groupBy(window(col("imp_time"), "5 seconds"),
            pmod(col("ad_id"), lit(100)).as("agg_key"))
          .agg(count(lit(1)).as("n"))
      case _ =>
        src
          // two bit-identical copies of every row = real dedup work
          .select(col("event_time"), col("value"),
            explode(array(lit(0), lit(1))).as("copy"))
          .drop("copy")
          .withWatermark("event_time", "10 seconds")
          .dropDuplicatesWithinWatermark("value")
          .groupBy(window(col("event_time"), "5 seconds"),
            pmod(col("value"), lit(100)).as("agg_key"))
          .agg(count(lit(1)).as("n"), sum("value").as("sum_v"))
    }
    val listener = new Progress
    spark.streams.addListener(listener)
    val q = df.writeStream
      .format("noop")
      .outputMode(graph match {
        case "stateless" | "tws" | "join" | "chained" => "append"
        case _ => "update" // dedupAgg, heavy, largeAgg
      })
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0L))
      .queryName(s"streambench-$name")
      .start()
    listener.runId = q.runId
    try {
      val deadlineMin =
        sys.env.getOrElse("SPARK_GRAFT_STREAM_DEADLINE_MIN", "10").toLong
      val deadline = System.nanoTime() + deadlineMin * 60 * 1000 * 1000 * 1000
      while (listener.stats.size < batches && System.nanoTime() < deadline) {
        q.exception.foreach(throw _)
        Thread.sleep(50)
      }
      require(listener.stats.size >= batches,
        s"$name: only ${listener.stats.size}/$batches batches within deadline")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(ckpt))
    }
    val measured = listener.stats.asScala.toVector
      .sortBy(_.batchId).slice(warmup, batches)
    val rows = measured.map(_.inputRows).sum
    val ms = measured.map(_.triggerMs)
    val thru = if (ms.sum > 0) rows.toDouble * 1000.0 / ms.sum else -1.0
    (thru, pct(ms, 0.50), pct(ms, 0.95), measured.size, rows)
  }

  def main(args: Array[String]): Unit = {
    val rowsPerBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "200000").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "25").toInt
    val warmup = sys.env.getOrElse("SPARK_GRAFT_STREAM_WARMUP", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // State-partition knob: each shuffle partition × stateful operator is
    // a state-store INSTANCE paying open/commit per batch — on one box 32
    // partitions × 2 operators = 64 stores of per-batch overhead, so
    // small-state pipelines run faster with fewer, fatter partitions
    // (sweep recorded in BASELINE.md). On a 1000-executor cluster the
    // instances spread out and the count should track total cores again.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE", "8").toInt
    val spark = Engine.builder("graft-streambench", s"local[$cpus]", shuffle)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val hdfs =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val changelog = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val baseConfigs = Seq(
      ("stateless", "stateless", rocks, Map.empty[String, String]),
      ("stateful_rocksdb", "dedupAgg", rocks, Map.empty[String, String]),
      ("stateful_hdfs", "dedupAgg", hdfs, Map.empty[String, String]),
      ("stateful_tws", "tws", rocks, Map.empty[String, String]),
      ("stateful_join", "join", rocks, Map.empty[String, String]),
      ("stateful_heavy", "heavy", rocks, Map.empty[String, String]),
      ("stateful_chained", "chained", rocks, Map.empty[String, String]))
    // Large-state sweep (SPARK_GRAFT_STREAM_LARGE=1): every row inserts a
    // new state key, so state reaches batches×rowsPerBatch live entries —
    // run it with SPARK_GRAFT_STREAM_ROWS=1000000 SPARK_GRAFT_STREAM_BATCHES=30
    // for the ~30 M-key crossover measurement RocksDB is the default FOR.
    // Changelog checkpointing is the RocksDB production knob (commit
    // uploads the delta, snapshots go async) — measured on AND off.
    val largeConfigs =
      if (!sys.env.get("SPARK_GRAFT_STREAM_LARGE").contains("1")) Seq.empty
      else Seq(
        ("large_state_rocksdb", "largeAgg", rocks, Map(changelog -> "false")),
        ("large_state_rocksdb_changelog", "largeAgg", rocks, Map(changelog -> "true")),
        ("large_state_hdfs", "largeAgg", hdfs, Map.empty[String, String]))
    // Focus knob: SPARK_GRAFT_STREAM_ONLY=name,name runs a subset.
    val only = sys.env.get("SPARK_GRAFT_STREAM_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val configs = (baseConfigs ++ largeConfigs)
      .filter(c => only.forall(_.contains(c._1)))
    val results = configs.map { case (name, graph, provider, extra) =>
      // a config that dies (OOM-adjacent state growth, deadline) reports
      // -1 instead of killing the remaining configs' measurements
      val (thru, p50, p95, n, rows) =
        try run(spark, name, graph, provider, rowsPerBatch, batches, warmup, extra)
        catch { case e: Throwable =>
          System.err.println(s"[streambench] $name FAILED: ${e.getMessage}")
          (-1.0, -1L, -1L, 0, 0L)
        }
      System.err.println(
        f"[streambench] $name%-17s $thru%12.0f rows/s  p50 $p50%4d ms  p95 $p95%4d ms  ($n batches, $rows rows)")
      name -> (thru, p50, p95, n, rows)
    }
    def fmt(d: Double): String = f"$d%.1f"
    val cfgJson = results.map { case (name, (thru, p50, p95, n, rows)) =>
      s""""$name":{"rows_per_sec":${fmt(thru)},"p50_ms":$p50,"p95_ms":$p95,"batches":$n,"rows":$rows}"""
    }.mkString("{", ",", "}")
    val headline = results.collectFirst {
      case ("stateful_rocksdb", (thru, _, _, _, _)) => thru
    }.getOrElse(-1.0)
    val jsonLine =
      s"""{"metric":"stream_stateful_rows_per_sec","value":${fmt(headline)},"unit":"rows/sec","configs":$cfgJson,"rows_per_batch":$rowsPerBatch,"batches":$batches,"warmup":$warmup,"shuffle_partitions":$shuffle,"cpus":$cpus}"""
    println(jsonLine)
    val outFile =
      sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_OUT", "/tmp/streambench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), jsonLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[streambench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
