package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * The reference (SymbioticLab/Sol, a Spark 2.4 fork) changes execution
  * *policy* — pipelined scheduling, pre-post stage submission, proactive
  * push-based shuffle, fetch/compute decoupling (see SURVEY.md §0.1,
  * reference `core/.../scheduler/DAGScheduler.scala:190-238`,
  * `core/.../executor/Executor.scala:192-460`) — not query semantics.
  * On Spark 4.x the same goals are served by built-in mechanisms, which we
  * turn on here: AQE (runtime re-planning ≈ elastic queue adaptation),
  * skew-join splitting, partition coalescing. Push-based shuffle
  * (`spark.shuffle.push.enabled`) is the upstreamed analog of Sol's
  * proactive push; it only applies with an external shuffle service on YARN,
  * so it is documented here and left to cluster deploy config.
  *
  * Scale notes (100 TB): `shufflePartitions` is the *initial* partition
  * count; AQE coalesces/splits at runtime. On a real cluster set it to
  * 2-3× total executor cores (e.g. 8000-12000 for 1000 executors × 4 cores);
  * locally the driver contract pins 32.
  */
object Engine {
  val DefaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(
      appName: String = "graft",
      master: String = s"local[$DefaultCpus]",
      shufflePartitions: Int = DefaultCpus.toInt): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Keep Spark's DEFAULT parallelism-first coalescing (r11): with
      // `false`, AQE coalesces every small post-shuffle stage to the
      // 64 MB advisory size — at bench scale that is ONE task, so window
      // sorts, final aggregates and cache builds serialized on one core
      // (measured: the kcore edge build's final aggregate ran 44 s
      // single-task; q_tpcds_q65's 600 k-row window ran one task). The
      // default first fills `defaultParallelism` partitions (≥ 1 MB
      // each), which is scale-correct by construction: small shuffles
      // still use the machine, large shuffles are bounded by the
      // advisory size either way. Production clusters that prefer
      // fewer/larger reducers can set this false per-deploy.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Streaming state at 100 TB: RocksDB keeps per-executor state off
      // the JVM heap with incremental checkpoints (SURVEY §2.9 state
      // store row — the 4.x upgrade over HDFSBackedStateStoreProvider).
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // events.parquet carries INT64 TIMESTAMP(NANOS); expose as raw nanos
      // (Tables derives a µs TIMESTAMP view column from it).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The default 100-entry codegen class cache thrashes under this
      // engine's workload shape (50+ declared queries × ~5-10
      // WholeStageCodegen units each): once evicted, every re-execution
      // pays a janino recompile, and concurrent submissions pay it at
      // partially-serialized compiler throughput — observed as sporadic
      // 2-4x whole-pass slowdowns in graft.Bench's pipelined pass. Size
      // the cache to hold the whole query surface; generated classes are
      // small and the cap still bounds a pathological generator.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")

  def session(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
