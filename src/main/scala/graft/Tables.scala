package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loads the driver-provided parquet tables (TESTDATA.md / FIXTURES.md) and
  * registers them as temp views. Spark-first: plain `spark.read.parquet`
  * scans keep column pruning and filter pushdown available to Catalyst
  * (verify with `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  */
object Tables {
  /** (SparkSession, scale-factor dir) => result — the driver's query shape. */
  type QFn = (SparkSession, String) => DataFrame

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-session memo of loaded tables and the registered view dir.
    *
    * Why: `spark.read.parquet` re-lists the directory and re-reads footers
    * every call, and `register` re-analyzes 10 views — at 28 bench queries
    * × 10 tables that fixed overhead dominated wall-clock (BENCH_r02). A
    * resolved DataFrame is immutable and session-bound, so caching it per
    * (session, dir, name) is safe; weak keys let test sessions be GC'd.
    * This caches plan *resolution* only — no data is persisted, so it is
    * equally valid on a 1000-executor cluster (it is what a catalog does).
    */
  private final class SessionState {
    val dfs = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
    @volatile var registeredDir: String = null
    @volatile var functionsEnsured: Boolean = false
  }
  private val sessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SessionState]())
  private def state(spark: SparkSession): SessionState =
    sessions.synchronized {
      var st = sessions.get(spark)
      if (st == null) { st = new SessionState; sessions.put(spark, st) }
      st
    }

  /** events.ts is physically INT64 TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` Spark reads it as a nanos-since-
    * epoch long. We expose `ts` as a microsecond TIMESTAMP (truncating —
    * exactly what DuckDB does when it reads the same file) and keep the raw
    * nanos as `ts_ns` for total ordering.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    state(spark).dfs.computeIfAbsent((dir, name), _ => doLoad(spark, dir, name))

  private def doLoad(spark: SparkSession, dir: String, name: String): DataFrame = {
    // runtime-settable; makes events readable on host-provided sessions
    // built without Engine.builder's config
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType.typeName == "long")
      df.withColumnRenamed("ts", "ts_ns")
        // floor-division (not `div`, which truncates toward zero) so a
        // hypothetical pre-epoch nanos value still floors like DuckDB's
        // ns->us read-time conversion of the same file.
        .withColumn("ts",
          timestamp_micros(expr("(ts_ns - pmod(ts_ns, 1000)) div 1000")))
        .select(col("event_id"), col("ts"), col("ts_ns"), col("user_id"),
          col("event_type"), col("value"), col("props"))
    else df
  }

  /** Registers every table as a temp view named after its file. Idempotent.
    * Also ensures the engine's native functions exist even when the session
    * was built without [[graft.GraftExtensions]] (e.g. a host-provided
    * session), so every declared query runs on any SparkSession.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    val st = state(spark)
    ensureFunctions(spark)
    if (st.registeredDir != dir) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      st.registeredDir = dir
    }
  }

  def ensureFunctions(spark: SparkSession): Unit = {
    val st = state(spark)
    if (!st.functionsEnsured) {
      val reg = spark.sessionState.functionRegistry
      graft.functions.Natives.all.foreach { case (name, builder) =>
        if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
          reg.createOrReplaceTempFunction(name, builder, "built-in")
      }
      st.functionsEnsured = true
    }
  }
}

/** Deterministic-aggregation helpers.
  *
  * Distributed double sums are merge-order-dependent; at 100 TB the partial
  * merge order is never stable run-to-run. The fixture money/quantity
  * columns carry ≤2 decimal digits, so casting each value to DECIMAL before
  * summing is lossless, the decimal sum is exact under ANY partitioning, and
  * the final cast back to DOUBLE is bit-identical to the DuckDB oracle's
  * same computation. This is also the right call at scale: Spark's decimal
  * sum stays in whole-stage codegen with partial (map-side) aggregation.
  *
  * Overflow: Spark 4 runs ANSI mode by default, so a value beyond
  * DECIMAL(28,scale) fails the query loudly instead of silently nulling
  * out of the sum (the DuckDB oracle likewise raises) — headroom is 10^24
  * per value and 10^34 per group sum, far above the fixtures' magnitudes;
  * bump the precision constant if a deployment ever carries more.
  */
object Exact {
  /** Exact sum of a fixed-point double column, returned as DOUBLE. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Deterministic average = exact sum / count (single double division). */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Oracle-side SQL fragment mirroring [[dsum]]. */
  def dsumSql(e: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($e AS DECIMAL(28,$scale))) AS DOUBLE)"

  def davgSql(e: String, scale: Int = 4): String =
    s"${dsumSql(e, scale)} / COUNT($e)"
}
