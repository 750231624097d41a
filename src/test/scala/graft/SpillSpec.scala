package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Spill-path evidence (VERDICT r5 #4): every scale claim in SCALE.md
  * assumes operators degrade to SPILL, not OOM, when a partition outgrows
  * executor memory — these specs force each fallback path and prove the
  * answer is identical to the unconstrained run.
  *
  * Each test runs in a `newSession()` (own SQLConf, shared context) with
  * the operator's spill threshold shrunk to toy size, and asserts BOTH
  * directions: the operator's own metric proves the constrained path
  * actually engaged (a silently-ignored conf would make the equality
  * vacuous), and the results match the shared clean session exactly.
  * Reference machinery: TungstenAggregationIterator's
  * switchToSortBasedAggregation and ExternalAppendOnlyUnsafeRowArray's
  * UnsafeExternalSorter handoff (used by window + sort-merge join).
  * AQE is disabled in the constrained sessions only so the executed plan
  * is directly traversable for the metric assert.
  */
class SpillSpec extends SparkSpecBase {

  private def constrained(confs: (String, String)*): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  /** Final (non-adaptive) physical operators of an executed DF. */
  private def ops(df: DataFrame): Seq[SparkPlan] =
    df.queryExecution.executedPlan.collect { case p => p }

  private def metric(df: DataFrame, pick: PartialFunction[SparkPlan, Long]): Long =
    ops(df).collect(pick).sum

  test("HashAggregate: forced sort-based fallback returns identical groups") {
    val s2 = constrained(
      // Spark's own fallback-injection conf: after N hash-map inserts the
      // TungstenAggregationIterator switches to sort-based aggregation —
      // the same path a memory-starved executor takes at 100 TB
      "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "3,6")
    def q(s: SparkSession): Array[(Long, Long, Long)] =
      Tables.load(s, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(Exact.dsum(col("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
        .select(col("l_orderkey"), col("qty").cast("bigint"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
    val base = q(spark)
    val df = Tables.load(s2, sf, "lineitem")
      .groupBy("l_orderkey")
      .agg(Exact.dsum(col("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
      .select(col("l_orderkey"), col("qty").cast("bigint"), col("n"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val fellBack = metric(df, {
      case h: HashAggregateExec => h.metrics("numTasksFallBacked").value
    })
    assert(fellBack > 0, "fallback conf did not engage — equality would be vacuous")
    assert(got.toSeq == base.toSeq)
  }

  test("ObjectHashAggregate: sort-based fallback returns identical collect_lists") {
    val s2 = constrained(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "4")
    def run(s: SparkSession): (DataFrame, Seq[(Long, Seq[Int])]) = {
      val df = Tables.load(s, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
      (df, df.collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1).toSeq)
    }
    val (_, base) = run(spark)
    val (df, got) = run(s2)
    val fellBack = metric(df, {
      case o: ObjectHashAggregateExec => o.metrics("numTasksFallBacked").value
    })
    assert(fellBack > 0, "fallback threshold did not engage")
    assert(got == base)
  }

  test("Window: spilled ExternalAppendOnlyUnsafeRowArray returns identical frames") {
    import org.apache.spark.sql.expressions.Window
    // thresholds sized to SPILL but not shatter: each spill file's reader
    // carries ~2 MB of read-ahead buffers and a partition's merge opens
    // every file at once, so a 16-row threshold over a 2000-row partition
    // means 125 open readers (~250 MB) per partition — 256 keeps it to ~8
    // files while still proving the UnsafeExternalSorter path end-to-end
    val s2 = constrained(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "64",
      "spark.sql.windowExec.buffer.spill.threshold" -> "256")
    val w = Window.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")
    def build(s: SparkSession): DataFrame =
      Tables.load(s, sf, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("rn", row_number().over(w))
        .withColumn("run_qty", sum(col("l_quantity")).over(w))
        .select("l_returnflag", "l_orderkey", "l_linenumber", "rn", "run_qty")
    def snap(df: DataFrame): Seq[(String, Long, Int, Int, Double)] =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    val base = snap(build(spark))
    val df = build(s2)
    val got = snap(df)
    val spilled = metric(df, { case x: WindowExec => x.metrics("spillSize").value })
    assert(spilled > 0, "window spill threshold did not engage")
    assert(got == base)
  }

  test("SortMergeJoin: spilled buffered-match array returns identical join") {
    // supplier⋈lineitem on suppkey: the streamed side has ONE row per key,
    // so each ~600-row buffered-match array (10 suppliers at sf0.001) is
    // built and iterated once — real spill (600 ≫ 64) without the
    // reader-buffer blowup of re-opening every spill file per streamed
    // duplicate (same sizing rationale as the window test above)
    val s2 = constrained(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "64")
    def build(s: SparkSession): DataFrame = {
      val sup = Tables.load(s, sf, "supplier").select("s_suppkey", "s_nationkey")
      val l = Tables.load(s, sf, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
      sup.join(l, col("s_suppkey") === col("l_suppkey"))
        .groupBy()
        .agg(count(lit(1)).as("n"),
          sum(xxhash64(col("l_orderkey"), col("l_linenumber"), col("s_nationkey"),
            col("l_quantity").cast("long")).cast("decimal(38,0)")).as("chk"))
    }
    def snap(df: DataFrame): (Long, BigDecimal) = {
      val r = df.collect().head
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }
    val base = snap(build(spark))
    val df = build(s2)
    val got = snap(df)
    val smj = ops(df).collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "constrained session did not plan a sort-merge join")
    val spilled = smj.map(_.metrics("spillSize").value).sum
    assert(spilled > 0, "SMJ buffered-match spill threshold did not engage")
    assert(got == base)
  }
}
