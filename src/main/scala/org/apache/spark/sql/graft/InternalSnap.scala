package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning}
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.{LeafExecNode, LogicalRDD, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col

/** The one file that touches `private[sql]` API (hence the package): a
  * statistics CAP for checkpointed frames that spawns NO job and NO
  * row-format conversion.
  *
  * `Dataset.checkpoint`/`localCheckpoint` deliberately carry the origin
  * plan's ESTIMATED `Statistics` through the produced [[LogicalRDD]]
  * (SPARK-39834) so broadcast decisions survive a checkpoint. In a
  * driver-loop iterative algorithm that estimate compounds: a round that
  * references its state twice (a Pregel triplet join, large-star's edge
  * self-pair) SQUARES the carried `BigInt` every round, so its digit
  * count DOUBLES per round and by round ~10 the driver grinds Karatsuba
  * multiplications on numbers with thousands of digits inside
  * `SizeInBytesOnlyStatsPlanVisitor` (observed: minutes at 15k rows).
  *
  * Two public escape hatches both overshoot:
  *   - `createDataFrame(ck.rdd, schema)` resets stats but pays one extra
  *     Spark job plus an InternalRow→Row→InternalRow pass per round and
  *     forgets the checkpoint's physical partitioning;
  *   - resetting to `None` (session default = `Long.MaxValue`) is free
  *     but marks genuinely-small state as huge, demoting the per-round
  *     broadcast join to a two-exchange shuffle join — one extra AQE
  *     stage job per round (the Components job-count spec caught both).
  *
  * This shim instead copies the checkpoint's own `LogicalRDD` leaf with
  * the carried estimate CAPPED at `Long.MaxValue`: below the cap the
  * estimate is untouched (small state keeps broadcasting, job count
  * unchanged), and the cap bounds the BigInt at 19 digits so squaring
  * per round can never wedge the optimizer (cap² ≈ 10³⁸ re-caps at the
  * next snap). Same InternalRow RDD, same `outputPartitioning` /
  * `outputOrdering` / constraints — zero additional work at any scale.
  */
object InternalSnap {

  private val Cap = BigInt(Long.MaxValue)

  /** RDD ids of graft-snapped checkpoints — the [[SnapScanStrategy]] gate:
    * only these scans get the canonicalization-fixed physical node, so
    * every other LogicalRDD in the session plans exactly as stock Spark.
    */
  private val snapRddIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  private[graft] def registerSnapRdd(id: Int): Unit = snapRddIds.add(id)
  private[graft] def isSnapRdd(id: Int): Boolean = snapRddIds.contains(id)

  /** @return `df` re-rooted on a copy of its `LogicalRDD` leaf whose
    *         carried statistics are capped at `Long.MaxValue`; returns
    *         `df` unchanged if its plan is not a bare checkpoint scan.
    */
  def capOriginStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    ds.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val s = l.computeStats()
        val capped = Statistics(
          sizeInBytes = s.sizeInBytes.min(Cap),
          rowCount = s.rowCount.map(_.min(Cap)),
          attributeStats = s.attributeStats,
          isRuntime = s.isRuntime)
        Dataset.ofRows(
          ds.sparkSession,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(
            ds.sparkSession, Some(capped), Some(l.constraints)))
      case _ => df
    }
  }

  /** Checkpoint `df` hash-partitioned on `keys` into `n` partitions and
    * DECLARE that layout on the rebuilt leaf — the piece
    * `LogicalRDD.fromDataset`'s best-effort capture loses under AQE
    * (an `AdaptiveSparkPlan`'s partitioning isn't final when the
    * checkpoint node is built, so every post-checkpoint join re-exchanges
    * state the loop just placed).
    *
    * Safe by construction: the explicit `repartition(n, keys)` is a
    * `REPARTITION_BY_NUM` shuffle, which AQE never coalesces and skew-join
    * never splits, so the physical layout IS `HashPartitioning(keys, n)`
    * when the checkpoint materializes; declaring it merely tells
    * `EnsureRequirements` the truth. (If the child already satisfies the
    * partitioning the optimizer may elide the shuffle — also truthful.)
    * Stats are capped as in [[capOriginStats]].
    */
  def snapHashPartitioned(
      df: DataFrame, keys: Seq[String], n: Int, reliable: Boolean,
      in: Option[org.apache.spark.sql.SparkSession] = None): DataFrame = {
    val rp = df.repartition(n, keys.map(col): _*)
    val ck = (if (reliable) rp.checkpoint() else rp.localCheckpoint())
      .asInstanceOf[Dataset[Row]]
    val target = in.map(_.asInstanceOf[SparkSession])
      .getOrElse(ck.sparkSession)
    ck.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val attrs = keys.map(k =>
          l.output.find(_.name == k).getOrElse(
            throw new IllegalArgumentException(
              s"snapHashPartitioned: no output column '$k' in ${l.output}")))
        val s = l.computeStats()
        val capped = Statistics(
          sizeInBytes = s.sizeInBytes.min(Cap),
          rowCount = s.rowCount.map(_.min(Cap)),
          attributeStats = s.attributeStats,
          isRuntime = s.isRuntime)
        registerSnapRdd(l.rdd.id) // route through SnapScanStrategy (reuse fix)
        Dataset.ofRows(
          target,
          LogicalRDD(l.output, l.rdd, HashPartitioning(attrs, n),
            l.outputOrdering, l.isStreaming, l.stream)(
            target, Some(capped), Some(l.constraints)))
      case other =>
        throw new IllegalStateException(
          s"snapHashPartitioned: checkpoint did not produce a LogicalRDD: $other")
    }
  }

  /** A cloned session for DRIVER-LOOP bodies (same SparkContext, shared
    * state, copied conf) with adaptive execution OFF and the shuffle
    * partition count pinned to the loop's chosen parallelism: inside an
    * iterative superstep the plan shape is fixed and pre-placed by
    * construction (declared co-partitioning, explicit shuffle-hash hints,
    * one fixed-count exchange), so per-round AQE buys nothing — no join
    * strategy to revise, no partition count to coalesce (the loop's
    * exchanges are REPARTITION-pinned), no skew-split applicable to
    * checkpoint-scan joins — while costing a re-optimization pass and an
    * extra stage-job round-trip per materialization. Pinning
    * `shuffle.partitions` keeps every in-loop exchange aligned with the
    * declared state layout, so nothing ever re-partitions. The caller's
    * session is untouched; re-root the final result with
    * [[reRootSnapped]].
    */
  def loopSession(df: DataFrame, numPartitions: Int): org.apache.spark.sql.SparkSession = {
    val s = df.asInstanceOf[Dataset[Row]].sparkSession.cloneSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", numPartitions.toString)
    s
  }

  /** Block-manager bytes of a SNAPPED frame's materialized RDD (0 when
    * unknown — e.g. a reliable checkpoint, which persists to the
    * checkpoint dir instead). Driver-side metadata only; no job.
    */
  def snappedStorageBytes(df: DataFrame): Long = {
    val ds = df.asInstanceOf[Dataset[Row]]
    ds.queryExecution.analyzed match {
      case l: LogicalRDD =>
        ds.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => i.memSize + i.diskSize)
          .getOrElse(0L)
      case _ => 0L
    }
  }

  /** Block-manager bytes of ALL materialized-RDD leaves under `df`'s
    * plan, when EVERY leaf is one (a checkpointed/snapped input) and has
    * known storage — the exact input size of a frame derived from
    * materialized state, available without a job. `None` when any leaf is
    * a live source (parquet scan, range …) or its blocks are unknown —
    * callers fall back to optimizer estimates.
    */
  def materializedInputBytes(df: DataFrame): Option[Long] = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val leaves = ds.queryExecution.analyzed.collectLeaves()
    if (leaves.isEmpty) return None
    val sizes = leaves.map {
      case l: LogicalRDD =>
        ds.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => i.memSize + i.diskSize)
          .getOrElse(-1L)
      case _ => -1L
    }
    if (sizes.forall(_ > 0L)) Some(sizes.sum) else None
  }

  /** Release a dead SNAPPED frame's block-manager storage NOW instead of
    * waiting for the ContextCleaner's GC sweep: an iterative loop that
    * snaps per round (worse, per hop-batch LAYER) otherwise accumulates
    * every generation's blocks for the run's lifetime — measured 30 GB
    * of /tmp block files in one ×100 hop-batched SSSP pass before this
    * existed. Only call on frames whose consumers have fully
    * materialized (the blocks cannot be recomputed — checkpointing
    * truncated the lineage). Reliable-checkpoint FILES are not deleted
    * (cheap, rare, and spec runs reuse them); only block storage frees.
    */
  def freeSnapped(df: DataFrame): Unit =
    df.asInstanceOf[Dataset[Row]].queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Canonicalization-safe declared partitioning: Spark's `RDDScanExec`
    * canonicalizes its `output` but NOT the declared `outputPartitioning`
    * / `outputOrdering`, so two analyzer-deduplicated references to the
    * SAME snapped RDD (fresh exprIds on the second occurrence) never
    * compare `sameResult` — which silently disables `ReuseExchange` for
    * every exchange whose subtree contains a snap scan. A fused Pregel
    * superstep (k layers, no intermediate snap) relies on exactly that
    * reuse: each layer's message-aggregation exchange appears once per
    * consumer of the layer and must be computed once. [[normalizedPart]]
    * is the missing normalization, used by [[SnapScanExec]].
    */
  private[graft] def normalizedPart(
      p: Partitioning, output: Seq[Attribute]): Partitioning = p match {
    case e: Expression =>
      QueryPlan.normalizeExpressions(e, output).asInstanceOf[Partitioning]
    case other => other
  }

  /** Re-root a SNAPPED frame (a bare `LogicalRDD` leaf) into `session`,
    * preserving partitioning/stats/constraints — hands a loop's final
    * state back to the caller's session so downstream composition and
    * actions run under the caller's own configuration.
    */
  def reRootSnapped(
      df: DataFrame, session: org.apache.spark.sql.SparkSession): DataFrame = {
    val target = session.asInstanceOf[SparkSession]
    val ds = df.asInstanceOf[Dataset[Row]]
    ds.queryExecution.analyzed match {
      case l: LogicalRDD =>
        Dataset.ofRows(
          target,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(
            target, Some(l.computeStats()), Some(l.constraints)))
      case _ => df
    }
  }
}

/** Physical scan for graft-SNAPPED checkpoints — execution-identical to
  * Spark's `RDDScanExec` (same unsafe-projection iterator, same codegen
  * input path, same row-count metric), with the canonicalization gap
  * closed: `doCanonicalize` normalizes the DECLARED partitioning and
  * ordering against the node's own output, so deduplicated references to
  * one snap compare `sameResult` and `ReuseExchangeAndSubquery` can
  * dedupe the identical exchanges above them (see
  * [[InternalSnap.normalizedPart]]). Planned only for RDD ids registered
  * by [[InternalSnap.snapHashPartitioned]] — every other `LogicalRDD`
  * keeps stock planning.
  */
case class SnapScanExec(
    output: Seq[Attribute],
    rdd: RDD[InternalRow],
    override val outputPartitioning: Partitioning,
    override val outputOrdering: Seq[SortOrder])
  extends LeafExecNode with org.apache.spark.sql.execution.InputRDDCodegen {

  // one token: CodegenSupport derives generated-variable prefixes from
  // nodeName, and a space produces uncompilable Java identifiers
  override val nodeName: String = "GraftSnapScan"

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    rdd.mapPartitionsWithIndexInternal { (index, iter) =>
      val proj = UnsafeProjection.create(schema)
      proj.initialize(index)
      iter.map { r =>
        numOutputRows += 1
        proj(r)
      }
    }
  }

  override def inputRDD: RDD[InternalRow] = rdd
  override protected val createUnsafeProjection: Boolean = true

  override def simpleString(maxFields: Int): String =
    s"$nodeName${org.apache.spark.sql.catalyst.util.truncatedString(
      output, "[", ",", "]", maxFields)}"

  override protected def doCanonicalize(): SparkPlan = {
    val normOut = output.map(QueryPlan.normalizeExpressions(_, output))
    copy(
      output = normOut,
      outputPartitioning = InternalSnap.normalizedPart(outputPartitioning, output),
      outputOrdering = outputOrdering.map(QueryPlan.normalizeExpressions(_, output)))
  }
}

/** Planner strategy routing graft-snapped `LogicalRDD`s to
  * [[SnapScanExec]]; everything else falls through to Spark's own
  * strategies. Injected by `graft.GraftExtensions`.
  */
object SnapScanStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case l: LogicalRDD if !l.isStreaming && InternalSnap.isSnapRdd(l.rdd.id) =>
      SnapScanExec(l.output, l.rdd, l.outputPartitioning, l.outputOrdering) :: Nil
    case _ => Nil
  }
}
