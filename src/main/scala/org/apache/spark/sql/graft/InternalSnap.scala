package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

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
}
