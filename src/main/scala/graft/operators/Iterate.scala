package graft.operators

import org.apache.spark.sql.DataFrame

/** Checkpointing for DRIVER-LOOP iterative algorithms (Pregel,
  * connected components, k-means): truncate lineage each round AND reset
  * the optimizer's size estimate.
  *
  * The reset matters as much as the truncation: `Dataset.checkpoint` /
  * `localCheckpoint` carry the origin plan's ESTIMATED statistics through
  * the produced `LogicalRDD` (so downstream broadcast decisions survive a
  * checkpoint — SPARK-39834). In an iterative graph that estimate is
  * itself a product of the previous round's estimate, so a round that
  * references the state twice (every Pregel triplet join does) SQUARES
  * the carried BigInt each superstep — by round ~10 the driver is not
  * planning but grinding Karatsuba multiplications on numbers with tens
  * of thousands of digits (observed: q_graph_sssp wedged the optimizer
  * in `SizeInBytesOnlyStatsPlanVisitor` for minutes at 15k rows).
  * CAPPING the carried estimate at `Long.MaxValue` bounds the BigInt at
  * 19 digits (squaring re-caps next round) while leaving small-state
  * estimates untouched, so per-round broadcast decisions — and the
  * per-round job count — are exactly what an un-snapped checkpoint
  * would give; at runtime AQE still re-plans every exchange from REAL
  * sizes, so nothing is lost at 100 TB.
  */
object Iterate {

  /** Eagerly materialize one round's state and return a frame whose plan
    * is a fresh scan of the materialized blocks — O(1) lineage, BOUNDED
    * stats, ZERO cost beyond the checkpoint's own job: the carried
    * estimate is capped, not rebuilt
    * ([[org.apache.spark.sql.graft.InternalSnap]]), so no extra job runs,
    * rows stay in Tungsten format, the checkpoint's physical partitioning
    * survives for downstream joins, and small state keeps its broadcast
    * eligibility. (The earlier `createDataFrame(ck.rdd, schema)` form
    * paid +1 job and a Row round-trip per round — the Components
    * job-count spec caught it.)
    *
    * @param reliable HDFS-backed checkpoint (caller must set
    *                 `sparkContext.setCheckpointDir`) instead of
    *                 executor-local blocks — required on a real cluster
    *                 to survive executor loss.
    */
  def snap(df: DataFrame, reliable: Boolean): DataFrame = {
    val ck = if (reliable) df.checkpoint() else df.localCheckpoint()
    org.apache.spark.sql.graft.InternalSnap.capOriginStats(ck)
  }

  /** [[snap]] with a GUARANTEED hash layout: checkpoint behind an explicit
    * `repartition(n, keys)` (elided by the optimizer when the round's plan
    * already preserves the layout) and DECLARE that partitioning on the
    * snapped leaf — `LogicalRDD.fromDataset`'s own capture loses it under
    * AQE, and without it every superstep re-exchanges (or re-broadcasts)
    * the state table the previous superstep just placed. The iterative
    * loops' "state never moves" contract rests on this.
    */
  def snapKeyed(
      df: DataFrame, keys: Seq[String], n: Int, reliable: Boolean,
      in: Option[org.apache.spark.sql.SparkSession] = None): DataFrame =
    org.apache.spark.sql.graft.InternalSnap.snapHashPartitioned(
      df, keys, n, reliable, in)
}
