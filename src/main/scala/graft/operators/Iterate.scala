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
  * Rebuilding the frame from the checkpointed RDD drops the origin stats
  * back to the constant default; at runtime AQE re-plans every exchange
  * from REAL sizes, so nothing is lost at 100 TB — static estimates only
  * seed the initial strategy choice.
  */
object Iterate {

  /** Eagerly materialize one round's state and return a frame whose plan
    * is a fresh scan of the materialized blocks — O(1) lineage, O(1)
    * stats, at the cost of one InternalRow→Row→InternalRow pass per
    * consumption (per-vertex state rows, never edges or payloads).
    *
    * @param reliable HDFS-backed checkpoint (caller must set
    *                 `sparkContext.setCheckpointDir`) instead of
    *                 executor-local blocks — required on a real cluster
    *                 to survive executor loss.
    */
  def snap(df: DataFrame, reliable: Boolean): DataFrame = {
    val ck = if (reliable) df.checkpoint() else df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
