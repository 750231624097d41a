package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative
  * min-label propagation — the duplicate-CLUSTERING step that turns
  * near-dup PAIRS (LSH/jaccard output) into groups with one canonical
  * representative each (keep min doc_id, drop the rest).
  *
  * Spark-first design (SURVEY §4.3a — compose, don't hand-schedule): the
  * driver loop runs over ITERATIONS (bounded by the cluster diameter,
  * like the Lloyd loop in q_sim_kmeans), never over rows; each iteration
  * is ONE distributed join + min-aggregate whose materializing action
  * doubles as the convergence probe — the count of changed labels rides
  * out as an observed metric (`Dataset.observe` / CollectMetrics), so no
  * separate comparison job runs per round. Checkpointing truncates the
  * growing lineage each round; `reliableCheckpoint = true` switches
  * `localCheckpoint` (executor-local blocks — fine single-JVM) to the
  * HDFS-backed `checkpoint` a 1000-executor cluster needs to survive
  * executor loss (caller must set `sparkContext.setCheckpointDir`).
  * Dup clusters are shallow in practice (near-clique neighborhoods), so
  * propagation converges in a handful of rounds; a component whose
  * diameter exceeds `maxIter` fails LOUDLY (require) instead of
  * returning silently wrong labels.
  */
object Components {

  /** @return (id, label) — label = min id reachable from `id` over the
    *         symmetrized edges; only ids that appear in an edge are
    *         labeled (isolated rows need no clustering).
    * @throws IllegalArgumentException if propagation has not converged
    *         after `maxIter` rounds (raise it for long-chain graphs).
    */
  def labelPropagate(
      edges: DataFrame, a: String, b: String, maxIter: Int = 20,
      reliableCheckpoint: Boolean = false): DataFrame = {
    def snap(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint() else df.localCheckpoint()
    val sym = snap(
      edges.select(col(a).as("src"), col(b).as("dst"))
        .union(edges.select(col(b).as("src"), col(a).as("dst")))
        .distinct())
    var labels = snap(
      sym.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")))
    val labelType = labels.schema("label").dataType
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // self rows carry the previous label; neighbor rows carry null, so
      // after the min-aggregate max(prev) recovers each id's old label
      // and the changed-count can be observed in the SAME job.
      val viaNeighbor = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("label"),
          lit(null).cast(labelType).as("prev"))
      val obs = Observation()
      val next = snap(
        labels.withColumn("prev", col("label"))
          .unionByName(viaNeighbor)
          .groupBy("id").agg(min("label").as("label"), max("prev").as("prev"))
          .observe(obs, sum(when(col("label") =!= col("prev"), 1L)
            .otherwise(0L)).as("changed"))
          .drop("prev"))
      // eager checkpoint above already ran the plan; get() returns the
      // recorded metric without another action (null sum = empty input)
      converged = Option(obs.get("changed")).forall(_ == 0L)
      labels = next
      i += 1
    }
    require(converged,
      s"labelPropagate did not converge in $maxIter rounds — a component's " +
        "diameter exceeds maxIter; raise maxIter instead of consuming " +
        "partial labels")
    labels
  }
}
