package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative
  * min-label propagation — the duplicate-CLUSTERING step that turns
  * near-dup PAIRS (LSH/jaccard output) into groups with one canonical
  * representative each (keep min doc_id, drop the rest).
  *
  * Spark-first design (SURVEY §4.3a — compose, don't hand-schedule): the
  * driver loop runs over ITERATIONS (bounded by the cluster diameter,
  * like the Lloyd loop in q_sim_kmeans), never over rows; each iteration
  * is one distributed join + min-aggregate. `localCheckpoint` truncates
  * the growing lineage each round (standard iterative-algorithm posture;
  * use reliable checkpointing on a cluster). Dup clusters are shallow in
  * practice (near-clique neighborhoods), so propagation converges in a
  * handful of rounds; the early-exit probe costs one tiny count per
  * round.
  */
object Components {

  /** @return (id, label) — label = min id reachable from `id` over the
    *         symmetrized edges; only ids that appear in an edge are
    *         labeled (isolated rows need no clustering).
    */
  def labelPropagate(
      edges: DataFrame, a: String, b: String, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbor = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("label"))
      val next = labels.unionByName(viaNeighbor)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.as("p"), "id")
        .filter(col("n.label") =!= col("p.label"))
        .isEmpty
      labels = next
      i += 1
    }
    labels
  }
}
