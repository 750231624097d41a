package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QDef, QModule}
import graft.operators.Pregel

/** General message-passing graph computation, declared through the
  * [[graft.operators.Pregel]] surface — the engine-side expression of the
  * reference's GraphX capability class (`graphx/.../Pregel.scala:92`),
  * previously covered only by the connected-components special case
  * ([[graft.operators.Components]]).
  *
  * Both queries run a REAL vertex program (superstep loop, message
  * aggregation, observed convergence) against an oracle computed a
  * completely different way — a window running-sum for SSSP, DuckDB's
  * recursive transitive closure for components — so the Pregel machinery
  * itself (triplet join orientation, message nulls, halting) is what the
  * hash-compare proves.
  */
object Graph extends QModule {

  /** Mirrored exact-cents fragment ([[graft.Exact]] units pattern): same
    * double expression tree on engine and oracle → bit-identical BIGINT.
    */
  private val CentsSql = "CAST(FLOOR(o_totalprice * 1e2 + 0.5) AS BIGINT)"
  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e2) + lit(0.5)).cast("long")

  /** Single-source shortest paths over each customer's order chain
    * (orders linked in (o_orderdate, o_orderkey) succession; edge weight
    * = the destination order's total price in exact cents; source = the
    * customer's first order). On a chain, the shortest-path distance IS
    * the running sum minus the head's weight — so the window form is an
    * exact, independently-computed oracle for the message-passing run.
    *
    * Scale: rounds = max chain length (join-degree-preserving at any
    * corpus scale — ~24 orders/customer at sf0.1 and at ×10, so ~25
    * supersteps); each superstep shuffles edges (one row per order) and
    * one message per frontier vertex, never the cross product. SSSP send
    * is gated on IMPROVEMENT (src.dist + w < dst.dist), so message
    * volume decays with the frontier exactly as in GraphX.
    */
  val qGraphSssp = QDef(
    "q_graph_sssp",
    (s, d) => {
      val o = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("w"))
      val seq = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val chain = o.withColumn("rn", row_number().over(seq))
      val vertices = chain.select(
        col("o_orderkey").as("id"), (col("rn") === 1).as("is_root"))
      val edges = chain.select(
        col("o_orderkey").as("src"),
        lead(col("o_orderkey"), 1).over(seq).as("dst"),
        lead(col("w"), 1).over(seq).as("w"))
        .where(col("dst").isNotNull)
      Pregel(vertices, edges)
        .withVertexColumn("dist",
          when(col("is_root"), lit(0L)).otherwise(lit(null).cast("long")),
          least(col("dist"), Pregel.msg))
        .sendMsgToDst(
          when(Pregel.src("dist").isNotNull &&
            (Pregel.dst("dist").isNull ||
              Pregel.src("dist") + Pregel.edge("w") < Pregel.dst("dist")),
            Pregel.src("dist") + Pregel.edge("w")))
        .aggMsgs(min(Pregel.msg))
        .setMaxIter(60)
        .run()
        .select(col("id").as("o_orderkey"), col("dist").as("dist_cents"))
    },
    Some(s"""
      SELECT o_orderkey,
             CAST(SUM($CentsSql) OVER w - FIRST_VALUE($CentsSql) OVER w
                  AS BIGINT) AS dist_cents
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""))

  /** Connected components as a general vertex program: min-id flooding
    * over the verified near-dup pairs (the same graph and the same
    * recursive-closure oracle as q_dedup_cluster) — pinning the Pregel
    * surface oracle-equal to the two special-cased algorithms in
    * [[graft.operators.Components]] forever, not just property-equal on
    * generated graphs.
    */
  val qGraphCc = QDef(
    "q_graph_cc",
    (s, d) => {
      val pairs = Dedup.qDedupJaccard.fn(s, d).select("a_id", "b_id")
      val vertices = pairs.select(col("a_id").as("id"))
        .union(pairs.select(col("b_id"))).distinct()
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      Pregel(vertices, edges)
        .withVertexColumn("cc", col("id"), least(col("cc"), Pregel.msg))
        .sendMsgToDst(when(Pregel.src("cc") < Pregel.dst("cc"), Pregel.src("cc")))
        .sendMsgToSrc(when(Pregel.dst("cc") < Pregel.src("cc"), Pregel.dst("cc")))
        .aggMsgs(min(Pregel.msg))
        .setMaxIter(30)
        .run()
        .select(col("id").as("doc_id"), col("cc").as("rep"))
    },
    Dedup.qDedupCluster.oracle)

  val defs: Seq[QDef] = Seq(qGraphSssp, qGraphCc)
}
