package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** A general Pregel-style vertex-program surface over DataFrames — the
  * bulk-synchronous message-passing model of the reference's GraphX
  * (`graphx/src/main/scala/org/apache/spark/graphx/Pregel.scala:92`)
  * re-expressed relationally, in the builder shape popularized by the
  * public GraphFrames `Pregel` API: per superstep, every edge triplet
  * (src-state, edge, dst-state) may emit messages toward either endpoint
  * as Column expressions, messages aggregate per target vertex, and each
  * vertex-state column folds the (possibly null) aggregated message into
  * its next value.
  *
  * Spark-first design (SURVEY §4.3a): the driver loop runs over
  * SUPERSTEPS, never rows — each superstep is one declarative plan
  * (join edges⋈state twice → project messages → partial→final
  * min/sum aggregate → left join back), fully codegen'd, so Catalyst
  * owns join strategy and AQE owns skew. Convergence is observed, not
  * polled: the count of vertices that received a message rides out of
  * the materializing checkpoint action as a `Dataset.observe` metric
  * (the [[Components]] pattern), so no extra job runs per round. Halting
  * matches GraphX: a superstep that delivers ZERO messages ends the run;
  * a vertex with no incoming message keeps its state (update expressions
  * see `Pregel.msg` as null — `least`/`when` fold it away).
  *
  * Scale (100 TB): per superstep the edge table shuffles twice (hash on
  * src, then dst) and messages once (hash on target id) — all three are
  * map-side-combinable or join-key partitionings Catalyst plans as
  * ordinary equi-joins; state is one row per vertex, never per edge.
  * Checkpointing truncates the growing lineage each round
  * (`reliableCheckpoint = true` switches executor-local blocks to the
  * HDFS-backed variant a 1000-executor cluster needs to survive executor
  * loss). Rounds scale with graph DIAMETER — for long-chain graphs use
  * doubling ([[Components.starContract]] is the O(log n) counterpoint
  * shipped for the connected-components special case).
  *
  * @param vertices  one row per vertex; must carry `id` (any equatable
  *                  type); all columns are visible to message expressions
  *                  via `Pregel.src(...)` / `Pregel.dst(...)`
  * @param edges     one row per directed edge; must carry `src` and
  *                  `dst` ids; extra columns (weights…) are visible via
  *                  `Pregel.edge(...)`
  */
final class Pregel private (
    vertices: DataFrame,
    edges: DataFrame,
    stateCols: Seq[(String, Column, Column)],
    msgsToDst: Seq[Column],
    msgsToSrc: Seq[Column],
    aggExpr: Option[Column],
    maxIterations: Int,
    reliable: Boolean,
    requireConverged: Boolean) {

  private def copy(
      stateCols: Seq[(String, Column, Column)] = stateCols,
      msgsToDst: Seq[Column] = msgsToDst,
      msgsToSrc: Seq[Column] = msgsToSrc,
      aggExpr: Option[Column] = aggExpr,
      maxIterations: Int = maxIterations,
      reliable: Boolean = reliable,
      requireConverged: Boolean = requireConverged): Pregel =
    new Pregel(vertices, edges, stateCols, msgsToDst, msgsToSrc, aggExpr,
      maxIterations, reliable, requireConverged)

  /** Add a state column: `init` is evaluated once over the vertex row;
    * `update` is evaluated each superstep over the vertex row (current
    * state) plus `Pregel.msg` (null if no message arrived). Multiple
    * state columns update left-to-right within a superstep (later
    * updates see earlier columns' NEW values — document-ordered, like
    * sequential `withColumn`).
    */
  def withVertexColumn(name: String, init: Column, update: Column): Pregel =
    copy(stateCols = stateCols :+ ((name, init, update)))

  /** Emit a message toward the edge's dst; a null value means "no
    * message on this edge" (the GraphX sendMsg-iterator contract).
    */
  def sendMsgToDst(msg: Column): Pregel = copy(msgsToDst = msgsToDst :+ msg)

  /** Emit a message toward the edge's src (for undirected algorithms). */
  def sendMsgToSrc(msg: Column): Pregel = copy(msgsToSrc = msgsToSrc :+ msg)

  /** Aggregate expression over [[Pregel.msg]] combining all messages that
    * target one vertex (GraphX `mergeMsg`) — e.g. `min(Pregel.msg)`.
    */
  def aggMsgs(agg: Column): Pregel = copy(aggExpr = Some(agg))

  def setMaxIter(n: Int): Pregel = copy(maxIterations = n)

  /** HDFS-backed checkpoints (caller sets `sparkContext.setCheckpointDir`)
    * instead of executor-local blocks — required on a real cluster.
    */
  def setReliableCheckpoint(b: Boolean): Pregel = copy(reliable = b)

  /** `false` runs exactly `maxIter` supersteps without the loud
    * non-convergence failure — for fixed-iteration algorithms
    * (PageRank-style) where messages never cease.
    */
  def setRequireConverged(b: Boolean): Pregel = copy(requireConverged = b)

  /** @return the vertex table with final state columns. */
  def run(): DataFrame = {
    require(stateCols.nonEmpty, "at least one withVertexColumn is required")
    require(msgsToDst.nonEmpty || msgsToSrc.nonEmpty,
      "at least one sendMsgToDst/sendMsgToSrc is required")
    val agg = aggExpr.getOrElse(
      throw new IllegalArgumentException("aggMsgs is required"))
    require(vertices.columns.contains("id"), "vertices must carry an `id` column")
    require(edges.columns.contains("src") && edges.columns.contains("dst"),
      "edges must carry `src` and `dst` columns")

    // Iterate.snap, not plain checkpoint: a triplet join references the
    // state TWICE, so carried stats estimates square per superstep
    def snap(df: DataFrame): DataFrame = Iterate.snap(df, reliable)

    val e = snap(edges.select(struct(col("*")).as("edge")))
    var cur = snap(stateCols.foldLeft(vertices) {
      case (df, (n, init, _)) => df.withColumn(n, init)
    })
    var i = 0
    var active = true
    while (active && i < maxIterations) {
      val tri = e
        .join(cur.select(col("id").as("_sid"), struct(col("*")).as("src")),
          col("edge.src") === col("_sid"))
        .join(cur.select(col("id").as("_did"), struct(col("*")).as("dst")),
          col("edge.dst") === col("_did"))
      val outbound =
        msgsToDst.map(m => tri.select(col("edge.dst").as("id"), m.as(Pregel.MsgCol))) ++
          msgsToSrc.map(m => tri.select(col("edge.src").as("id"), m.as(Pregel.MsgCol)))
      val delivered = outbound.reduce(_ unionByName _)
        .where(col(Pregel.MsgCol).isNotNull)
        .groupBy("id").agg(agg.as(Pregel.MsgCol))
      val obs = Observation()
      val next = snap(
        stateCols.foldLeft(cur.join(delivered, Seq("id"), "left")) {
          case (df, (n, _, update)) => df.withColumn(n, update)
        }
          .observe(obs, sum(when(col(Pregel.MsgCol).isNotNull, 1L).otherwise(0L))
            .as("delivered"))
          .drop(Pregel.MsgCol))
      // the eager checkpoint above already ran the plan; get() returns
      // the recorded metric without another action (null sum = no rows)
      active = !Option(obs.get("delivered")).forall(_ == 0L)
      cur = next
      i += 1
    }
    require(!requireConverged || !active,
      s"Pregel did not converge in $maxIterations supersteps — messages " +
        "were still flowing; raise setMaxIter (rounds scale with graph " +
        "diameter) instead of consuming partial state")
    cur
  }
}

object Pregel {
  private[operators] val MsgCol = "_pregel_msg"

  def apply(vertices: DataFrame, edges: DataFrame): Pregel =
    new Pregel(vertices, edges, Nil, Nil, Nil, None, 20, false, true)

  /** The sending edge's source-vertex column, inside message expressions. */
  def src(c: String): Column = col(s"src.$c")

  /** The sending edge's destination-vertex column. */
  def dst(c: String): Column = col(s"dst.$c")

  /** The edge's own column (weights, kinds…). */
  def edge(c: String): Column = col(s"edge.$c")

  /** Inside `aggMsgs`: the per-message value; inside `withVertexColumn`
    * updates: the aggregated message, null when none arrived.
    */
  def msg: Column = col(MsgCol)
}
