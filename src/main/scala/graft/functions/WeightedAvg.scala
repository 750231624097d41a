package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY.md §2.4 typed-agg surface): exact weighted
  * average price by quantity. Buffers are fixed-point cents held in Longs,
  * so partial merges are associative/commutative integers — deterministic
  * under any partitioning and bounded (no per-group collections), which is
  * the required shape for ObjectHashAggregate at scale.
  *
  * Overflow: each product is ~1e11, so a group sum wraps Long past ~1e8
  * rows per group — all arithmetic is `addExact`/`multiplyExact` so an
  * over-bound group FAILS LOUDLY (matching the engine's ANSI-decimal
  * policy in [[graft.Exact]]) instead of silently wrapping.
  */
object WeightedAvg extends Aggregator[(String, Double, Double), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), r: (String, Double, Double)): (Long, Long) = {
    val priceCents = math.round(r._2 * 100)
    val qtyCents = math.round(r._3 * 100)
    (Math.addExact(b._1, Math.multiplyExact(priceCents, qtyCents)),
      Math.addExact(b._2, qtyCents))
  }
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (Math.addExact(a._1, b._1), Math.addExact(a._2, b._2))
  override def finish(b: (Long, Long)): Double =
    b._1.toDouble / b._2.toDouble / 100.0
  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
