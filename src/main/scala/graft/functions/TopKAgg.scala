package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Map-side-combinable per-key top-k (SURVEY.md §2.6 / custom-operator
  * preference (b): a typed aggregate beats a whole-plan operator).
  *
  * The window idiom (`row_number() OVER (PARTITION BY k ORDER BY ...) <=
  * K`) shuffles and sorts EVERY row of every group. This aggregator keeps
  * a bounded k-element buffer per group, combines partials on the map
  * side, and ships only k rows per (partition, key) through the shuffle —
  * the 100 TB-safe shape for "top N orders per customer" (cf. distributed
  * top-k search literature, PAPERS.md REPOSE).
  *
  * Ordering: (value DESC, id ASC) — total, so results are deterministic.
  */
case class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)], r: (Double, Long)): Seq[(Double, Long)] =
    trim(b :+ r)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)
  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
