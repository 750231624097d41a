package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Map-side-combinable per-key top-k (SURVEY.md §2.6 / custom-operator
  * preference (b): a typed aggregate beats a whole-plan operator).
  *
  * This aggregator keeps a bounded k-element buffer per group, combines
  * partials on the map side, and ships only k rows per (partition, key)
  * through the shuffle (cf. distributed top-k search literature,
  * PAPERS.md REPOSE).
  *
  * NOTE on when to use it: since Spark 3.5 the window idiom
  * (`row_number() OVER (PARTITION BY k ORDER BY ...) <= K`) gets the same
  * partial top-k before the shuffle via WindowGroupLimit, fully codegen'd
  * — prefer it for SQL-expressible cases (q_topk_perkey does). This
  * aggregator remains the typed-API surface for top-k over object rows
  * the SQL path can't reach.
  *
  * The buffer is kept sorted by (value DESC, id ASC) — a total order, so
  * results are deterministic. `reduce` short-circuits: once the buffer is
  * full, a row that cannot beat the current k-th element is rejected with
  * one comparison (the r2 version re-sorted the buffer per input row).
  */
case class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insert into a sorted buffer, keeping at most k elements. O(k). */
  private def insert(s: Seq[(Double, Long)], r: (Double, Long)): Seq[(Double, Long)] = {
    val i = s.indexWhere(e => beats(r, e))
    val at = if (i < 0) s.size else i
    ((s.take(at) :+ r) ++ s.drop(at)).take(k)
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(b: Seq[(Double, Long)], r: (Double, Long)): Seq[(Double, Long)] =
    if (b.size >= k && !beats(r, b.last)) b else insert(b, r)

  /** Linear merge of two sorted partials, stopping at k. */
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    var j = 0
    while (out.size < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && beats(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
