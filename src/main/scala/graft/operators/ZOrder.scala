package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional layout clustering by z-order (Morton) interleaving —
  * the lakehouse `OPTIMIZE ZORDER BY` capability expressed with stock
  * Spark operators.
  *
  * Why it matters at 100 TB: partition directories prune ONE coarse axis;
  * every other selective predicate must be answered by parquet row-group /
  * page statistics, and those only help if the layout puts nearby values
  * in the same files. Interleaving the bits of per-column grid cells makes
  * files cover small HYPER-RECTANGLES of the clustered dimensions instead
  * of slabs of just the sort-leading one, so a box predicate on ANY subset
  * of the clustered columns skips most row groups. The plan is three
  * stock operators — a 1-row bounds aggregate (broadcast), a range
  * repartition on the z-value, an intra-partition sort — so the rewrite
  * itself is one shuffle regardless of dimension count.
  *
  * The grid is min/max-scaled (`gridCell`), the same cheap linearization
  * the Delta/Iceberg implementations use per column before interleaving;
  * a 1-row aggregate prices the bounds pass, and rank-based cells (exact
  * equi-depth) would swap in one expression if a production corpus had
  * pathological value skew.
  */
object ZOrder {

  /** Bit-interleave the low `bits` bits of the given non-negative cell
    * columns: bit `j` of column `k` lands at position `j * n + k` of the
    * z-value. Pure long arithmetic (shift/and/or) — whole-stage codegen
    * compiles the expanded tree to straight-line JVM code.
    */
  def interleave(cells: Seq[Column], bits: Int): Column = {
    val n = cells.size
    require(n >= 1 && bits >= 1 && n * bits <= 62,
      s"z-value needs $n cols x $bits bits <= 62")
    val terms = for {
      (c, k) <- cells.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + k)
    terms.reduce(_ bitwiseOR _)
  }

  /** Min/max-scaled grid cell in [0, 2^bits): the per-column linearization
    * step before interleaving. Constant-width cells — exact equi-depth
    * would use rank instead, at the price of a per-column global sort.
    */
  def gridCell(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val cellCount = (1L << bits).toDouble
    val span = greatest(hi.cast("double") - lo.cast("double"),
      lit(java.lang.Double.MIN_VALUE))
    least(
      greatest(floor((c.cast("double") - lo.cast("double")) / span * cellCount)
        .cast("long"), lit(0L)),
      lit((1L << bits) - 1))
  }

  /** Rewrite `df`'s layout so a write produces `files` files, each covering
    * a small z-range (≈ hyper-rectangle) of `cols`. One shuffle: bounds are
    * a broadcast 1-row aggregate, the range partitioner samples the
    * z-value, and the sort is intra-partition (no second exchange). The
    * returned frame carries the SAME rows as `df` — clustering is a pure
    * layout property, which is exactly what q_src_zorder's oracle checks.
    */
  def cluster(df: DataFrame, cols: Seq[String], files: Int,
      bits: Int = 16): DataFrame = {
    val boundAggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__lo_$c"),
      max(col(c)).cast("double").as(s"__hi_$c")))
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*)
    val cells = cols.map(c =>
      gridCell(col(c), col(s"__lo_$c"), col(s"__hi_$c"), bits))
    df.crossJoin(broadcast(bounds))
      .select(df.columns.map(col) :+ interleave(cells, bits).as("__z"): _*)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
