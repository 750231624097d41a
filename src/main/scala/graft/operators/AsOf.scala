package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator the reference's Spark-2.4
  * surface lacks as a first-class node (SURVEY.md §2.3 "Not present");
  * composed from built-ins per the preference order (compose > custom
  * plan): tag both sides, union, one window pass per key carrying the
  * last-seen right value forward, keep left rows.
  *
  * Scale: a single hash-partitioned shuffle on `key` plus a per-partition
  * sort — the same cost as one sort-merge join, with no per-row probe or
  * range explosion. Skewed keys can be salted upstream; state is one row
  * (`last`) per group during the window scan, so it streams.
  */
object AsOf {

  /** For every row of `left`, attach the most recent `rightVal` from
    * `right` with the same `key` and `right.ts <= left.ts` (inclusive:
    * at equal timestamps the right row wins because side 0 sorts first).
    * Output = all `left` columns + `out` (null when no prior right row).
    *
    * Ties: when several right rows share (key, ts), the one with the
    * GREATEST `rightVal` wins — `__v` is the final sort key, so the
    * result is deterministic under any partitioning (requires `rightVal`
    * to be of an orderable type).
    */
  def joinLast(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVal: String,
      out: String): DataFrame = {
    val leftCols = left.columns
    val valType = right.schema(rightVal).dataType
    val l2 = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(valType))
    val r2 = right.select(
      col(key), col(rightTs).as("__t"), lit(0).as("__side"), col(rightVal).as("__v"))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(out, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+ col(out): _*)
  }
}
