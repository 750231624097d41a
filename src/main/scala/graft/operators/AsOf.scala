package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator the reference's Spark-2.4
  * surface lacks as a first-class node (SURVEY.md §2.3 "Not present");
  * composed from built-ins per the preference order (compose > custom
  * plan): tag both sides, union, one window pass per key carrying the
  * last-seen right (ts, value) pair forward, keep left rows.
  *
  * Scale: a single hash-partitioned shuffle on `key` plus a per-partition
  * sort — the same cost as one sort-merge join, with no per-row probe or
  * range explosion. Skewed keys can be salted upstream; state during the
  * window scan is one carried struct per group, so it streams.
  */
object AsOf {

  /** Shared core: union + one window pass, carrying the latest prior
    * right row's (ts, value) ATOMICALLY as one struct (so a staleness
    * check always tests the timestamp of the row that supplied the
    * value). `toleranceUs = None` keeps every match.
    */
  private def joinCore(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVal: String,
      out: String,
      toleranceUs: Option[Long]): DataFrame = {
    val leftCols = left.columns
    val l2 = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(right.schema(rightVal).dataType))
    val r2 = right.select(
      col(key), col(rightTs).as("__t"), lit(0).as("__side"), col(rightVal).as("__v"))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Staleness in the ts column's own units: micros for timestamps,
    // raw difference for numeric time columns. `unix_micros` rejects
    // TIMESTAMP_NTZ, so that flavor routes through a cast — under the
    // engine's pinned-UTC session the reinterpretation is value-preserving,
    // and tolerance is a DIFFERENCE of two same-shaped casts, so any fixed
    // zone offset cancels even off the pinned session.
    def units(c: Column) =
      left.schema(leftTs).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
        case _ => c.cast("long")
      }
    val matched = u.withColumn("__pair",
        last(when(col("__side") === 0, struct(col("__t").as("t"), col("__v").as("v"))),
          ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val value = toleranceUs match {
      case Some(tol) =>
        when(units(col("__t")) - units(col("__pair.t")) <= tol, col("__pair.v"))
      case None => col("__pair.v")
    }
    matched.withColumn(out, value)
      .select(leftCols.map(col) :+ col(out): _*)
  }

  /** For every row of `left`, attach the most recent `rightVal` from
    * `right` with the same `key` and `right.ts <= left.ts` (inclusive:
    * at equal timestamps the right row wins because side 0 sorts first).
    * Output = all `left` columns + `out` (null when no prior right row,
    * or when the latest prior row carries a null value).
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
      out: String): DataFrame =
    joinCore(left, right, key, leftTs, rightTs, rightVal, out, None)

  /** [[joinLast]] with a staleness bound (pandas merge_asof `tolerance`,
    * INCLUSIVE like pandas): the matched right value is nulled when it is
    * more than `toleranceUs` microseconds older than the left timestamp —
    * a match exactly `toleranceUs` old is kept. Same single-shuffle plan.
    */
  def joinLastWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVal: String,
      out: String,
      toleranceUs: Long): DataFrame =
    joinCore(left, right, key, leftTs, rightTs, rightVal, out, Some(toleranceUs))

  /** Nearest as-of (pandas merge_asof `direction='nearest'`): for every
    * left row, the right row with the same `key` whose timestamp is
    * CLOSEST in either direction; at equal distance the backward (prior)
    * match wins. One union, ONE exchange, one sort — the backward and
    * forward candidates are two window frames over the SAME sorted
    * partition (no second shuffle), then a scalar distance compare picks
    * the winner. Under the backward sort order an equal-ts right row is
    * only in the backward frame — correct, because distance 0 always
    * wins and ties prefer backward. Tie rules within a side match
    * [[joinLast]] (greatest value at equal prior ts) and the strict-
    * after mirror (least value at equal later ts).
    */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVal: String,
      out: String): DataFrame = {
    val leftCols = left.columns
    val l2 = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(right.schema(rightVal).dataType))
    val r2 = right.select(
      col(key), col(rightTs).as("__t"), lit(0).as("__side"), col(rightVal).as("__v"))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val order = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col("__v"))
    val back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // NTZ routes through a cast (see joinCore.units): distances are
    // differences of same-shaped casts, so any fixed zone offset cancels.
    def units(c: Column) =
      left.schema(leftTs).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
        case _ => c.cast("long")
      }
    val rightStruct =
      when(col("__side") === 0, struct(col("__t").as("t"), col("__v").as("v")))
    val matched = u
      .withColumn("__b", last(rightStruct, ignoreNulls = true).over(back))
      .withColumn("__f", first(rightStruct, ignoreNulls = true).over(fwd))
      .filter(col("__side") === 1)
    val bDist = units(col("__t")) - units(col("__b.t"))
    val fDist = units(col("__f.t")) - units(col("__t"))
    val value = when(col("__b").isNull, col("__f.v"))
      .when(col("__f").isNull, col("__b.v"))
      .when(fDist < bDist, col("__f.v"))
      .otherwise(col("__b.v")) // covers bDist <= fDist: equal distance → backward
    matched.withColumn(out, value)
      .select(leftCols.map(col) :+ col(out): _*)
  }

  /** Forward as-of (pandas merge_asof `direction='forward'`): for every
    * row of `left`, attach `rightVal` from the EARLIEST right row with
    * the same `key` and `right.ts >= left.ts` (inclusive). Same
    * single-shuffle union+window plan as [[joinLast]], mirrored: the
    * frame looks currentRow→unboundedFollowing, and at equal timestamps
    * the LEFT row sorts first so an equal-ts right row is inside the
    * frame. Among right rows sharing (key, ts), the LEAST `rightVal`
    * wins (`__v` is the final ascending sort key) — deterministic under
    * any partitioning, the mirror image of [[joinLast]]'s greatest-wins.
    * A right row whose value is null still counts as the match (the
    * struct carry, as in joinCore) — `out` is then null, not the next
    * non-null value.
    */
  def joinNext(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVal: String,
      out: String): DataFrame = {
    val leftCols = left.columns
    val l2 = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__v", lit(null).cast(right.schema(rightVal).dataType))
    val r2 = right.select(
      col(key), col(rightTs).as("__t"), lit(1).as("__side"), col(rightVal).as("__v"))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col("__v"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u.withColumn("__pair",
        first(when(col("__side") === 1, struct(col("__t").as("t"), col("__v").as("v"))),
          ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .withColumn(out, col("__pair.v"))
      .select(leftCols.map(col) :+ col(out): _*)
  }
}
