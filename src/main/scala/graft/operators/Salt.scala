package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation (SURVEY.md §4.2 / builder brief
  * "salting for skew").
  *
  * A hot grouping key turns one reducer into the job's critical path.
  * Salting splits every group into `buckets` sub-groups keyed by a
  * DETERMINISTIC row-content hash (not rand() — results and retries stay
  * reproducible), aggregates partials per (key, salt), then merges
  * partials per key in a second, uniformly-small aggregation. Works for
  * any associative aggregate; exactness is preserved here by using the
  * decimal-sum pattern for the partials.
  *
  * AQE's skew-join splitting handles the join case at runtime; this is
  * the aggregation-side counterpart Spark has no automatic rewrite for.
  */
object Salt {

  /** Exact salted sum+count of `value` grouped by `key`. */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      value: String,
      buckets: Int = 16,
      saltSource: Seq[String] = Nil): DataFrame = {
    val saltCols: Seq[Column] =
      if (saltSource.nonEmpty) saltSource.map(col) else df.columns.toSeq.map(col)
    val partial = df
      .withColumn("__salt", pmod(hash(saltCols: _*), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(
        sum(col(value).cast(org.apache.spark.sql.types.DecimalType(28, 4))).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial
      .groupBy(col(key))
      .agg(
        sum(col("__psum")).cast("double").as("sum_v"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Skew-safe equi-join: the BIG (skewed) side gets a deterministic
    * content-hash salt in [0, buckets); the small side is replicated
    * `buckets`× via an exploded sequence so every (key, salt) pair finds
    * its match. A hot key's rows then spread over `buckets` reducers
    * instead of serializing through one.
    *
    * AQE's skew-join split handles sort-merge skew at runtime once stats
    * expose it; this rewrite is the explicit form for keys KNOWN hot ahead
    * of time (a default/null key, a celebrity user), and it composes with
    * any downstream aggregate. Replication multiplies the small side by
    * `buckets` — reserve it for genuinely small dimensions (if the dim is
    * broadcast-able, prefer `broadcast()` — a broadcast join has no
    * shuffle to skew in the first place).
    *
    * The default salt hashes EVERY big-side column: content-deterministic
    * (retry/engine-stable), but it spreads nothing when the hot key's rows
    * are bit-identical duplicates (one content hash → one bucket), and it
    * pays to hash wide payload columns. When a cheaper or
    * duplicate-distinguishing column exists (a line number, an event id),
    * pass it as `saltSource` — fully identical rows are only spreadable by
    * POSITION, which no content-deterministic salt can do by construction
    * (dedup them first, or accept nondeterministic salting explicitly).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      buckets: Int = 8,
      saltSource: Seq[String] = Nil): DataFrame = {
    val saltCols: Seq[Column] =
      if (saltSource.nonEmpty) saltSource.map(col) else big.columns.toSeq.map(col)
    val b = big.withColumn("__salt_b", pmod(hash(saltCols: _*), lit(buckets)))
    val s = small.withColumn("__salt_s", explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s, b(bigKey) === s(smallKey) && col("__salt_b") === col("__salt_s"))
      .drop("__salt_b", "__salt_s")
  }
}
