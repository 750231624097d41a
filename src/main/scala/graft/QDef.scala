package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator/query of the engine.
  *
  * @param name   key in `SparkEntry.queries` / `CORRECTNESS_r{N}.json`
  * @param fn     (session, sf-dir) => result DataFrame
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None
  *               for ops DuckDB can't express (driver falls back to a
  *               rows-only check)
  * @param bench  include in the Bench headline set (sf0.1 wall-clock)
  *
  * Oracle-match rules (the driver hashes values after sorting columns by
  * name): every computed column is aliased identically on both sides; no
  * raw TIMESTAMP columns are emitted (epoch micros/`DATE` instead, so
  * Spark's TIMESTAMP_LTZ parquet annotation can't skew the compare);
  * DuckDB's wider default types (BIGINT length/strpos, HUGEINT sum-of-int)
  * are cast down to Spark's; double-typed results are produced by the
  * exact-decimal or mirrored-double-expression patterns in [[Exact]] so
  * they are bit-identical under any partitioning.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Shared helpers for query modules. */
trait QModule {
  type QFn = (SparkSession, String) => DataFrame

  /** Load one driver table (see [[Tables.load]]). */
  def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** A query written as Spark SQL over the registered temp views. */
  def sqlQ(q: String): QFn = (s, d) => { Tables.register(s, d); s.sql(q) }

  def defs: Seq[QDef]
}
