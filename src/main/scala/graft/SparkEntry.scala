package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{queries => qm}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All engine capability is declared as [[QDef]]s in `graft.queries.*`
  * modules; this object only aggregates them into the driver's shape.
  */
object SparkEntry {

  /** Every implemented operator/query, in module order. */
  val all: Seq[QDef] = {
    val defs = Seq(
      qm.Agg, qm.Joins, qm.Windows, qm.SetOps, qm.Subq, qm.Scalars, qm.Ev, qm.Ntz,
      qm.Text, qm.Bpe, qm.Dedup, qm.Sim, qm.Apss, qm.Graph, qm.Extra, qm.Sql, qm.Dml, qm.Stats,
      qm.Pipeline, qm.Tpch, qm.Tpch2, qm.Tpcds2, qm.Tpcds3, qm.Tpcds4,
      qm.Tpcds5, qm.Tpcds6, qm.Tpcds7, qm.Tpcds8, qm.Tpcds9, qm.Tpcds10,
      qm.Tpcds11, qm.Tpcds12, qm.Tpcds13, qm.Ssb).flatMap(_.defs)
    // `queries`/`oracleSql` are Maps — a repeated name would silently
    // shadow the earlier definition, so fail loudly at class-load.
    val dups = defs.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qm.Joins.qJoinMulti.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** DuckDB-equivalent SQL for each oracle-checkable query. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap

  /** The headline set Bench times at sf0.1. */
  def benchQueries: Seq[QDef] = all.filter(_.bench)
}
