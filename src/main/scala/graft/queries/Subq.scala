package graft.queries

import graft.QDef
import graft.QModule

/** Subquery surface (SURVEY.md §2.2 SubqueryExec / §4.1 RewriteSubquery):
  * scalar, IN / NOT IN, EXISTS-with-aggregate, correlated scalar. Written
  * as Spark SQL so Catalyst's decorrelation (PullupCorrelatedPredicates,
  * RewritePredicateSubquery → semi/anti join) does the planning; the same
  * text is ANSI enough for DuckDB wherever possible.
  */
object Subq extends QModule {

  // Scalar subquery: constant-folded broadcast; 0.95 * max is exact-double
  // identical on both engines (single multiply of identical operands).
  private val scalarSql = """
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 0.95 * (SELECT MAX(o_totalprice) FROM orders)"""
  val qSubqScalar = QDef("q_subq_scalar", sqlQ(scalarSql), Some(scalarSql))

  private val inSql = s"""
      SELECT l_returnflag, ${graft.Exact.dsumSql("l_quantity")} AS sum_qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 45)
      GROUP BY l_returnflag"""
  val qSubqIn = QDef("q_subq_in", sqlQ(inSql), Some(inSql), bench = true)

  private val notInSql = """
      SELECT COUNT(*) AS cnt FROM lineitem
      WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size > 10)"""
  val qSubqNotIn = QDef("q_subq_notin", sqlQ(notInSql), Some(notInSql))

  // TPC-H Q4 shape: EXISTS with a predicate, aggregated outside.
  private val existsSql = """
      SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 49)
      GROUP BY o_orderpriority"""
  val qSubqExists = QDef("q_subq_exists", sqlQ(existsSql), Some(existsSql), bench = true)

  // Correlated scalar subquery (decorrelated to an aggregate + join).
  private val corrSql = """
      SELECT c_custkey FROM customer
      WHERE c_acctbal > (SELECT 0.02 * MAX(o_totalprice) FROM orders
                         WHERE o_custkey = c_custkey)"""
  val qSubqCorr = QDef("q_subq_corr", sqlQ(corrSql), Some(corrSql))

  /** IN as a PROJECTED boolean (not a WHERE predicate) — this is the one
    * shape Catalyst plans as a true ExistenceJoin (reference
    * `SortMergeJoinExec.scala:57` existence variant): the join emits every
    * left row plus a match flag instead of filtering. Distinct from the
    * semi/anti rewrites q_subq_in/q_subq_notin exercise.
    */
  private val flagSql = """
      SELECT c_custkey,
             c_custkey IN (SELECT o_custkey FROM orders
                           WHERE o_totalprice > 400000) AS has_big
      FROM customer"""
  val qSubqFlag = QDef("q_subq_flag", sqlQ(flagSql), Some(flagSql))

  val defs: Seq[QDef] = Seq(qSubqScalar, qSubqIn, qSubqNotIn, qSubqExists,
    qSubqCorr, qSubqFlag)
}
