package graft

/** Smoke: every declared query runs at sf0.001 and returns a sane frame.
  * Value-level correctness is the driver's DuckDB oracle (scripts/check.py
  * replicates it at sf0.01); this spec guards compilation/analysis of all
  * plans plus basic result-shape invariants.
  */
class QueriesSmokeSpec extends SparkSpecBase {

  for (q <- SparkEntry.all) {
    test(s"${q.name} runs at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty, "no columns")
      val n = df.count()
      assert(n >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name matches a query name") {
    val qn = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qn))
  }

  test("declared query names are unique (no silent map shadowing)") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == names.size)
  }
}
