package graft

import java.nio.file.Files

/** Drives the driver-facing Verify contract end-to-end in-process:
  * every query dumped as parquet + a parseable oracle_sql.json.
  */
class VerifySpec extends SparkSpecBase {

  test("Verify.run writes every query output and valid oracle json") {
    val out = Files.createTempDirectory("graft-verify-spec").toString
    Verify.run(spark, sf, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    val missing = SparkEntry.queries.keySet -- dirs
    assert(missing.isEmpty, s"no output for: $missing")
    val json = Files.readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    // parseable + complete: every oracle key appears
    assert(json.startsWith("{") && json.endsWith("}"))
    SparkEntry.oracleSql.keys.foreach(k => assert(json.contains("\"" + k + "\""), s"missing $k"))
    // each query dir contains exactly one parquet part file readable back
    val sample = s"$out/q_agg_basic"
    assert(spark.read.parquet(sample).count() > 0)
  }
}
