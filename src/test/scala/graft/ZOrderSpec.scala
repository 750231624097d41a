package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout clustering ([[graft.operators.ZOrder]], declared as
  * q_src_zorder): the bit math, row conservation, and the property the
  * operator exists for — a multi-dimensional box predicate skips most
  * parquet row groups on a z-clustered layout where a hash layout reads
  * everything.
  */
class ZOrderSpec extends SparkSpecBase {

  test("interleave is the Morton encoding (pinned values)") {
    // n=2, bits=3: bit j of col k lands at position j*2+k.
    // x=0b101, y=0b011 -> z = 1@0 + 1@1 + 0@2 + 1@3 + 1@4 + 0@5 = 27.
    val row = spark.range(1)
      .select(ZOrder.interleave(Seq(lit(5L), lit(3L)), 3).as("z"))
      .head()
    assert(row.getLong(0) == 27L, s"expected 27, got ${row.getLong(0)}")
    // single column degenerates to identity on the low bits
    val id = spark.range(1)
      .select(ZOrder.interleave(Seq(lit(41L)), 6).as("z")).head()
    assert(id.getLong(0) == 41L)
  }

  test("gridCell clamps to [0, 2^bits) and spreads min..max") {
    val cells = spark.range(1).select(
      ZOrder.gridCell(lit(0.0), lit(0.0), lit(100.0), 4).as("lo"),
      ZOrder.gridCell(lit(100.0), lit(0.0), lit(100.0), 4).as("hi"),
      ZOrder.gridCell(lit(50.0), lit(0.0), lit(100.0), 4).as("mid"),
      ZOrder.gridCell(lit(7.0), lit(7.0), lit(7.0), 4).as("flat")).head()
    assert(cells.getLong(0) == 0L)
    assert(cells.getLong(1) == 15L, "max value must clamp to the top cell")
    assert(cells.getLong(2) == 8L)
    assert(cells.getLong(3) == 0L, "constant column must not divide by zero")
  }

  test("cluster conserves rows exactly (count + key checksum)") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val dir = Files.createTempDirectory("graft-zorder-rt").toString
    ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), files = 16)
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    def sums(df: org.apache.spark.sql.DataFrame) = df
      .agg(sum(col("l_orderkey")), sum(col("l_partkey") * col("l_suppkey")))
      .head()
    assert(sums(back) == sums(li), "clustering must be a pure layout rewrite")
  }

  test("box predicate prunes most row groups on the z-layout, none on a hash layout") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val zdir = Files.createTempDirectory("graft-zorder-z").toString
    val hdir = Files.createTempDirectory("graft-zorder-h").toString
    ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), files = 64)
      .write.mode("overwrite").parquet(zdir)
    li.repartition(64, col("l_orderkey"))
      .write.mode("overwrite").parquet(hdir)

    // ~1% box: every file of the hash layout spans the full key range, so
    // its row-group stats can never exclude the box; the z-layout confines
    // the box to the files covering its z-range.
    def scannedRows(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter(col("l_partkey") <= 20 && col("l_suppkey") <= 1)
      val out = df.collect().length.toLong // executes THIS plan -> metrics live
      val scans = df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
      (scans.map(_.metrics("numOutputRows").value).sum, out)
    }
    val (zScanned, zMatched) = scannedRows(zdir)
    val (hScanned, hMatched) = scannedRows(hdir)
    assert(zMatched == hMatched, "both layouts must return the same rows")
    val total = li.count()
    assert(hScanned >= total / 2,
      s"hash layout should read ~everything, read $hScanned of $total")
    assert(zScanned * 5 <= hScanned,
      s"z-layout should skip >=80% of what the hash layout reads " +
        s"(z=$zScanned vs hash=$hScanned of $total)")
  }
}
