package graft.tools

import java.io.File

import graft.{Engine, SparkEntry, Tables}
import graft.sources.{DmlCatalog, DmlTable}
import org.apache.spark.sql.connector.catalog.Identifier

/** Dev tool: prove the file-backed DML store scales — run a large MERGE
  * (orders-derived target, so the TARGET grows with the fixture) and the
  * q_dml_ivm flagship at an arbitrary fixture dir, and ASSERT the driver
  * heap stays bounded while the table's bytes live on disk. Under the
  * old driver-array store, every write materialized the whole table into
  * driver memory (×100 q_dml_ivm priced at 71–77 s of copy-on-write array
  * rewrites); file-backed, the driver holds only file-path metadata.
  *
  * Usage: sbt "runMain graft.tools.DmlProbe [sf-dir]"
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.builder("graft-dml-probe", s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      Tables.register(spark, sfDir)
      spark.conf.set("spark.sql.catalog.graft_dml", classOf[DmlCatalog].getName)

      def heapUsed(): Long = {
        (1 to 3).foreach { _ => System.gc(); Thread.sleep(100) }
        val rt = Runtime.getRuntime
        rt.totalMemory() - rt.freeMemory()
      }
      def time[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val a = f
        println(f"[dml-probe] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        a
      }

      val h0 = heapUsed()
      spark.sql("DROP TABLE IF EXISTS graft_dml.probe_big")
      time("ctas") {
        spark.sql("""CREATE TABLE graft_dml.probe_big AS
          SELECT o_orderkey AS k, o_totalprice AS bal, CAST(0 AS BIGINT) AS cnt
          FROM orders WHERE o_orderkey % 2 = 0""")
      }
      time("merge") {
        spark.sql("""MERGE INTO graft_dml.probe_big t
          USING (SELECT l_orderkey AS k, COUNT(*) AS cnt, SUM(l_quantity) AS q
                 FROM lineitem GROUP BY l_orderkey) s
          ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET bal = t.bal + s.q, cnt = s.cnt
          WHEN NOT MATCHED THEN INSERT (k, bal, cnt) VALUES (s.k, CAST(0.0 AS DOUBLE), s.cnt)""")
      }
      val n = time("count") {
        spark.sql("SELECT COUNT(*) FROM graft_dml.probe_big").head().getLong(0)
      }
      val h1 = heapUsed()

      val cat = spark.sessionState.catalogManager.catalog("graft_dml")
        .asInstanceOf[DmlCatalog]
      val t = cat.loadTable(Identifier.of(Array.empty, "probe_big"))
        .asInstanceOf[DmlTable]
      val files = t.currentFiles
      val onDisk = files.map(new File(_).length()).sum
      val heapDeltaMb = (h1 - h0) / 1e6
      println(f"[dml-probe] rows $n%,d; on disk ${onDisk / 1e6}%.1f MB across ${files.size} files; driver heap delta $heapDeltaMb%.1f MB")
      // The bound is deliberately generous (Spark's own driver-side job
      // bookkeeping, codegen caches, UI state) but FAR below the table:
      // with the old store a 1.5M-row ×100 target alone held ~hundreds of
      // MB of UnsafeRow arrays per version on the driver.
      assert(h1 - h0 < 512L * 1024 * 1024,
        f"driver heap grew $heapDeltaMb%.1f MB — snapshot state is not file-backed")
      assert(files.forall(new File(_).isFile), "version file list points at missing files")
      spark.sql("DROP TABLE graft_dml.probe_big")

      time("q_dml_ivm") {
        SparkEntry.queries("q_dml_ivm")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      println("[dml-probe] OK — heap bounded, storage on disk")
    } finally spark.stop()
  }
}
