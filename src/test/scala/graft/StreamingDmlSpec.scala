package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sources.DmlCatalog

/** Streaming → row-level-DML integration: the CDC-upsert pattern every
  * lakehouse pipeline runs — a stream of (key, version) change records
  * applied to a governed table via `foreachBatch` + MERGE INTO. Proves
  * the two surfaces compose: the DSv2 copy-on-write catalog accepts
  * per-micro-batch MERGEs, and the final table state equals the batch
  * fold of the same updates (last-writer-wins within a batch via MAX,
  * across batches via arrival order).
  */
class StreamingDmlSpec extends SparkSpecBase {

  test("streaming CDC upsert via foreachBatch MERGE equals the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, sf)
    spark.conf.set("spark.sql.catalog.graft_dml", classOf[DmlCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_dml.t_cdc")
    spark.sql(
      """CREATE TABLE graft_dml.t_cdc AS
         SELECT CAST(n_nationkey AS BIGINT) AS k, CAST(0 AS BIGINT) AS ver
         FROM nation WHERE n_nationkey < 10""")

    val input = MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val q = input.toDF().toDF("k", "ver").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // dedup the batch to one row per key (MERGE requires it), newest wins
        batch.createOrReplaceTempView("cdc_batch")
        batch.sparkSession.sql(
          """MERGE INTO graft_dml.t_cdc t
             USING (SELECT k, MAX(ver) AS ver FROM cdc_batch GROUP BY k) s
             ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET ver = s.ver
             WHEN NOT MATCHED THEN INSERT (k, ver) VALUES (s.k, s.ver)""")
        ()
      }
      .start()
    try {
      input.addData((1L, 1L), (1L, 2L), (11L, 1L)) // in-batch dup: MAX wins
      q.processAllAvailable()
      input.addData((1L, 3L), (12L, 7L)) // cross-batch: later batch wins
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.sql("SELECT k, ver FROM graft_dml.t_cdc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = (0L until 10L).map(k => k -> 0L).toMap ++
      Map(1L -> 3L, 11L -> 1L, 12L -> 7L)
    assert(got == expect, s"CDC fold mismatch: $got")
    spark.sql("DROP TABLE graft_dml.t_cdc")
  }
}
