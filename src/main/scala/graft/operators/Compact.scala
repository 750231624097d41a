package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the lakehouse `OPTIMIZE` bin-packing
  * maintenance rewrite ([[ZOrder]] is its clustering variant): a table
  * directory fragmented into many small files (streaming sinks,
  * per-task writers, frequent small appends) is rewritten into files of
  * approximately `targetBytes`, because at 100 TB the file count IS a
  * cost: every scan pays per-file open/footer overhead, the driver
  * pays per-file listing/planning memory, and tiny row groups defeat
  * parquet's stats pruning and vectorized reads.
  *
  * Two modes, chosen by `sortCols`:
  *   - UNSORTED (bin-pack): `coalesce(nOut)` — ZERO shuffle; splits are
  *     concatenated by the scan itself (spec-asserted: no Exchange in
  *     the plan). The cheap mode a nightly maintenance job runs.
  *   - CLUSTERED: `repartitionByRange(nOut, sortCols) + local sort` —
  *     ONE range shuffle that also leaves every file covering a
  *     disjoint sort-key range (parquet min/max stats then prune reads
  *     on that key; for multi-dimensional pruning use [[ZOrder]]).
  *
  * The output file count is sized from the INPUT's actual bytes (one
  * driver-side metadata listing — no data pass): nOut =
  * ceil(totalBytes / targetBytes). Row conservation is oracle-gated by
  * q_src_compact (aggregate over the rewrite equals the source
  * aggregate) and spec-pinned with exact file counts.
  */
object Compact {

  /** The compaction plan for `df` (exposed for plan assertions). */
  def plan(df: DataFrame, nOut: Int, sortCols: Seq[String]): DataFrame =
    if (sortCols.isEmpty) df.coalesce(nOut)
    else df.repartitionByRange(nOut, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)

  /** Rewrite the parquet directory `inDir` into `outDir` with files of
    * ~`targetBytes`. Returns (filesBefore, filesAfter, nOut requested).
    */
  def rewrite(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long,
      sortCols: Seq[String] = Nil): (Int, Int, Int) = {
    val fs = new Path(inDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(dir: String) = fs.listStatus(new Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val in = dataFiles(inDir)
    val totalBytes = in.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    plan(spark.read.parquet(inDir), nOut, sortCols)
      .write.mode("overwrite").parquet(outDir)
    (in.length, dataFiles(outDir).length, nOut)
  }
}
