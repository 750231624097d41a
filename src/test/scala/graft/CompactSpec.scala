package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** File-level proofs for [[operators.Compact]] — q_src_compact's oracle
  * pins row conservation; this suite pins the maintenance contract:
  * exact output file counts sized from input bytes, the unsorted mode's
  * ZERO-shuffle plan, and the clustered mode's disjoint per-file
  * sort-key ranges (the parquet stats-pruning precondition).
  */
class CompactSpec extends SparkSpecBase {

  private def tmp(tag: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-compactspec-$tag-${ProcessHandle.current().pid()}"

  test("Compact bin-packs small files to the byte-sized count without a shuffle") {
    val base = tmp("pack")
    val src = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    src.repartition(32).write.mode("overwrite").parquet(s"$base/small")

    // plan assertion: unsorted compaction must not exchange
    val plan = operators.Compact.plan(spark.read.parquet(s"$base/small"), 2, Nil)
      .queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"bin-pack mode must be shuffle-free:\n$plan")

    val (before, after, nOut) = operators.Compact.rewrite(
      spark, s"$base/small", s"$base/packed", targetBytes = 256L << 10)
    assert(before == 32)
    assert(after == nOut, s"wrote $after files, sized $nOut")
    assert(after < before, s"compaction did not reduce file count ($before -> $after)")
    // row conservation + content equality
    val a = spark.read.parquet(s"$base/small")
    val b = spark.read.parquet(s"$base/packed")
    assert(b.count() == a.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("Compact clustered mode leaves files with disjoint sort-key ranges") {
    val base = tmp("sort")
    Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .repartition(16).write.mode("overwrite").parquet(s"$base/small")
    val (_, after, _) = operators.Compact.rewrite(
      spark, s"$base/small", s"$base/sorted", targetBytes = 24L << 10,
      sortCols = Seq("l_partkey"))
    assert(after > 1, "need >1 output file to test range disjointness")
    val ranges = spark.read.parquet(s"$base/sorted")
      .select(input_file_name().as("f"), col("l_partkey"))
      .groupBy("f").agg(min("l_partkey").as("lo"), max("l_partkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    for (Array((_, hi1), (lo2, _)) <- ranges.sliding(2).map(_.toArray)) {
      assert(hi1 <= lo2, s"file ranges overlap: $ranges")
    }
  }
}
