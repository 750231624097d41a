package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Continuous near-dup ADMISSION over a document stream — the streaming
  * twin of the declared `q_dedup_incremental` query: each arriving
  * micro-batch is admitted doc-by-doc against everything that arrived
  * before it (and against earlier docs of the same batch), using the same
  * shingle → MinHash → LSH-band → Jaccard-verify chain as the batch
  * operators, driven from `foreachBatch` (the CDC-upsert precedent in
  * `StreamingDmlSpec`).
  *
  * Why foreachBatch and not a pure streaming plan: the verify stage is a
  * multi-join aggregate against an index that must GROW with the stream —
  * exactly the "arbitrary batch logic per micro-batch" seam foreachBatch
  * exists for. The band index and shingle store accumulate across batches
  * (persisted, previous copy released per step — the `Iterate` pattern);
  * in production both are lakehouse tables (append per batch) and the
  * plumbing here is unchanged.
  *
  * Scale posture (the q_dedup_incremental audit, unchanged): candidate
  * generation is batch-bands ⋈ accumulated-index on (band, bucket) —
  * O(batch · bands), independent of corpus size; the verify explodes
  * shingles of candidate docs only. State never holds text: the stores
  * carry digests (16 B band rows) and shingle strings of one corpus pass.
  * ALL batch docs enter the index (admitted or not) — a rejected copy
  * still blocks the next copy, matching the batch operator's "any OLDER
  * doc" partner rule.
  */
class Admission(spark: SparkSession,
    sink: DataFrame => Unit) {

  import spark.implicits._

  /** Accumulated band index: doc_id, band, bucket. */
  @volatile private var index: DataFrame =
    Seq.empty[(Long, Int, String)].toDF("doc_id", "band", "bucket")
  /** Accumulated distinct shingles: doc_id, s. */
  @volatile private var store: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "s")

  /** Process one micro-batch of (doc_id, text). Call from foreachBatch. */
  def step(batch: DataFrame, batchId: Long): Unit = this.synchronized {
    val docs = batch.select("doc_id", "text").persist()
    val sh = Dedup.shinglesOf(docs).distinct().persist()
    // Signatures from RAW (non-distinct) shingles — MinHash is min-based so
    // distinctness doesn't change it, but the batch operators hash the raw
    // stream and the two must stay bit-identical.
    val bands = Dedup.bandsOf(Dedup.minhashOf(spark, Dedup.shinglesOf(docs)))
      .persist()

    // Candidates: this batch probes the accumulated index PLUS itself
    // (earlier-in-batch partners = lower doc_id, the batch operator's
    // uniform ordering rule).
    val idxAll = index.union(bands)
    val cand = idxAll
      .select(col("doc_id").as("old_id"), col("band"), col("bucket"))
      .join(bands.select(col("doc_id").as("new_id"),
          col("band").as("b2"), col("bucket").as("k2")),
        col("band") === col("b2") && col("bucket") === col("k2") &&
          col("old_id") < col("new_id"))
      .select("old_id", "new_id").distinct()

    // Jaccard ≥ 0.5 verify bounded to candidates, shingles served from the
    // accumulated store + this batch.
    val shAll = store.union(sh)
    val sz = shAll.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val sa = shAll.select(col("doc_id").as("sa_id"), col("s").as("sa_s"))
    val sb = shAll.select(col("doc_id").as("sb_id"), col("s").as("sb_s"))
    val inter = cand
      .join(sa, col("old_id") === col("sa_id"))
      .join(sb, col("new_id") === col("sb_id") && col("sa_s") === col("sb_s"))
      .groupBy("old_id", "new_id").agg(count(lit(1)).as("inter"))
    val verified = inter
      .join(sz.select(col("doc_id").as("za_id"), col("nsh").as("na")),
        col("old_id") === col("za_id"))
      .join(sz.select(col("doc_id").as("zb_id"), col("nsh").as("nb")),
        col("new_id") === col("zb_id"))
      .where(col("inter") / (col("na") + col("nb") - col("inter")) >= 0.5)
      .groupBy("new_id").agg(count(lit(1)).as("vd"))

    // The admission verdicts for this batch go to the caller-provided
    // sink (a table append in production; the specs collect) — the
    // operator itself never pulls rows to the driver.
    sink(docs
      .join(verified, col("doc_id") === col("new_id"), "left")
      .select(col("doc_id"), coalesce(col("vd"), lit(0L)).as("n_dups"),
        col("vd").isNull.as("keep")))

    // Grow the stores; release the previous generation (Iterate pattern).
    val (oldIndex, oldStore) = (index, store)
    index = idxAll.persist()
    store = shAll.persist()
    index.count(); store.count() // materialize before unpersisting parents
    oldIndex.unpersist(); oldStore.unpersist()
    bands.unpersist(); sh.unpersist(); docs.unpersist()
  }

  def close(): Unit = this.synchronized {
    index.unpersist(); store.unpersist()
  }
}
