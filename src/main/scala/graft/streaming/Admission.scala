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
  * exists for.
  *
  * Store design — APPEND-ONLY deltas, never a rebuild: each micro-batch
  * persists ONLY its own band/shingle frames (O(batch) work and memory
  * per step) and the accumulated index/store are LAZY unions of those
  * immutable deltas — the lakehouse append discipline, in block-manager
  * form. Nothing corpus-sized is re-materialized per batch (the round-9
  * version re-persisted the full accumulated store every step — an
  * O(corpus)/batch term this design removes). The union view's logical
  * plan grows one leaf per batch, so every `compactEvery` batches the
  * deltas are compacted into a single lineage-free base via eager
  * `localCheckpoint` — plan size and cache-recompute depth stay bounded
  * by `compactEvery` regardless of stream lifetime, and the compaction's
  * O(corpus) cost amortizes to O(corpus/compactEvery) per batch. On a
  * real cluster the same two stores are lakehouse APPEND tables (the
  * engine's `sources/DmlCatalog` supports exactly this from foreachBatch —
  * `StreamingDmlSpec`), which replaces localCheckpoint compaction with
  * the table format's own file compaction; the probe/verify plans are
  * unchanged either way.
  *
  * Scale posture (the q_dedup_incremental audit, tightened by the ×100
  * probe): candidate generation is accumulated-index ⋈ BROADCAST
  * batch-bands on (band, bucket) — O(batch · bands) candidates and NO
  * shuffle of the corpus-sized index, ever. The shingle store holds ONE
  * row per document `(doc_id, sh array, nsh)`, and the Jaccard verify is
  * two broadcast probes of that store (candidates are batch-sized) plus
  * `array_intersect` per candidate pair — so a micro-batch's plan moves
  * only batch-sized data; the corpus-sized frames are only ever SCANNED
  * (cached, columnar-compact), never shuffled, sorted, or re-aggregated.
  * The first cut of this operator recomputed per-doc shingle counts and
  * sort-merge-joined the full exploded store every batch — measured
  * LINEAR (2.6 s at 5 k docs → 15 s at 185 k); this shape replaces it.
  * State never holds text: the stores carry 16 B band rows and the
  * one-pass shingle arrays. ALL batch docs enter the index (admitted or
  * not) — a rejected copy still blocks the next copy, matching the batch
  * operator's "any OLDER doc" partner rule.
  *
  * @param sink         receives this batch's verdicts `(doc_id, n_dups,
  *                     keep)`; must consume the frame synchronously (a
  *                     table append in production; the specs collect)
  * @param compactEvery delta frames tolerated before a lineage-truncating
  *                     compaction (bounds the union plan's width)
  */
class Admission(spark: SparkSession,
    sink: DataFrame => Unit,
    compactEvery: Int = 48) {

  import spark.implicits._

  private def emptyIdx: DataFrame =
    Seq.empty[(Long, Int, String)].toDF("doc_id", "band", "bucket")
  private def emptyStore: DataFrame =
    Seq.empty[(Long, Seq[String], Long)].toDF("doc_id", "sh", "nsh")

  /** Compacted lineage-free base + per-batch persisted deltas. The
    * accumulated view is base ∪ deltas, assembled lazily per step.
    */
  private var baseIdx: DataFrame = emptyIdx
  private var baseStore: DataFrame = emptyStore
  private var deltaIdx: Vector[DataFrame] = Vector.empty
  private var deltaStore: Vector[DataFrame] = Vector.empty

  private def view(base: DataFrame, deltas: Vector[DataFrame]): DataFrame =
    deltas.foldLeft(base)(_ union _)

  /** Process one micro-batch of (doc_id, text). Call from foreachBatch. */
  def step(batch: DataFrame, batchId: Long): Unit = this.synchronized {
    val docs = batch.select("doc_id", "text").persist()
    // One array-row per doc: the distinct shingle set + its size — the
    // store shape that lets the verify probe by doc instead of exploding
    // the corpus (50-150× fewer store rows than one-row-per-shingle).
    // Deltas are long-lived scan members, so they land in FEW partitions
    // (a batch is small): without this, every accumulated scan carries
    // ~shufflePartitions tasks PER DELTA and per-batch cost creeps with
    // delta count — task-count overhead, not data (measured at ×100).
    val sh = Dedup.shinglesOf(docs).distinct()
      .groupBy("doc_id")
      .agg(collect_list(col("s")).as("sh"), count(lit(1)).as("nsh"))
      .repartition(2)
      .persist()
    // Signatures from RAW (non-distinct) shingles — MinHash is min-based so
    // distinctness doesn't change it, but the batch operators hash the raw
    // stream and the two must stay bit-identical.
    val bands = Dedup.bandsOf(Dedup.minhashOf(spark, Dedup.shinglesOf(docs)))
      .repartition(2)
      .persist()
    // Materialize the deltas NOW, while the foreachBatch frame is still
    // valid (a streaming batch DataFrame cannot be re-read later) — this
    // is the step's only store write and it is O(batch).
    bands.count(); sh.count()

    // Candidates: this batch probes the accumulated index PLUS itself
    // (earlier-in-batch partners = lower doc_id, the batch operator's
    // uniform ordering rule). The batch side is BROADCAST so the
    // corpus-sized index is scanned in place — never shuffled.
    val idxAll = view(baseIdx, deltaIdx :+ bands)
    val cand = idxAll
      .select(col("doc_id").as("old_id"), col("band"), col("bucket"))
      .join(broadcast(bands.select(col("doc_id").as("new_id"),
          col("band").as("b2"), col("bucket").as("k2"))),
        col("band") === col("b2") && col("bucket") === col("k2") &&
          col("old_id") < col("new_id"))
      .select("old_id", "new_id").distinct()

    // Jaccard ≥ 0.5 verify bounded to candidates: two broadcast probes of
    // the array store (candidates are O(batch·bands) — always the small
    // side) fetch both shingle sets, then the intersection is a per-pair
    // array op. No corpus-sized shuffle, sort, or aggregation.
    val shAll = view(baseStore, deltaStore :+ sh)
    val withOld = shAll
      .select(col("doc_id").as("old_id"), col("sh").as("sha"),
        col("nsh").as("na"))
      .join(broadcast(cand), "old_id")
    val verified = shAll
      .select(col("doc_id").as("new_id"), col("sh").as("shb"),
        col("nsh").as("nb"))
      .join(broadcast(withOld), "new_id")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .where(col("inter") / (col("na") + col("nb") - col("inter")) >= 0.5)
      .groupBy("new_id").agg(count(lit(1)).as("vd"))

    // The admission verdicts for this batch go to the caller-provided
    // sink (a table append in production; the specs collect) — the
    // operator itself never pulls rows to the driver.
    sink(docs
      .join(verified, col("doc_id") === col("new_id"), "left")
      .select(col("doc_id"), coalesce(col("vd"), lit(0L)).as("n_dups"),
        col("vd").isNull.as("keep")))

    // APPEND the delta; the accumulated store is untouched.
    deltaIdx :+= bands
    deltaStore :+= sh
    docs.unpersist()

    // Bounded-lineage compaction: fold the deltas into one checkpointed,
    // plan-free base. Runs every `compactEvery` batches — the only
    // corpus-sized write in the operator's lifetime, amortized.
    if (deltaIdx.size >= compactEvery) {
      val (oldBI, oldBS, oldDI, oldDS) = (baseIdx, baseStore, deltaIdx, deltaStore)
      val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
      baseIdx = view(baseIdx, deltaIdx).coalesce(p).localCheckpoint(true)
      baseStore = view(baseStore, deltaStore).coalesce(p).localCheckpoint(true)
      deltaIdx = Vector.empty
      deltaStore = Vector.empty
      oldBI.unpersist(); oldBS.unpersist()
      oldDI.foreach(_.unpersist()); oldDS.foreach(_.unpersist())
    }
  }

  def close(): Unit = this.synchronized {
    baseIdx.unpersist(); baseStore.unpersist()
    deltaIdx.foreach(_.unpersist()); deltaStore.foreach(_.unpersist())
    deltaIdx = Vector.empty; deltaStore = Vector.empty
    baseIdx = emptyIdx; baseStore = emptyStore
  }
}
