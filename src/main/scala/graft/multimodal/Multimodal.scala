package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): media payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract runs as
  * a typed `mapPartitions` over the binary batches — the Scala analog of
  * the Python `mapInPandas` pattern, one decoder instantiation per
  * partition, streaming through rows without collecting.
  *
  * The real decoder is environment-provided (no image/audio libs in this
  * container); [[FakeDecoder]] is the clearly-marked deterministic stand-in
  * (md5-derived dimensions) so the Spark-side plumbing — schema, typed
  * encoders, partitioning, per-partition init — is real and oracle-tested.
  */
object Multimodal {

  /** A media row: opaque payload + metadata, the 100 TB layout (payloads
    * stay columnar-compressed in parquet; metadata predicates prune scans
    * before any decode).
    */
  final case class MediaRecord(doc_id: Long, content: Array[Byte], format: String)

  /** Extracted features; produced per-partition. */
  final case class MediaFeatures(
      doc_id: Long, byte_len: Int, format: String, width: Int, height: Int)

  /** Deterministic decode stub: "dimensions" from the payload digest.
    * Swap for a real codec binding in production — the pipeline shape
    * (per-partition init, row streaming) is what's under test.
    */
  object FakeDecoder {
    def decode(content: Array[Byte]): (Int, Int) = {
      val dg = MessageDigest.getInstance("MD5").digest(content)
      (64 + (dg(0) & 0xff) % 64, 64 + (dg(1) & 0xff) % 64)
    }
  }

  /** binary payloads -> features, one decoder per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec contexts are not
      // serializable; this is the mapInPandas-equivalent seam)
      it.map { m =>
        val (w, h) = FakeDecoder.decode(m.content)
        MediaFeatures(m.doc_id, m.content.length, m.format, w, h)
      }
    }
  }

  /** The documents table viewed as a media table (utf-8 payloads). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"), lit("text/plain").as("format"))
      .as[MediaRecord]
  }

  /** Oracle-checkable end-to-end: documents -> binary -> mapPartitions
    * decode -> features. md5-derived width/height mirror in SQL as hex
    * arithmetic on md5(text).
    */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(spark, dir)).toDF()

  /** DuckDB mirror of [[FakeDecoder]]: byte k of the md5 digest equals
    * 16*hex[2k] + hex[2k+1] of the hex string.
    */
  val featuresOracleSql: String = {
    def hexAt(i: Int) = s"(strpos('0123456789abcdef', substring(md5(text), $i, 1)) - 1)"
    s"""
      SELECT doc_id,
        CAST(length(text) AS INTEGER) AS byte_len,
        'text/plain' AS format,
        CAST(64 + (16 * ${hexAt(1)} + ${hexAt(2)}) % 64 AS INTEGER) AS width,
        CAST(64 + (16 * ${hexAt(3)} + ${hexAt(4)}) % 64 AS INTEGER) AS height
      FROM documents"""
  }

  /** One sampled frame of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** Frame sampling (the video-ingest primitive): slice the opaque payload
    * into fixed-size frames and keep every `stride`-th one — a 1→N
    * expansion that streams through the partition iterator, so memory is
    * one frame per row regardless of payload count. The frame digest
    * stands in for the per-frame decode (same seam as [[FakeDecoder]]);
    * at 100 TB the payload column never shuffles — sampling happens at
    * scan site and only (id, idx, digest) rows move on.
    */
  def sampleFrames(
      media: Dataset[MediaRecord],
      frameBytes: Int = 64,
      stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // one instance per partition
      it.flatMap { m =>
        val nFull = m.content.length / frameBytes
        (0 until nFull by stride).iterator.map { i =>
          md.reset()
          val dg = md.digest(
            java.util.Arrays.copyOfRange(m.content, i * frameBytes, (i + 1) * frameBytes))
          Frame(m.doc_id, i, dg.map("%02x".format(_)).mkString)
        }
      }
    }
  }

  def framesQuery(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocuments(spark, dir)).toDF()

  /** DuckDB mirror: every 4th 64-byte frame of the utf-8 payload (ASCII
    * fixture text, so char slicing == byte slicing).
    */
  val framesOracleSql: String = """
      SELECT doc_id, CAST(u AS INTEGER) AS frame_idx,
             md5(substring(text, u * 64 + 1, 64)) AS frame_md5
      FROM (SELECT doc_id, text,
                   unnest(range(0, length(text) // 64, 4)) AS u
            FROM documents)"""
}
