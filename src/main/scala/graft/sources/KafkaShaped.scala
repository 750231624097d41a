package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 micro-batch source with the EXACT wire schema of the
  * Kafka connector (key/value binary, topic, partition, offset, timestamp,
  * timestampType — reference `kafka010/KafkaOffsetReader` record schema),
  * emitting deterministic synthetic event JSON payloads.
  *
  * Purpose (SURVEY §2.1 Kafka row): the Kafka connector jar is not in this
  * container, so this source stands in for it at the SEAM the engine's
  * streaming graphs actually consume — `CAST(value AS STRING)` → from_json
  * → watermarked operators — proving the graphs are source-agnostic and
  * that swapping in `format("kafka")` is a one-line change. It is also the
  * §4.3(c) evidence that the engine can host a full custom V2 streaming
  * source (TableProvider → MicroBatchStream → PartitionReader).
  *
  * Scale notes: `planInputPartitions` splits each micro-batch range into
  * `numPartitions` readers — the same parallel-consumer layout the Kafka
  * source uses (one reader per topic-partition slice); offsets are plain
  * longs serialized via `Offset.json`, checkpointable exactly like Kafka's.
  *
  * Options: numRecords (total), numPartitions, topic, startMs, stepMs,
  * startingOffset (≙ Kafka `startingOffsets`), maxRecordsPerTrigger
  * (≙ Kafka `maxOffsetsPerTrigger` — micro-batch admission control via
  * [[SupportsAdmissionControl]], the M2 batch-sizing lever).
  */
class KafkaShapedProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaShaped.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaShapedTable(properties)
}

object KafkaShaped {
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Deterministic payload for record i — an event-shaped JSON document. */
  def payload(i: Long): String = {
    val types = Seq("click", "view", "purchase")
    s"""{"event_id":$i,"user_id":${i % 7},"event_type":"${types((i % 3).toInt)}","value":${(i % 100) / 10.0}}"""
  }
}

private[sources] class KafkaShapedTable(props: util.Map[String, String])
    extends Table with SupportsRead {
  private def opt(k: String, dv: String): String =
    Option(props.get(k)).getOrElse(dv)

  override def name(): String = s"kafka_shaped(${opt("topic", "events")})"
  override def schema(): StructType = KafkaShaped.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = KafkaShaped.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KafkaShapedStream(
          numRecords = opt("numRecords", "100").toLong,
          numPartitions = opt("numPartitions", "2").toInt,
          topic = opt("topic", "events"),
          startMs = opt("startMs", "86400000000").toLong,
          stepMs = opt("stepMs", "60000").toLong,
          startingOffset = opt("startingOffset", "0").toLong,
          maxPerTrigger = Option(props.get("maxRecordsPerTrigger")).map(_.toLong))
    }
}

private[sources] case class ShapedOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] case class ShapedRange(
    start: Long, end: Long, part: Int, numParts: Int,
    topic: String, startMs: Long, stepMs: Long)
  extends InputPartition

private[sources] class KafkaShapedStream(
    numRecords: Long, numPartitions: Int, topic: String, startMs: Long,
    stepMs: Long, startingOffset: Long = 0L, maxPerTrigger: Option[Long] = None)
  extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = ShapedOffset(startingOffset)

  /** Admission control (the Kafka maxOffsetsPerTrigger contract): with a
    * rate limit installed the engine calls the two-arg latestOffset and
    * each micro-batch admits at most maxRecordsPerTrigger rows; the
    * zero-arg form must not be reached (same posture as KafkaSource).
    */
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[ShapedOffset].n
    limit match {
      case mr: ReadMaxRows => ShapedOffset(math.min(numRecords, lo + mr.maxRows()))
      case _ => ShapedOffset(numRecords)
    }
  }
  override def latestOffset(): Offset =
    throw new IllegalStateException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  override def deserializeOffset(json: String): Offset = ShapedOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ShapedOffset].n
    val hi = end.asInstanceOf[ShapedOffset].n
    // One reader per "topic-partition", like the Kafka source's consumer
    // layout. Records are assigned round-robin (i % numPartitions) so a
    // record's partition id is stable across micro-batch boundaries — the
    // emitted (partition, offset) pair then matches the consumer layout
    // being mimicked: offset i/numPartitions is sequential per partition.
    (0 until numPartitions).map { p =>
      ShapedRange(lo, hi, p, numPartitions, topic, startMs, stepMs): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val r = partition.asInstanceOf[ShapedRange]
      new PartitionReader[InternalRow] {
        // first global index >= start owned by this partition, step numParts
        private var i = {
          val first = r.start + ((r.part - r.start % r.numParts + r.numParts) % r.numParts)
          first - r.numParts
        }
        override def next(): Boolean = { i += r.numParts; i < r.end }
        override def get(): InternalRow = {
          val valueBytes = KafkaShaped.payload(i).getBytes("UTF-8")
          InternalRow(
            java.lang.Long.toString(i).getBytes("UTF-8"), // key
            valueBytes, // value
            UTF8String.fromString(r.topic),
            r.part, // partition — the slice this reader consumes
            i / r.numParts, // per-partition offset, monotonic across batches
            (r.startMs + i * r.stepMs) * 1000L, // timestamp (micros)
            0) // timestampType = CREATE_TIME
        }
        override def close(): Unit = ()
      }
    }
}
