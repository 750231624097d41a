package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Source/sink surface (SURVEY.md §2.1): batch round-trips for every file
  * format, dynamic partitioning with partition pruning, bucketed tables,
  * and streaming file source + foreachBatch sink.
  */
class SourcesSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val src = Tables.load(spark, sf, "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def assertRoundtrip(fmt: String): Unit = {
    val dir = tmp(s"graft-$fmt")
    src.write.format(fmt).mode("overwrite").option("header", "true").save(dir)
    val back = {
      val r = spark.read.format(fmt).option("header", "true")
      if (fmt == "csv" || fmt == "json") r.schema(src.schema).load(dir) else r.load(dir)
    }
    assert(back.count() == src.count(), s"$fmt row count")
    val a = src.agg(sum(col("o_orderkey"))).head().getLong(0)
    val b = back.agg(sum(col("o_orderkey"))).head().getLong(0)
    assert(a == b, s"$fmt key checksum")
  }

  for (fmt <- Seq("parquet", "orc", "json", "csv")) {
    test(s"$fmt write/read round-trip") { assertRoundtrip(fmt) }
  }

  test("events load seam normalizes every physical timestamp flavor (r6 regression)") {
    // The driver has regenerated events.parquet with three different
    // physical ts encodings across rounds: TIMESTAMP(MICROS) LTZ,
    // TIMESTAMP(MICROS) NTZ (r6 — broke 11 queries), and INT64 nanos.
    // Synthesize the same logical table in all three shapes (driver-
    // independent) and prove Tables.load yields an identical normalized
    // schema AND identical query results over each. The long flavor is a
    // plain INT64 column: it surfaces as LongType exactly like the
    // nanosAsLong read of TIMESTAMP(NANOS), exercising the same branch.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val n = 200
    val base = spark.range(n).selectExpr(
      "id AS event_id",
      "timestamp_micros(1700000000000000 + id * 137000000) AS ts",
      "id % 7 AS user_id",
      "CASE WHEN id % 3 = 0 THEN 'click' WHEN id % 3 = 1 THEN 'view' ELSE 'buy' END AS event_type",
      "CAST(id AS DOUBLE) / 4 AS value",
      "'{}' AS props")
    def writeFlavor(flavor: String): String = {
      val dir = tmp(s"graft-ev-$flavor")
      val shaped = flavor match {
        case "ltz"  => base
        case "ntz"  => base.withColumn("ts", col("ts").cast("timestamp_ntz"))
        case "long" => base.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      }
      shaped.write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    def fingerprint(df: DataFrame): (Long, Long, Long) = {
      val r = df.selectExpr(
        "count(*)",
        "sum((unix_micros(ts) % 1000000007) * event_id)",
        "sum(ts_ns % 1000000007)").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val results = Seq("ltz", "ntz", "long").map { flavor =>
      val ev = Tables.load(spark, writeFlavor(flavor), "events")
      assert(ev.schema("ts").dataType == TimestampType,
        s"$flavor: ts should normalize to TIMESTAMP, got ${ev.schema("ts").dataType}")
      assert(ev.schema("ts_ns").dataType == LongType, s"$flavor: ts_ns should be BIGINT")
      // one event-time window agg + one as-of join over the loaded frame
      val win = ev.groupBy(window(col("ts"), "1 hour")).count()
        .selectExpr("unix_micros(window.start) AS ws", "count")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val right = ev.selectExpr("user_id", "ts AS rts", "value AS rv")
      val asof = operators.AsOf
        .joinLast(ev.select("event_id", "user_id", "ts"), right,
          "user_id", "ts", "rts", "rv", "last_v")
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
      (flavor, fingerprint(ev), win, asof)
    }
    val (_, fp0, win0, asof0) = results.head
    for ((flavor, fp, win, asof) <- results.tail) {
      assert(fp == fp0, s"$flavor: fingerprint diverged from ltz")
      assert(win == win0, s"$flavor: window aggregation diverged from ltz")
      assert(asof == asof0, s"$flavor: as-of join diverged from ltz")
    }
  }

  test("text source round-trip") {
    // fixture texts are single-line, so the line count must equal the
    // row count exactly (a multi-line document would split)
    val dir = tmp("graft-text")
    val docs = Tables.load(spark, sf, "documents").select("text")
    docs.write.mode("overwrite").text(dir)
    assert(spark.read.text(dir).count() == docs.count())
  }

  test("partitionBy write produces prunable layout") {
    val dir = tmp("graft-part")
    src.write.partitionBy("o_orderstatus").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"partition pruning missing:\n$plan")
    assert(pruned.count() == src.filter(col("o_orderstatus") === "F").count())
  }

  test("q_src_partitioned's declared read prunes to the filtered partition") {
    val df = SparkEntry.queries("q_src_partitioned")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // content, not presence: every partitioned scan prints the header
    val pruned = raw"PartitionFilters: \[isnotnull\(o_orderstatus#\d+\), \(o_orderstatus#\d+ = F\)\]".r
    assert(pruned.findFirstIn(plan).isDefined,
      s"declared query's scan is not partition-pruned:\n$plan")
  }

  test("dynamic partition pruning injects a runtime filter into the fact scan") {
    // The 100-TB essential: a filter on the DIM side prunes fact
    // partitions at RUNTIME (reference `CAT/execution/dynamicpruning/
    // PartitionPruning.scala` lineage) — without DPP a star join scans
    // every partition of the fact.
    // The dim filter must be non-foldable: a literal flag would constant-
    // fold into STATIC partition pruning and no runtime filter is needed.
    import spark.implicits._
    val dir = tmp("graft-dpp")
    val li = Tables.load(spark, sf, "lineitem")
    li.write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // The dim must also be file-backed: a filtered LocalRelation collapses
    // to a pre-evaluated LocalTableScan, leaving no selective predicate
    // for PartitionPruning to detect.
    val dimDir = tmp("graft-dpp-dim")
    Seq(("R", 1), ("A", 0), ("N", 0)).toDF("flag", "keep")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("keep") === 1)
    val joined = fact.join(broadcast(dim), fact("l_returnflag") === dim("flag"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP filter on the partition column:\n$plan")
    assert(joined.count() == li.filter(col("l_returnflag") === "R").count())
  }

  test("runtime bloom filter prunes the probe side of a shuffled join") {
    // The non-partition-column sibling of DPP (reference lineage:
    // InjectRuntimeFilter): a selective dim filter becomes a bloom filter
    // applied to the fact scan before the shuffle. Size thresholds are
    // tuned for 10 GB+ scans, so the spec pins them down to fixture scale.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffled join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val li = Tables.load(spark, sf, "lineitem")
      val dim = src.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val joined = li.join(dim, li("l_orderkey") === dim("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("bucketBy table avoids shuffle on bucketed-key aggregation") {
    val wh = tmp("graft-wh")
    // external table (explicit path) in the session catalog, bucketed by key
    src.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
    try {
      val agg = spark.table("orders_b").groupBy("o_custkey").agg(count(lit(1)))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed scan should not reshuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS orders_b")
  }

  test("streaming file source + foreachBatch sink") {
    val inDir = tmp("graft-stream-in")
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.limit(100).write.mode("overwrite").json(inDir)
    val schema = ev.schema
    val counts = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.schema(schema).json(inDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        counts.addAndGet(batch.count()): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(counts.get() == 100, s"foreachBatch saw ${counts.get()} rows")
  }

  test("file source maxFilesPerTrigger bounds each micro-batch (M2 sizing knob)") {
    val inDir = tmp("graft-stream-mfpt")
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.limit(80).repartition(8).write.mode("overwrite").json(inDir) // 8 input files
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "2").json(inDir)
      .writeStream.format("memory").queryName("mfpt_t").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("mfpt_t").count() == 80)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 4,
        s"maxFilesPerTrigger ignored: ${batches.length} batches of ${batches.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("rate source produces rows") {
    val q = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
      .writeStream.format("memory").queryName("rate_t").outputMode("append").start()
    try {
      Thread.sleep(2500)
      q.processAllAvailable()
      assert(spark.table("rate_t").count() > 0)
    } finally q.stop()
  }

  test("in-memory cache scan (InMemoryRelation) serves repeated reads") {
    val df = Tables.load(spark, sf, "lineitem").groupBy("l_returnflag").count()
    df.cache()
    try {
      df.count()
      val plan = df.queryExecution.withCachedData.toString
      assert(plan.contains("InMemoryRelation"), s"cache missing:\n$plan")
    } finally df.unpersist()
  }

  test("q_src_cache scans the columnar cache, not parquet") {
    val df = SparkEntry.queries("q_src_cache")(spark, sf)
    // the executed plan must read through InMemoryTableScan; the FileScan
    // that appears below it is the InMemoryRelation's ORIGIN plan (what to
    // recompute on eviction), not an active scan, so only the sparkPlan
    // ABOVE the cache boundary is checked for file scans.
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("InMemoryTableScan"),
      s"declared cache query is not reading the cache:\n$physical")
    val aboveCache = physical.linesIterator
      .takeWhile(!_.contains("InMemoryTableScan")).mkString("\n")
    assert(!aboveCache.contains("FileScan"),
      s"a parquet scan sits above the cache boundary:\n$physical")
  }

  test("JDBC round-trip, filter pushdown, and partitioned parallel read (embedded Derby)") {
    // derby.jar ships with the Spark distribution, so the stock
    // spark.read/write.jdbc path is exercised end-to-end in-process — the
    // same code path as any warehouse JDBC source at scale
    System.setProperty("derby.stream.error.file", s"${tmp("graft-derby-log")}/derby.log")
    val url = s"jdbc:derby:${tmp("graft-derby")}/db;create=true"
    val props = new java.util.Properties()
    val nation = Tables.load(spark, sf, "nation")
    nation.write.mode("overwrite").jdbc(url, "nation_jdbc", props)
    val back = spark.read.jdbc(url, "nation_jdbc", props)
    assert(back.count() == nation.count())
    assert(back.columns.map(_.toLowerCase).sorted.sameElements(nation.columns.sorted))
    // filter pushdown into the JDBC scan (PushedFilters on JDBCRelation)
    val filtered = back.filter(col("n_regionkey") === 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(n_regionkey,1)"),
      s"JDBC filter not pushed:\n$plan")
    assert(filtered.count() == nation.filter(col("n_regionkey") === 1).count())
    // partitioned read: the scale path — N parallel range-bound queries
    val parts = spark.read.jdbc(url, "nation_jdbc", "N_NATIONKEY",
      lowerBound = 0L, upperBound = 25L, numPartitions = 4, props)
    assert(parts.rdd.getNumPartitions == 4)
    assert(parts.count() == nation.count())
  }

  test("Kafka-schema custom V2 source drives the standard decode path into a watermarked graph") {
    val raw = spark.readStream
      .format("graft.sources.KafkaShapedProvider")
      .option("numRecords", "300").option("numPartitions", "3")
      .load()
    // the exact Kafka wire schema — swapping format("kafka") in is the only change
    assert(raw.schema == graft.sources.KafkaShaped.schema)
    val eventSchema = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    val events = raw
      .selectExpr("CAST(value AS STRING) AS js", "timestamp AS ts")
      .select(from_json(col("js"), org.apache.spark.sql.types.StructType.fromDDL(eventSchema)).as("e"), col("ts"))
      .select(col("e.event_id"), col("ts"), col("e.user_id"), col("e.event_type"), col("e.value"))
    val q = graft.streaming.Streams.tumblingCounts(events)
      .writeStream.format("memory").queryName("kafka_shaped_t").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val total = spark.table("kafka_shaped_t")
        .agg(sum(col("cnt"))).head().getLong(0)
      assert(total == 300, s"expected all 300 records through the graph, got $total")
      val types = spark.table("kafka_shaped_t").select("event_type").distinct().count()
      assert(types == 3)
    } finally q.stop()
  }

  test("Kafka-shaped source honors maxRecordsPerTrigger admission control and startingOffset") {
    // The two Kafka-source controls VERDICT r3 flagged as unexercised:
    // maxOffsetsPerTrigger ≙ maxRecordsPerTrigger (SupportsAdmissionControl
    // ReadLimit.maxRows) and startingOffsets ≙ startingOffset. 100 records
    // from offset 40 at ≤20/trigger must arrive complete in ≥3 bounded
    // micro-batches.
    val raw = spark.readStream
      .format("graft.sources.KafkaShapedProvider")
      .option("numRecords", "100").option("numPartitions", "2")
      .option("startingOffset", "40").option("maxRecordsPerTrigger", "20")
      .load()
    val q = raw.selectExpr("CAST(key AS STRING) AS k")
      .writeStream.format("memory").queryName("kafka_shaped_rate").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val keys = spark.table("kafka_shaped_rate")
        .collect().map(_.getString(0).toLong).sorted
      assert(keys.toSeq == (40L until 100L),
        s"startingOffset skipped wrong range: ${keys.take(5).toSeq}...")
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3, s"rate limit ignored: ${batches.length} batches")
      assert(batches.forall(_.numInputRows <= 20),
        s"a micro-batch exceeded the limit: ${batches.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("Kafka-shaped source emits a self-consistent (partition, offset) layout") {
    // ADVICE r3: partition must reflect the slice the row came from, and
    // offsets must be per-partition sequential — the layout format("kafka")
    // would report for the same consumer assignment.
    val raw = spark.readStream
      .format("graft.sources.KafkaShapedProvider")
      .option("numRecords", "90").option("numPartitions", "3")
      .load()
      .selectExpr("CAST(key AS STRING) AS k", "partition", "offset")
    val q = raw.writeStream.format("memory").queryName("kafka_shaped_layout").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("kafka_shaped_layout")
        .collect().map(r => (r.getString(0).toLong, r.getInt(1), r.getLong(2)))
      assert(rows.length == 90)
      assert(rows.map(_._2).toSet == Set(0, 1, 2))
      rows.foreach { case (i, p, off) =>
        assert(p == (i % 3).toInt, s"record $i in wrong partition $p")
        assert(off == i / 3, s"record $i has offset $off, want ${i / 3}")
      }
      // per-partition offsets are dense and start at 0, like Kafka's
      rows.groupBy(_._2).foreach { case (p, rs) =>
        val offs = rs.map(_._3).sorted
        assert(offs.sameElements(0L until offs.length), s"partition $p offsets not dense: $offs")
      }
    } finally q.stop()
  }

  test("DDL passthrough: temp view + DESCRIBE + SHOW") {
    Tables.register(spark, sf)
    assert(spark.sql("SHOW VIEWS").count() >= 10)
    assert(spark.sql("DESCRIBE lineitem").count() == 11)
    spark.sql("CREATE OR REPLACE TEMP VIEW v_big AS SELECT * FROM orders WHERE o_totalprice > 400000")
    assert(spark.sql("SELECT COUNT(*) FROM v_big").head().getLong(0) ==
      Tables.load(spark, sf, "orders").filter(col("o_totalprice") > 400000).count())
  }

  test("Dataset.observe delivers named metrics without a second scan") {
    // The operational metrics surface (AggregatingAccumulator under the
    // hood): one pass computes the data AND the metrics.
    import org.apache.spark.sql.Observation
    val obs = Observation("li_metrics")
    val li = Tables.load(spark, sf, "lineitem")
    val n = li.observe(obs, count(lit(1)).as("n"),
        min(col("l_quantity")).as("qmin"), max(col("l_quantity")).as("qmax"))
      .filter(col("l_quantity") >= 0).count()
    val m = obs.get
    assert(m("n") == n, s"observed ${m("n")} vs counted $n")
    assert(m("qmin") == 1.0 && m("qmax") == 50.0, s"quantity range off: $m")
  }

  test("DISTRIBUTE BY / CLUSTER BY / SORT BY plan exchange vs per-partition sort") {
    Tables.register(spark, sf)
    // DISTRIBUTE BY: hash exchange on the key, no sort.
    val d = spark.sql("SELECT l_orderkey FROM lineitem DISTRIBUTE BY l_orderkey")
      .queryExecution.executedPlan.toString
    assert(d.contains("hashpartitioning(l_orderkey"), s"DISTRIBUTE BY lost its exchange:\n$d")
    // CLUSTER BY = DISTRIBUTE BY + per-partition sort (global=false).
    val c = spark.sql("SELECT l_orderkey FROM lineitem CLUSTER BY l_orderkey")
      .queryExecution.executedPlan.toString
    assert(c.contains("hashpartitioning(l_orderkey") && c.contains("ASC NULLS FIRST], false"),
      s"CLUSTER BY shape wrong:\n$c")
    // SORT BY: per-partition sort ONLY — no exchange may appear.
    val s = spark.sql("SELECT l_orderkey FROM lineitem SORT BY l_orderkey")
      .queryExecution.executedPlan.toString
    assert(s.contains("ASC NULLS FIRST], false"), s"SORT BY not a partition-local sort:\n$s")
    assert(!s.contains("Exchange"), s"SORT BY must not shuffle:\n$s")
  }
}
