package graft.queries

import graft.{QDef, QModule}
import org.apache.spark.sql.functions._

/** Set-operation surface (SURVEY.md §2.7): UNION [ALL], INTERSECT [ALL],
  * EXCEPT [ALL], DISTINCT. Catalyst rewrites these to aggregates and
  * semi/anti joins (ReplaceIntersectWithSemiJoin etc.), so at scale they
  * cost one shuffle on the full row — we keep projections narrow first.
  */
object SetOps extends QModule {

  private def custKeys(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "customer").select(col("c_nationkey").as("n_key"))
  private def suppKeys(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "supplier").select(col("s_nationkey").as("n_key"))

  val qSetUnion = QDef(
    "q_set_union",
    (s, d) => custKeys(s, d).union(suppKeys(s, d)).distinct(),
    Some("""
      SELECT c_nationkey AS n_key FROM customer
      UNION
      SELECT s_nationkey FROM supplier"""))

  val qSetUnionAll = QDef(
    "q_set_unionall",
    (s, d) => custKeys(s, d).union(suppKeys(s, d)).groupBy("n_key")
      .agg(count(lit(1)).as("cnt")),
    Some("""
      SELECT n_key, COUNT(*) AS cnt FROM (
        SELECT c_nationkey AS n_key FROM customer
        UNION ALL
        SELECT s_nationkey FROM supplier)
      GROUP BY n_key"""))

  val qSetIntersect = QDef(
    "q_set_intersect",
    (s, d) => custKeys(s, d).intersect(suppKeys(s, d)),
    Some("""
      SELECT c_nationkey AS n_key FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier"""))

  val qSetExcept = QDef(
    "q_set_except",
    (s, d) => custKeys(s, d).except(suppKeys(s, d)),
    Some("""
      SELECT c_nationkey AS n_key FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier"""))

  /** Multiset semantics: EXCEPT ALL keeps surplus multiplicities. */
  val qSetExceptAll = QDef(
    "q_set_exceptall",
    (s, d) => custKeys(s, d).exceptAll(suppKeys(s, d)).groupBy("n_key")
      .agg(count(lit(1)).as("cnt")),
    Some("""
      SELECT n_key, COUNT(*) AS cnt FROM (
        SELECT c_nationkey AS n_key FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier)
      GROUP BY n_key"""))

  val qSetIntersectAll = QDef(
    "q_set_intersectall",
    (s, d) => custKeys(s, d).intersectAll(suppKeys(s, d)).groupBy("n_key")
      .agg(count(lit(1)).as("cnt")),
    Some("""
      SELECT n_key, COUNT(*) AS cnt FROM (
        SELECT c_nationkey AS n_key FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier)
      GROUP BY n_key"""))

  /** distinct() over a multi-column projection (ReplaceDistinctWithAggregate). */
  val qSetDistinct = QDef(
    "q_set_distinct",
    (s, d) => t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct(),
    Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"))

  /** Top-k with a total-order tiebreak (TakeOrderedAndProjectExec:
    * per-partition top-k, then a driver-side merge of k·partitions rows —
    * the scalable pattern for ORDER BY + LIMIT).
    */
  val qSortTopk = QDef(
    "q_sort_topk",
    (s, d) => t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice")
      .limit(15),
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 15"""),
    bench = true)

  val qSortOffset = QDef(
    "q_sort_offset",
    (s, d) => t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice")
      .offset(10).limit(10),
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10"""))

  /** unionByName(allowMissingColumns): schema-flexible union — columns
    * matched by NAME (not position), and a column PRESENT ON ONE SIDE
    * ONLY (`tier`, customer side) null-filled on the other. The Spark
    * side deliberately orders the two select lists differently to prove
    * positional union would be wrong; DuckDB mirrors both behaviors with
    * UNION ALL BY NAME.
    */
  val qSetUnionByName = QDef(
    "q_set_unionbyname",
    (s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderkey") <= 100)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"), lit("ord").as("src"))
      val c = t(s, d, "customer").filter(col("c_custkey") <= 100)
        .select(lit("cust").as("src"), col("c_custkey").as("k"), col("c_acctbal").as("v"),
          (col("c_custkey") % 3).cast("int").as("tier"))
      o.unionByName(c, allowMissingColumns = true)
        .select(col("k"), col("v").cast("double").as("v"), col("src"), col("tier"))
    },
    Some("""
      SELECT k, CAST(v AS DOUBLE) AS v, src, CAST(tier AS INT) AS tier FROM (
        SELECT o_orderkey AS k, o_totalprice AS v, 'ord' AS src
        FROM orders WHERE o_orderkey <= 100
        UNION ALL BY NAME
        SELECT 'cust' AS src, c_custkey AS k, c_acctbal AS v,
               CAST(c_custkey % 3 AS INT) AS tier
        FROM customer WHERE c_custkey <= 100) u"""))

  /** CSV and JSON write→read round-trips as ORACLE-CHECKED queries (not
    * just specs): orders is written to the text format, read back with an
    * explicit schema, and aggregated; the oracle aggregates the original
    * parquet directly — equality proves the round-trip is lossless
    * (Java's shortest-round-trip double formatting re-parses to the
    * identical bits). The write goes to a per-PROCESS temp dir (pid
    * suffix): re-runs within one JVM reuse it via overwrite, while two
    * concurrent JVMs (Verify + a test run) cannot race each other's
    * overwrite against an in-flight read.
    */
  private def roundTrip(fmt: String): QFn = (s, d) => {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-rt-$fmt-${ProcessHandle.current().pid()}"
    val src = t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    src.coalesce(2).write.mode("overwrite")
      .option("header", "true").format(fmt).save(dir)
    val back = s.read.schema(src.schema)
      .option("header", "true").format(fmt).load(dir)
    back.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum(col("o_totalprice"), 2).as("total"))
  }
  private val rtOracle = s"""
      SELECT o_orderstatus, COUNT(*) AS n,
             ${graft.Exact.dsumSql("o_totalprice", 2)} AS total
      FROM orders GROUP BY o_orderstatus"""
  val qSrcCsv = QDef("q_src_csv", roundTrip("csv"), Some(rtOracle))
  val qSrcJson = QDef("q_src_json", roundTrip("json"), Some(rtOracle))

  /** XML write→read round-trip (Spark 4 ships the XML source in core —
    * SURVEY §2.1 source matrix): same lossless-aggregate contract as
    * csv/json. `rowTag` is the one XML-specific knob (element name per
    * row); doubles survive via the same shortest-round-trip text
    * formatting argument as csv.
    */
  val qSrcXml = QDef(
    "q_src_xml",
    (s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-rt-xml-${ProcessHandle.current().pid()}"
      val src = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      src.coalesce(2).write.mode("overwrite")
        .option("rowTag", "order").format("xml").save(dir)
      s.read.schema(src.schema).option("rowTag", "order").format("xml").load(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          graft.Exact.dsum(col("o_totalprice"), 2).as("total"))
    },
    Some(rtOracle))

  /** ORC round-trip through the same lossless-aggregate contract as
    * csv/json above: columnar ORC write + schema'd read must preserve
    * every row exactly, so the aggregate over the read-back equals the
    * oracle's aggregate over the source table (SURVEY §2.1 ORC row).
    */
  val qSrcOrc = QDef("q_src_orc", roundTrip("orc"), Some(rtOracle))

  /** Dynamic-partition write + pruned read as an ORACLE-CHECKED query
    * (SURVEY §2.1 writers row — the spec asserts the pruning, this
    * proves the data): orders is written `partitionBy(o_orderstatus)`,
    * read back with a one-partition filter, and aggregated; the oracle
    * aggregates the source with the same predicate. The filter reaches
    * the scan as a PartitionFilter (directory pruning — asserted on this
    * exact query in SourcesSpec), so the read touches ONE partition's
    * files: at 100 TB the partition column is the coarse pruning axis
    * and this plan reads only the matching directory tree.
    */
  val qSrcPartitioned = QDef(
    "q_src_partitioned",
    (s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-rt-part-${ProcessHandle.current().pid()}"
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
      s.read.parquet(dir)
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          graft.Exact.dsum(col("o_totalprice"), 2).as("total"))
    },
    Some(s"""
      SELECT o_orderstatus, COUNT(*) AS n,
             ${graft.Exact.dsumSql("o_totalprice", 2)} AS total
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderstatus"""))

  /** Z-order clustered layout + box-predicate read ([[graft.operators
    * .ZOrder]] — the lakehouse OPTIMIZE ZORDER capability): lineitem is
    * rewritten into 64 files each covering a small (l_partkey, l_suppkey)
    * hyper-rectangle, then a 2-D box predicate reads it back and
    * aggregates; the oracle runs the same box aggregate over the ORIGINAL
    * table, proving the layout rewrite conserves every row. The scan-side
    * payoff (most row groups pruned by parquet stats on BOTH box axes,
    * where a 1-D sort prunes only its leading column) is metric-asserted
    * in ZOrderSpec; at 100 TB that pruning is the difference between
    * reading a handful of files and scanning the table for every
    * multi-dimensional slice query.
    */
  val qSrcZorder = QDef(
    "q_src_zorder",
    (s, d) => {
      val clustered = graft.SessionCache.memo(s, s"zorder:$d") {
        val out = s"${System.getProperty("java.io.tmpdir")}/graft-zorder-" +
          s"${ProcessHandle.current().pid()}-${d.replaceAll("[^a-zA-Z0-9]", "_")}"
        val li = t(s, d, "lineitem").select(
          "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
        graft.operators.ZOrder
          .cluster(li, Seq("l_partkey", "l_suppkey"), files = 64)
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
      }
      clustered
        .filter(col("l_partkey").between(1, 200) && col("l_suppkey").between(1, 10))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"),
          graft.Exact.dsum(col("l_extendedprice"), 2).as("revenue"))
    },
    Some(s"""
      SELECT l_suppkey, COUNT(*) AS n,
             ${graft.Exact.dsumSql("l_extendedprice", 2)} AS revenue
      FROM lineitem
      WHERE l_partkey BETWEEN 1 AND 200 AND l_suppkey BETWEEN 1 AND 10
      GROUP BY l_suppkey"""))

  /** Small-file compaction ([[graft.operators.Compact]] — the lakehouse
    * OPTIMIZE bin-packing capability): orders is deliberately fragmented
    * into 64 small files, compacted shuffle-free back to a handful of
    * target-size files, and the aggregate over the REWRITE must equal
    * the source aggregate (the oracle) — the rewrite conserves every
    * row. File counts, the zero-shuffle plan, and the clustered
    * variant's disjoint per-file ranges are pinned in CompactSpec.
    */
  val qSrcCompact = QDef(
    "q_src_compact",
    (s, d) => {
      val compacted = graft.SessionCache.memo(s, s"compact:$d") {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft-compact-" +
          s"${ProcessHandle.current().pid()}-${d.replaceAll("[^a-zA-Z0-9]", "_")}"
        t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .repartition(64) // the fragmented state a streaming sink leaves behind
          .write.mode("overwrite").parquet(s"$base/small")
        graft.operators.Compact.rewrite(
          s, s"$base/small", s"$base/packed", targetBytes = 8L << 20)
        s.read.parquet(s"$base/packed")
      }
      compacted
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          graft.Exact.dsum(col("o_totalprice"), 2).as("total"))
    },
    Some(s"""
      SELECT o_orderstatus, COUNT(*) AS n,
             ${graft.Exact.dsumSql("o_totalprice", 2)} AS total
      FROM orders GROUP BY o_orderstatus"""))

  /** Text source round-trip (SURVEY §2.1 text row): one line per
    * document (fixture text is single-line), read back as the text
    * source's single `value` column; line count and char volume must
    * match the source table exactly — losslessness is the whole contract
    * of the text format.
    */
  private val qSrcTextFn: QFn = (s, d) => {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-rt-text-${ProcessHandle.current().pid()}"
    t(s, d, "documents").select("text").write.mode("overwrite").text(dir)
    s.read.text(dir)
      .agg(count(lit(1)).as("n_lines"),
        sum(length(col("value"))).cast("long").as("n_chars"))
  }
  val qSrcText = QDef("q_src_text", qSrcTextFn, Some("""
      SELECT COUNT(*) AS n_lines, CAST(SUM(length(text)) AS BIGINT) AS n_chars
      FROM documents"""))

  val defs: Seq[QDef] = Seq(
    qSetUnion, qSetUnionAll, qSetIntersect, qSetExcept, qSetExceptAll,
    qSetIntersectAll, qSetDistinct, qSortTopk, qSortOffset, qSetUnionByName,
    qSrcCsv, qSrcJson, qSrcOrc, qSrcText, qSrcPartitioned, qSrcXml, qSrcZorder,
    qSrcCompact)
}
