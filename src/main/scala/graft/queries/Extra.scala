package graft.queries

import graft.{Exact, QDef, QModule, SessionCache}
import graft.functions.{TopKAgg, WeightedAvg}
import graft.multimodal.Multimodal
import graft.operators.Salt
import org.apache.spark.sql.functions._

/** Typed-API and multimodal operators (SURVEY.md §2.10 object operators,
  * builder brief multimodal columns).
  */
object Extra extends QModule {

  /** groupByKey + typed Aggregator (MapGroups/ObjectHashAggregate path). */
  val qAggWeighted = QDef(
    "q_agg_weighted",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .as[(String, Double, Double)]
        .groupByKey(_._1)
        .agg(WeightedAvg.toColumn.name("wavg_price"))
        .toDF("l_returnflag", "wavg_price")
    },
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
          / CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS wavg_price
      FROM lineitem GROUP BY l_returnflag"""))

  /** Binary media columns + typed mapPartitions feature extraction. */
  val qMmFeatures = QDef(
    "q_mm_features",
    (s, d) => Multimodal.featuresQuery(s, d),
    Some(Multimodal.featuresOracleSql),
    bench = true)

  /** Frame sampling over binary payloads (1→N streaming expansion). */
  val qMmFrames = QDef(
    "q_mm_frames",
    (s, d) => Multimodal.framesQuery(s, d),
    Some(Multimodal.framesOracleSql))

  private val topkOracle = """
      SELECT o_custkey, CAST(rn AS INTEGER) AS rnk, o_orderkey, o_totalprice
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3"""

  /** Per-key top-k, the SQL-surface path: `row_number() <= k`. Since
    * Spark 3.5 this plans with WindowGroupLimit — a codegen'd partial
    * top-k on the map side BEFORE the shuffle, so only ~k rows per
    * (partition, key) move — the same shuffle bound as the typed
    * aggregator below, without the object ser/de (r2 VERDICT "What's
    * wrong" #1; the aggregator path was 50× the window idiom).
    */
  val qTopkPerKey = QDef(
    "q_topk_perkey",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn").cast("int").as("rnk"),
          col("o_orderkey"), col("o_totalprice"))
    },
    Some(topkOracle),
    bench = true)

  /** Per-key top-k via the bounded-buffer typed [[TopKAgg]] — the typed
    * Dataset surface for object rows SQL can't reach. Same oracle as the
    * window idiom (they must agree exactly).
    */
  val qTopkAgg = QDef(
    "q_topk_agg",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .select("o_custkey", "o_totalprice", "o_orderkey")
        .as[(Long, Double, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(TopKAgg(3).toColumn.name("top"))
        .toDF("o_custkey", "top")
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "r")))
        .select(
          col("o_custkey"),
          (col("pos") + 1).cast("int").as("rnk"),
          col("r._2").as("o_orderkey"),
          col("r._1").as("o_totalprice"))
    },
    Some(topkOracle))

  /** Skew-salted exact aggregation — identical result to the plain
    * groupBy (that identity IS the oracle).
    */
  val qSaltedAgg = QDef(
    "q_salted_agg",
    (s, d) => Salt.saltedSumCount(
      t(s, d, "lineitem"), "l_suppkey", "l_quantity", buckets = 16),
    Some(s"""
      SELECT l_suppkey, ${graft.Exact.dsumSql("l_quantity")} AS sum_v,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_suppkey"""))

  /** Skew-salted join — the join-side counterpart of [[qSaltedAgg]]:
    * lineitem's supplier key salted into 8 buckets, supplier replicated
    * 8×, so a hot supplier's lines spread over 8 reducers. Identical
    * result to the plain join (that identity IS the oracle).
    */
  val qJoinSalted = QDef(
    "q_join_salted",
    (s, d) => Salt.saltedJoin(
        t(s, d, "lineitem"), t(s, d, "supplier"), "l_suppkey", "s_suppkey",
        buckets = 8)
      .groupBy("s_nationkey")
      .agg(graft.Exact.dsum(col("l_quantity")).as("sum_q"),
        count(lit(1)).as("cnt")),
    Some(s"""
      SELECT s_nationkey, ${graft.Exact.dsumSql("l_quantity")} AS sum_q,
             COUNT(*) AS cnt
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      GROUP BY s_nationkey"""))

  /** RangeExec as a declared source (not just a spec): `spark.range` is
    * the zero-I/O generator — each partition synthesizes its own slice, so
    * it parallelizes with no input files at all. DuckDB mirrors with
    * half-open `range` + UNNEST.
    */
  val qSrcRange = QDef(
    "q_src_range",
    (s, _) => {
      import s.implicits._
      s.range(0L, 1000L, 7L)
        .filter($"id" % 2 === 0)
        .select($"id", ($"id" * 3).as("v"))
    },
    Some("""
      SELECT CAST(id AS BIGINT) AS id, id * 3 AS v
      FROM (SELECT UNNEST(range(0, 1000, 7)) AS id) t
      WHERE id % 2 = 0 ORDER BY id"""))

  /** InMemoryTableScan as a DECLARED query (SURVEY §2.1 cache scan —
    * reference InMemoryTableScanExec): the aggregate reads the session's
    * columnar cache, not the parquet file (plan-asserted in SourcesSpec).
    * The cached projection is memoized via [[graft.SessionCache]] so
    * repeated invocations reuse one cache entry and teardown unpersists
    * it; the oracle is simply the same aggregate over the uncached table —
    * caching must never change results.
    */
  val qSrcCache = QDef(
    "q_src_cache",
    (s, d) => {
      val base = SessionCache.memo(s, s"cachescan:$d") {
        val df = t(s, d, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal").cache()
        df.count() // materialize so downstream scans hit the columnar cache
        df
      }
      base.groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"), Exact.dsum(col("c_acctbal"), 2).as("bal"))
    },
    Some(s"""
      SELECT c_nationkey, COUNT(*) AS n_cust,
             ${Exact.dsumSql("c_acctbal", 2)} AS bal
      FROM customer GROUP BY c_nationkey"""))

  /** JDBC source/sink as a DECLARED query (SURVEY §2.1 JDBC row;
    * reference JDBCRelation/JDBCRDD): customer rows round-trip through an
    * embedded Derby database — the stock `spark.read/write.jdbc` code
    * path any warehouse source uses — with the PARTITIONED read (4
    * range-bound parallel queries on the key, the only JDBC shape that
    * scales: an unpartitioned JDBC read is one executor pulling the
    * whole table through one connection). The aggregate over the
    * read-back must equal the oracle's aggregate over the parquet
    * source — JDBC round-trips are lossless for BIGINT/INT/DOUBLE.
    * Derby uppercases identifiers, so columns are re-aliased to match
    * the oracle. The key-bounds lookup is a 1-row metadata action, same
    * as any production bounds probe.
    */
  /** Embedded-Derby scratch area, initialized ONCE per JVM (ADVICE r5):
    * the base dir exists before `derby.stream.error.file` is set (Derby
    * reads the property at engine boot and silently drops the log when
    * its parent is missing), the global property is set at setup rather
    * than inside a query function, and a shutdown hook removes the db
    * tree — deletion can't happen in the query fn because the returned
    * DataFrame reads the db lazily, AFTER the fn returns (mirrors
    * HiveSpec's afterAll cleanup for its Derby metastore).
    */
  private lazy val jdbcBase: String = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-jdbc-${ProcessHandle.current().pid()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
    System.setProperty("derby.stream.error.file", s"$base/derby.log")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(base))
    }
    base
  }

  val qSrcJdbc = QDef(
    "q_src_jdbc",
    (s, d) => {
      val base = jdbcBase
      val url = s"jdbc:derby:$base/db;create=true"
      val props = new java.util.Properties()
      val cust = t(s, d, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
      cust.write.mode("overwrite").jdbc(url, "customer_jdbc", props)
      val hi = cust.agg(max(col("c_custkey"))).head().getLong(0)
      val back = s.read.jdbc(url, "customer_jdbc", "C_CUSTKEY",
        lowerBound = 0L, upperBound = hi + 1, numPartitions = 4, props)
      back.groupBy(col("C_NATIONKEY").as("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), Exact.dsum(col("C_ACCTBAL"), 2).as("bal"))
    },
    Some(s"""
      SELECT c_nationkey, COUNT(*) AS n_cust,
             ${Exact.dsumSql("c_acctbal", 2)} AS bal
      FROM customer GROUP BY c_nationkey"""))

  /** DataFrameNaFunctions surface: null-producing LEFT join, then
    * na.fill for the value column and na.replace mapping a sentinel —
    * aggregated so the oracle is a COALESCE/CASE mirror over the same
    * join. (na.drop is covered by the OperatorSpec assertion that
    * dropping on the join's value column equals the inner join.)
    */
  val qFnNa = QDef(
    "q_fn_na",
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(col("c_custkey"), col("c_nationkey"), col("o_totalprice"))
        .na.fill(Map("o_totalprice" -> -1.0))
        .na.replace("c_nationkey", Map(0 -> 999))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          Exact.dsum(col("o_totalprice"), 2).as("filled_total"))
    },
    Some(s"""
      SELECT CASE WHEN c_nationkey = 0 THEN 999 ELSE c_nationkey END AS c_nationkey,
             COUNT(*) AS n,
             ${Exact.dsumSql("COALESCE(o_totalprice, -1.0)", 2)} AS filled_total
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
      GROUP BY CASE WHEN c_nationkey = 0 THEN 999 ELSE c_nationkey END"""))

  val defs: Seq[QDef] = Seq(qAggWeighted, qMmFeatures, qMmFrames, qTopkPerKey,
    qTopkAgg, qSaltedAgg, qJoinSalted, qSrcRange, qSrcCache, qSrcJdbc, qFnNa)
}
