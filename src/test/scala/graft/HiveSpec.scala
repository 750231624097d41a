package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hive-metastore catalog integration (SURVEY §2.1 Hive-tables row).
  *
  * Runs in its OWN forked JVM (build.sbt `Test / testGrouping`):
  * `spark.sql.catalogImplementation` is a static conf read once at
  * SharedState creation, so it cannot be flipped on the shared test
  * session. The metastore is embedded Derby under a per-process temp dir —
  * the same hive-metastore 2.3 / datanucleus / derby jars a cluster deploy
  * ships in `/opt/spark/jars`, exercised end-to-end rather than mocked.
  *
  * Covers the four behaviors a warehouse user relies on: catalog identity,
  * hive-format storage round-trip (parquet conversion path AND the raw
  * SerDe TEXTFILE path), partitioned tables with dynamic-partition insert +
  * pruning, and metastore persistence of tables + ANALYZE statistics across
  * sessions. Reference: Spark's `sql/hive` module (HiveExternalCatalog,
  * HiveTableScanExec), inherited unchanged by the reference fork.
  */
class HiveSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val base = Files.createTempDirectory("graft-hive").toFile.getAbsolutePath

  lazy val spark = {
    val s = Engine.builder("graft-hive", "local[4]", 4)
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
      .config("spark.hadoop.datanucleus.schema.autoCreateAll", "true")
      .config("spark.hadoop.hive.metastore.schema.verification", "false")
      .config("spark.hadoop.hive.exec.dynamic.partition", "true")
      .config("spark.hadoop.hive.exec.dynamic.partition.mode", "nonstrict")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private def sf: String = TestSession.sf
  private def nation = Tables.load(spark, sf, "nation")

  override def afterAll(): Unit = {
    spark.stop()
    // embedded Derby + warehouse live under `base` — drop the whole tree
    // (multi-MB per run on a multi-tenant box otherwise)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(base))
  }

  test("session uses a real Hive external catalog") {
    assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
    assert(spark.sharedState.externalCatalog.unwrapped.getClass.getName
      .contains("HiveExternalCatalog"))
  }

  test("hive-format table: CREATE STORED AS PARQUET + INSERT + read back") {
    spark.sql(
      "CREATE TABLE hive_nation (n_nationkey BIGINT, n_name STRING) STORED AS PARQUET")
    nation.select("n_nationkey", "n_name").write.insertInto("hive_nation")
    val df = spark.table("hive_nation")
    // the catalog entry is a hive-format table; the analyzer's
    // RelationConversions rule then swaps the HiveTableRelation for the
    // native vectorized parquet scan (the production default) — so the
    // analyzed plan must NOT retain a HiveTableRelation and execution
    // must hit the native FileScan (a bare "parquet" substring match
    // would be satisfied by ParquetHiveSerDe's class name even when the
    // conversion does not fire)
    assert(spark.sessionState.catalog
      .getTableMetadata(TableIdentifier("hive_nation")).provider == Some("hive"))
    assert(!df.queryExecution.analyzed.toString.contains("HiveTableRelation"),
      "metastore-parquet conversion did not fire")
    assert(df.queryExecution.executedPlan.toString.contains("FileScan parquet"))
    assert(df.count() == nation.count())
    assert(df.agg(sum("n_nationkey")).head.getLong(0) ==
      nation.agg(sum("n_nationkey")).head.getLong(0))
  }

  test("hive SerDe path: STORED AS TEXTFILE write + HiveTableScan read") {
    spark.sql("CREATE TABLE hive_txt (k BIGINT, v STRING) STORED AS TEXTFILE")
    spark.sql("INSERT INTO hive_txt VALUES (1,'a'),(2,'b'),(3,'c')")
    val df = spark.table("hive_txt")
    // no parquet conversion exists for TEXTFILE — this is the real
    // LazySimpleSerDe read path through HiveTableScanExec
    assert(df.queryExecution.executedPlan.toString.contains("Scan hive"))
    assert(df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("partitioned hive table: dynamic-partition insert, SHOW PARTITIONS, pruning") {
    spark.sql(
      """CREATE TABLE hive_part (n_nationkey BIGINT, n_name STRING)
        |PARTITIONED BY (r BIGINT) STORED AS PARQUET""".stripMargin)
    // dynamic partitioning: trailing column maps to the partition key
    nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey").as("r"))
      .write.insertInto("hive_part")
    val nParts = spark.sql("SHOW PARTITIONS hive_part").count()
    assert(nParts == nation.select("n_regionkey").distinct.count())
    val one = spark.table("hive_part").filter(col("r") === 0L)
    // metastore partition pruning reaches the scan as a NON-EMPTY
    // PartitionFilters entry (every partitioned scan prints the header,
    // so matching the bare word would never fail)
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(r"),
      s"partition filter not pushed:\n${one.queryExecution.executedPlan}")
    assert(one.count() == nation.filter(col("n_regionkey") === 0L).count())
  }

  test("metastore persists tables and ANALYZE stats across sessions") {
    // self-contained (no dependence on earlier tests' tables)
    spark.sql("CREATE TABLE hive_stats (k BIGINT) STORED AS PARQUET")
    spark.sql("INSERT INTO hive_stats VALUES (1), (2), (3)")
    spark.sql("ANALYZE TABLE hive_stats COMPUTE STATISTICS")
    val s2 = spark.newSession()
    assert(s2.catalog.tableExists("hive_stats"))
    val stats =
      s2.sessionState.catalog.getTableMetadata(TableIdentifier("hive_stats")).stats
    assert(stats.exists(_.rowCount.exists(_.toLong == 3L)))
  }
}
