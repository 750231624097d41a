package graft

import java.nio.file.Files
import java.sql.DriverManager

import scala.jdk.CollectionConverters._

import org.apache.hive.service.cli.thrift.ThriftCLIService
import org.apache.hive.service.server.HiveServer2
import org.apache.spark.sql.functions._
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** HiveThriftServer2 end-to-end (VERDICT r5 #1 — the last actionable
  * reference module, `sql/hive-thriftserver/`): start the real
  * ThriftServer on the engine's session, connect with the stock Hive JDBC
  * driver over the real binary Thrift wire, run queries against a
  * metastore table, and shut down cleanly. This is the BI-tool/beeline
  * connectivity surface — the difference between a library and a server
  * a warehouse user can point a dashboard at.
  *
  * Own forked JVM (build.sbt `ownJvmSuites`): needs
  * `spark.sql.catalogImplementation=hive` (static conf) like HiveSpec,
  * plus the server binds a listening socket the shared suite JVM
  * shouldn't carry. Port 0 → the OS assigns an ephemeral port, read back
  * from `ThriftCLIService.getPortNumber` (the same discovery Spark's own
  * thriftserver tests use), so parallel CI runs can't collide.
  */
class ThriftServerSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val base = Files.createTempDirectory("graft-thrift").toFile.getAbsolutePath
  private var server: HiveServer2 = _
  private var port: Int = -1

  lazy val spark = {
    val s = Engine.builder("graft-thrift", "local[4]", 4)
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
      .config("spark.hadoop.datanucleus.schema.autoCreateAll", "true")
      .config("spark.hadoop.hive.metastore.schema.verification", "false")
      .config("spark.hadoop.hive.server2.thrift.port", "0")
      .config("spark.hadoop.hive.server2.thrift.bind.host", "localhost")
      .config("spark.hadoop.hive.exec.scratchdir", s"$base/scratch")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def beforeAll(): Unit = {
    // a real warehouse table for the wire to query: nation, via the same
    // metastore-parquet path HiveSpec pins
    Tables.load(spark, TestSession.sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").saveAsTable("thrift_nation")
    server = HiveThriftServer2.startWithSparkSession(spark, exitOnError = false)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (port <= 0 && System.nanoTime() < deadline) {
      port = server.getServices.asScala.collectFirst {
        case t: ThriftCLIService if t.getPortNumber > 0 => t.getPortNumber
      }.getOrElse(-1)
      if (port <= 0) Thread.sleep(100)
    }
    assert(port > 0, "ThriftCLIService never reported a bound port")
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    spark.stop()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(base))
  }

  private def connect() = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    DriverManager.getConnection(s"jdbc:hive2://localhost:$port/default", "graft", "")
  }

  /** Drains a ResultSet with an explicit cursor loop — iterator adapters
    * over the single mutable cursor (`takeWhile(_.next())` + `map`) call
    * `next()` once per lookahead AND once per element, silently skipping
    * alternate rows.
    */
  private def drain[T](rs: java.sql.ResultSet)(read: java.sql.ResultSet => T): List[T] = {
    val buf = List.newBuilder[T]
    while (rs.next()) buf += read(rs)
    buf.result()
  }

  test("JDBC connect → projection query → typed rows over the wire") {
    val conn = connect()
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT n_nationkey, n_name FROM thrift_nation ORDER BY n_nationkey")
      val rows = drain(rs)(r => (r.getLong(1), r.getString(2)))
      val want = spark.table("thrift_nation")
        .select(col("n_nationkey").cast("long"), col("n_name")).orderBy("n_nationkey")
        .collect().map(r => (r.getLong(0), r.getString(1))).toList
      assert(rows == want)
      assert(rows.nonEmpty)
    } finally conn.close()
  }

  test("aggregation pushdown through the server matches the engine") {
    val conn = connect()
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT n_regionkey, COUNT(*) AS n, SUM(n_nationkey) AS s
          |FROM thrift_nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
      val rows = drain(rs)(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      val want = spark.table("thrift_nation")
        .groupBy(col("n_regionkey").cast("long").as("rk"))
        .agg(count(lit(1)).as("n"), sum("n_nationkey").cast("long").as("s"))
        .orderBy("rk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      assert(rows == want)
    } finally conn.close()
  }

  test("catalog metadata is served over the wire (DatabaseMetaData)") {
    val conn = connect()
    try {
      val rs = conn.getMetaData.getTables(null, "default", "%", null)
      val tables = drain(rs)(_.getString("TABLE_NAME")).toSet
      assert(tables.contains("thrift_nation"), s"got tables: $tables")
    } finally conn.close()
  }

  test("concurrent JDBC sessions each get a working isolated session") {
    // two live connections issuing interleaved statements — the
    // multi-session server posture, not just a single happy path
    val c1 = connect(); val c2 = connect()
    try {
      val r1 = c1.createStatement().executeQuery("SELECT COUNT(*) FROM thrift_nation")
      assert(r1.next() && r1.getLong(1) == 25L)
      val r2 = c2.createStatement().executeQuery(
        "SELECT MAX(n_nationkey) FROM thrift_nation")
      assert(r2.next() && r2.getLong(1) == 24L)
      val r3 = c1.createStatement().executeQuery("SELECT 1 + 1")
      assert(r3.next() && r3.getInt(1) == 2)
    } finally { c1.close(); c2.close() }
  }

  test("clean shutdown: a stopped server refuses new connections") {
    server.stop()
    val refused =
      try { connect().close(); false }
      catch { case _: java.sql.SQLException => true }
    assert(refused, "connection succeeded after server.stop()")
    server = null // afterAll must not double-stop
  }
}
