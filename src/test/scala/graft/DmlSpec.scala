package graft

import org.apache.spark.sql.connector.catalog.Identifier

import graft.sources.{DmlCatalog, DmlTable}

/** Row-level DML through the DataSource-V2 catalog (`graft.sources.DmlCatalog`):
  * DELETE/UPDATE/MERGE must route through Spark's group-based
  * RowLevelOperation rewrites and produce relationally-predicted state.
  */
class DmlSpec extends SparkSpecBase {

  private def init(): Unit = {
    Tables.register(spark, sf)
    spark.conf.set("spark.sql.catalog.graft_dml", classOf[DmlCatalog].getName)
  }

  private def dmlTable(name: String): DmlTable = {
    val cat = spark.sessionState.catalogManager.catalog("graft_dml")
      .asInstanceOf[DmlCatalog]
    cat.loadTable(Identifier.of(Array.empty, name)).asInstanceOf[DmlTable]
  }

  test("snapshot storage is file-backed: driver holds paths, parquet holds rows") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_dml.t_fs")
    spark.sql("CREATE TABLE graft_dml.t_fs AS SELECT o_orderkey, o_totalprice FROM orders")
    spark.sql("DELETE FROM graft_dml.t_fs WHERE o_orderkey % 2 = 0")
    val t = dmlTable("t_fs")
    val files = t.currentFiles
    assert(files.nonEmpty, "committed version must have a file list")
    assert(files.forall(f => f.endsWith(".parquet") && new java.io.File(f).isFile),
      s"version files must be real parquet files on disk: $files")
    // the driver-side state of a version is METADATA (paths), not rows:
    // its total size must be orders of magnitude below the data
    val metaBytes = files.map(_.length).sum
    val dataBytes = files.map(new java.io.File(_).length()).sum
    assert(metaBytes < 64 * 1024, s"file-list metadata unexpectedly large ($metaBytes B)")
    assert(dataBytes > 10 * metaBytes,
      s"data should live on disk (disk $dataBytes B vs driver metadata $metaBytes B)")
    // an appended version SHARES the prior version's files (lakehouse
    // metadata-log semantics) instead of rewriting them
    spark.sql("INSERT INTO graft_dml.t_fs VALUES (CAST(-1 AS BIGINT), CAST(0.0 AS DOUBLE))")
    val t2 = dmlTable("t_fs").currentFiles
    assert(files.forall(t2.contains), "append must reuse the prior version's files")
    assert(t2.size > files.size, "append must add new files")
    spark.sql("DROP TABLE graft_dml.t_fs")
  }

  test("CTAS + INSERT INTO append + INSERT OVERWRITE truncate round-trip") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_dml.t_rt")
    spark.sql("CREATE TABLE graft_dml.t_rt AS SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS v FROM nation")
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_rt").head.getLong(0) == 25)

    spark.sql("INSERT INTO graft_dml.t_rt VALUES (CAST(100 AS BIGINT), 'EXTRA')")
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_rt").head.getLong(0) == 26)

    spark.sql("INSERT OVERWRITE graft_dml.t_rt SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation WHERE n_regionkey = 0")
    val after = spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_rt").head.getLong(0)
    val expect = spark.sql("SELECT COUNT(*) AS c FROM nation WHERE n_regionkey = 0").head.getLong(0)
    assert(after == expect && after > 0)
    spark.sql("DROP TABLE graft_dml.t_rt")
  }

  test("DELETE routes through the group-based row-level operation and filters rows") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_dml.t_del")
    spark.sql("CREATE TABLE graft_dml.t_del AS SELECT c_custkey, c_acctbal FROM customer")
    val before = spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_del").head.getLong(0)
    val negatives = spark.sql("SELECT COUNT(*) AS c FROM customer WHERE c_acctbal < 0").head.getLong(0)
    assert(negatives > 0, "fixture should contain overdrawn customers")

    spark.sql("DELETE FROM graft_dml.t_del WHERE c_acctbal < 0")
    assert(dmlTable("t_del").opsSeen.contains("DELETE"),
      "DELETE must execute via SupportsRowLevelOperations, not a metadata path")
    val after = spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_del").head.getLong(0)
    assert(after == before - negatives)
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_del WHERE c_acctbal < 0").head.getLong(0) == 0)
    spark.sql("DROP TABLE graft_dml.t_del")
  }

  test("UPDATE rewrites the group copy-on-write and preserves untouched rows") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_dml.t_upd")
    spark.sql("CREATE TABLE graft_dml.t_upd AS SELECT c_custkey, c_mktsegment, c_acctbal FROM customer")
    spark.sql("UPDATE graft_dml.t_upd SET c_mktsegment = 'X' WHERE c_custkey % 10 = 3")
    assert(dmlTable("t_upd").opsSeen.contains("UPDATE"))

    val got = spark.sql(
      "SELECT c_custkey, c_mktsegment, c_acctbal FROM graft_dml.t_upd")
    val expect = spark.sql(
      """SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 3 THEN 'X' ELSE c_mktsegment END AS c_mktsegment,
               c_acctbal FROM customer""")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    spark.sql("DROP TABLE graft_dml.t_upd")
  }

  test("MERGE INTO exercises update + insert + not-matched-by-source delete") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_dml.t_mrg")
    // target: nations 0..14 with a marker count; source: nations 10..24
    spark.sql(
      """CREATE TABLE graft_dml.t_mrg AS
         SELECT CAST(n_nationkey AS BIGINT) AS k, CAST(1 AS BIGINT) AS hits
         FROM nation WHERE n_nationkey < 15""")
    spark.sql(
      """MERGE INTO graft_dml.t_mrg t
         USING (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation WHERE n_nationkey >= 10) s
         ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET hits = t.hits + 1
         WHEN NOT MATCHED THEN INSERT (k, hits) VALUES (s.k, CAST(0 AS BIGINT))
         WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(dmlTable("t_mrg").opsSeen.contains("MERGE"))

    // survivors are exactly the source keys: 10..14 updated to 2, 15..24 inserted as 0
    val rows = spark.sql("SELECT k, hits FROM graft_dml.t_mrg ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = (10L to 14L).map(k => (k, 2L)) ++ (15L to 24L).map(k => (k, 0L))
    assert(rows == expect)
    spark.sql("DROP TABLE graft_dml.t_mrg")
  }

  test("VERSION AS OF time travel reads each committed snapshot") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_dml.t_tt")
    spark.sql("CREATE TABLE graft_dml.t_tt AS SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation")
    spark.sql("DELETE FROM graft_dml.t_tt WHERE k >= 10")
    spark.sql("INSERT INTO graft_dml.t_tt VALUES (CAST(99 AS BIGINT))")
    def countAt(v: Int): Long =
      spark.sql(s"SELECT COUNT(*) AS c FROM graft_dml.t_tt VERSION AS OF $v").head.getLong(0)
    assert(countAt(0) == 25, "version 0 = CTAS population")
    assert(countAt(1) == 10, "version 1 = after DELETE")
    assert(countAt(2) == 11, "version 2 = after INSERT")
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_tt").head.getLong(0) == 11,
      "bare read = latest")
    val e = intercept[Exception](countAt(7))
    assert(e.getMessage.contains("no version"), s"wrong error: ${e.getMessage}")
    spark.sql("DROP TABLE graft_dml.t_tt")
  }

  test("CALL system.optimize bin-packs the live snapshot as a new invisible version") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_dml.t_opt")
    // CTAS from a many-partition source fragments the snapshot naturally
    spark.sql("""CREATE TABLE graft_dml.t_opt AS
      SELECT /*+ REPARTITION(16) */ o_orderkey, o_totalprice FROM orders""")
    val rows = spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_opt").head.getLong(0)
    val before = dmlTable("t_opt").currentFiles.size
    assert(before >= 8, s"fixture should fragment the snapshot (got $before files)")

    val res = spark.sql("CALL graft_dml.system.optimize('t_opt', 64)").collect()
    val (fb, fa, fr) = (res.head.getInt(0), res.head.getInt(1), res.head.getLong(2))
    assert(fb == before && fa < fb && fr == rows, s"optimize reported ($fb, $fa, $fr)")
    assert(dmlTable("t_opt").currentFiles.size == fa)
    assert(dmlTable("t_opt").opsSeen.contains("OPTIMIZE"))

    // invisible to readers: same rows, and the PRE-optimize version still
    // serves its original file set through time travel
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_opt").head.getLong(0) == rows)
    val sumBefore = spark.sql(
      "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM graft_dml.t_opt VERSION AS OF 0")
      .head.getLong(0)
    val sumAfter = spark.sql(
      "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM graft_dml.t_opt VERSION AS OF 1")
      .head.getLong(0)
    assert(sumBefore == sumAfter, "optimize must conserve every row")
    // ... and DML keeps working on the packed layout
    spark.sql("DELETE FROM graft_dml.t_opt WHERE o_orderkey % 2 = 0")
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_opt").head.getLong(0) < rows)
    spark.sql("DROP TABLE graft_dml.t_opt")
  }

  test("CALL system.vacuum expires old snapshots through the DSv2 procedure surface") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_dml.t_vac")
    spark.sql("CREATE TABLE graft_dml.t_vac AS SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation")
    spark.sql("DELETE FROM graft_dml.t_vac WHERE k >= 10")
    spark.sql("INSERT INTO graft_dml.t_vac VALUES (CAST(99 AS BIGINT))")
    // versions 0..2 exist; CALL with positional args expires all but 2
    def diskParquet(): Int = {
      val tableDir = new java.io.File(dmlTable("t_vac").currentFiles.head)
        .getParentFile.getParentFile
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(tableDir)
    }
    val filesBefore = diskParquet()
    val res = spark.sql("CALL graft_dml.system.vacuum('t_vac', 2)").collect()
    assert(res.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 2)),
      s"vacuum result: ${res.mkString}")
    // vacuum PHYSICALLY deletes the files only the expired version
    // referenced (version 0 = the CTAS files; versions 1..2 share the
    // post-DELETE rewrite's files)
    assert(diskParquet() < filesBefore,
      s"vacuum must delete expired versions' files ($filesBefore on disk before and after)")
    def countAt(v: Int): Long =
      spark.sql(s"SELECT COUNT(*) AS c FROM graft_dml.t_vac VERSION AS OF $v").head.getLong(0)
    val e = intercept[Exception](countAt(0))
    assert(e.getMessage.contains("expired by vacuum"), s"wrong error: ${e.getMessage}")
    assert(countAt(1) == 10 && countAt(2) == 11,
      "retained versions must keep their stable numbers and contents")
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft_dml.t_vac").head.getLong(0) == 11)
    // named-argument invocation binds through the analyzer too; idempotent
    val again = spark.sql(
      "CALL graft_dml.system.vacuum(table => 't_vac', keep => 2)").collect()
    assert(again.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((0, 2)))
    // retention floor is validated
    val bad = intercept[Exception](
      spark.sql("CALL graft_dml.system.vacuum('t_vac', 0)").collect())
    assert(bad.getMessage.contains("keep must be >= 1"))
    // catalog-level procedure metadata surface
    val shownDf = spark.sql("SHOW PROCEDURES IN graft_dml")
    val nameIdx = shownDf.schema.fieldIndex("procedure_name")
    val shown = shownDf.collect().map(_.getString(nameIdx))
    assert(shown.contains("vacuum"), s"SHOW PROCEDURES listed: ${shown.mkString(",")}")
    spark.sql("DROP TABLE graft_dml.t_vac")
  }

  test("ALTER TABLE ADD COLUMNS evolves the schema and null-fills history") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_dml.t_evo")
    spark.sql("CREATE TABLE graft_dml.t_evo AS SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation WHERE n_regionkey = 0")
    spark.sql("DELETE FROM graft_dml.t_evo WHERE k >= 15")
    spark.sql("ALTER TABLE graft_dml.t_evo ADD COLUMNS (score DOUBLE)")
    // old rows read back NULL-filled under the evolved schema
    val cur = spark.sql("SELECT k, score FROM graft_dml.t_evo").collect()
    assert(cur.nonEmpty && cur.forall(_.isNullAt(1)), "pre-evolution rows must be null-filled")
    // new-shape writes land
    spark.sql("INSERT INTO graft_dml.t_evo VALUES (CAST(77 AS BIGINT), CAST(0.5 AS DOUBLE))")
    val scored = spark.sql("SELECT score FROM graft_dml.t_evo WHERE k = 77").head.getDouble(0)
    assert(scored == 0.5)
    // time travel serves the latest schema with nulls where history predates it
    val v0 = spark.sql("SELECT k, score FROM graft_dml.t_evo VERSION AS OF 0").collect()
    assert(v0.length == 5 && v0.forall(_.isNullAt(1)),
      s"version 0 must keep its rows, null-filled: ${v0.length}")
    // non-additive changes refuse loudly
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft_dml.t_evo DROP COLUMN score"))
    assert(e.getMessage.contains("not supported"), s"wrong error: ${e.getMessage}")
    spark.sql("DROP TABLE graft_dml.t_evo")
  }

  test("declared DML queries match their relational mirrors in-engine") {
    // The DuckDB oracle is the driver's job; here each declared query's
    // result must equal its own oracle text's relational meaning computed
    // by Spark itself (same final-state semantics, independent plan).
    init()
    for ((name, mirror) <- Seq(
        "q_dml_delete" -> """
          WITH dml_del AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
            WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 150000.0))
          SELECT o_orderstatus, COUNT(*) AS n FROM dml_del GROUP BY o_orderstatus""",
        "q_dml_merge" -> s"""
          WITH t AS (
            SELECT c_custkey AS k, c_acctbal AS bal FROM customer WHERE c_custkey % 2 = 0),
          s AS (SELECT o_custkey AS k, COUNT(*) AS cnt, ${Exact.dsumSql("o_totalprice")} AS spend
                FROM orders GROUP BY o_custkey)
          SELECT s.k AS k,
                 CASE WHEN t.k IS NOT NULL THEN t.bal + s.spend ELSE 0.0 END AS bal,
                 s.cnt AS n_orders
          FROM s LEFT JOIN t ON t.k = s.k""")) {
      val got = SparkEntry.queries(name)(spark, sf)
      val gotCols = got.columns.sorted
      val mir = spark.sql(mirror)
      val g = got.selectExpr(gotCols.filter(mir.columns.contains): _*)
      val m = mir.selectExpr(gotCols.filter(mir.columns.contains): _*)
      assert(g.exceptAll(m).isEmpty && m.exceptAll(g).isEmpty, s"$name mismatch")
    }
  }
}
