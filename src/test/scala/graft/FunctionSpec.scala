package graft

import org.apache.spark.sql.functions._

/** Pins exact values for surface that has no DuckDB oracle (q_fn_misc
  * families), exercises the UDF registration surface, and the sketch
  * stat helpers (countMinSketch / bloomFilter).
  */
class FunctionSpec extends SparkSpecBase {

  test("q_fn_misc functions produce pinned values") {
    import spark.implicits._
    val row = Seq(("economy brushed steel", "Brand#13", 21, 1199.99))
      .toDF("p_name", "p_brand", "p_size", "p_retailprice")
      .selectExpr(
        "initcap(p_name) AS ic",
        "soundex(split_part(p_name, ' ', 1)) AS sx",
        "format_number(p_retailprice, 2) AS fmtn",
        "parse_url(concat('http://example.com/x?brand=', p_brand), 'QUERY', 'brand') AS purl",
        "str_to_map(concat('a:1,b:', p_size), ',', ':')['b'] AS m_b",
        "crc32(encode(p_brand, 'UTF-8')) AS crc",
        "xxhash64(p_brand) AS xx",
        "to_json(named_struct('brand', p_brand, 'size', p_size)) AS js")
      .head()
    assert(row.getString(0) == "Economy Brushed Steel")
    assert(row.getString(1) == "E255")
    assert(row.getString(2) == "1,199.99")
    // '#' starts the URL fragment, so the query value stops before it
    assert(row.getString(3) == "Brand")
    assert(row.getString(4) == "21")
    assert(row.getLong(5) == new java.util.zip.CRC32 {
      update("Brand#13".getBytes("UTF-8"))
    }.getValue)
    // xxHash64 with Spark's fixed seed 42 — pinned so a seed/variant
    // regression can't slip through the no-oracle surface
    assert(row.getLong(6) == -9052285755039000161L)
    assert(row.getString(7) == """{"brand":"Brand#13","size":21}""")
  }

  test("xpath / sentences / from_csv / map functions produce pinned values") {
    import spark.implicits._
    val row = Seq(("<a><b>7</b><b>8</b></a>", "Hi there. Bye now.", "5,apple"))
      .toDF("xml", "txt", "csvline")
      .selectExpr(
        "xpath_int(xml, 'sum(/a/b)') AS xsum",
        "xpath(xml, '/a/b/text()') AS xs",
        "sentences(txt) AS sents",
        "from_csv(csvline, 'n INT, fruit STRING') AS c",
        "map_keys(map('x', 1, 'y', 2)) AS mk",
        "transform_values(map('x', 1, 'y', 2), (k, v) -> v * 10)['y'] AS tv",
        "map_zip_with(map('a', 1), map('a', 2), (k, v1, v2) -> v1 + v2)['a'] AS mz")
      .head()
    assert(row.getInt(0) == 15)
    assert(row.getSeq[String](1) == Seq("7", "8"))
    assert(row.getSeq[Seq[String]](2) == Seq(Seq("Hi", "there"), Seq("Bye", "now")))
    assert(row.getStruct(3).getInt(0) == 5 && row.getStruct(3).getString(1) == "apple")
    assert(row.getSeq[String](4).sorted == Seq("x", "y"))
    assert(row.getInt(5) == 20)
    assert(row.getInt(6) == 3)
  }

  test("scala UDF registration surface (spark.udf.register)") {
    spark.udf.register("graft_norm", (s: String) => s.trim.toLowerCase)
    Tables.register(spark, sf)
    val a = spark.sql("SELECT COUNT(DISTINCT graft_norm(p_brand)) FROM part").head().getLong(0)
    val b = spark.sql("SELECT COUNT(DISTINCT lower(trim(p_brand))) FROM part").head().getLong(0)
    assert(a == b)
  }

  test("countMinSketch overestimates within bound; bloomFilter has no false negatives") {
    val df = Tables.load(spark, sf, "lineitem")
    val cms = df.stat.countMinSketch("l_suppkey", eps = 0.01, confidence = 0.95, seed = 42)
    val truth = df.groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = df.count() // hoisted: one job, not one per key
    truth.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"CMS underestimated $k")
      assert(est <= n + (0.01 * total).toLong + 1, s"CMS too far off for $k")
    }
    val bf = df.stat.bloomFilter("l_suppkey", expectedNumItems = 1000, fpp = 0.01)
    truth.keys.foreach(k => assert(bf.mightContain(k), s"bloom false negative $k"))
  }

  test("functions.udaf registers a typed Aggregator for SQL text") {
    // the same Aggregator that backs q_agg_weighted, but through the
    // functions.udaf registration surface and invoked from SQL
    spark.udf.register("graft_wavg", udaf(graft.functions.WeightedAvg))
    Tables.register(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, graft_wavg(l_returnflag, l_extendedprice, l_quantity) AS wavg_price
         FROM lineitem GROUP BY l_returnflag""")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaTyped = SparkEntry.queries("q_agg_weighted")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaTyped)
  }

  test("freqItems finds every heavy hitter above the support threshold") {
    val li = Tables.load(spark, sf, "lineitem")
    val freq = li.stat.freqItems(Array("l_returnflag"), 0.1)
      .head().getSeq[String](0).toSet
    // each return flag carries ~1/3 of the rows — all must be reported
    // (freqItems may over-report, never under-report true heavy hitters)
    val truth = li.groupBy("l_returnflag").count()
      .filter(col("count") > lit(0.1) * li.count())
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(freq), s"missing heavy hitters: ${truth -- freq}")
  }

  test("metadata functions: input_file_name, spark_partition_id, monotonically_increasing_id") {
    // SURVEY §2.8 misc/metadata names (reference CAT/expressions/misc.scala):
    // file provenance, physical partition id, and a distinct-per-row id —
    // the lineage/debugging surface of the scan layer.
    val df = Tables.load(spark, sf, "nation").select(
      expr("input_file_name()").as("f"),
      expr("spark_partition_id()").as("p"),
      expr("monotonically_increasing_id()").as("mid"))
    val rows = df.collect()
    assert(rows.forall(_.getString(0).contains("nation.parquet")),
      "input_file_name should point at the scanned parquet")
    assert(rows.map(_.getInt(1)).forall(_ >= 0))
    val mids = rows.map(_.getLong(2))
    assert(mids.distinct.length == mids.length,
      "monotonically_increasing_id must be distinct per row")
  }

  test("typed map/flatMap/mapGroups/cogroup surface") {
    import spark.implicits._
    val orders = Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_totalprice").as[(Long, Double)]
    val customers = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_acctbal").as[(Long, Double)]
    // map / flatMap round trip
    assert(orders.map(_._1).distinct().count() ==
      orders.flatMap(r => Seq(r._1)).distinct().count())
    // mapGroups: order count per customer
    val mg = orders.groupByKey(_._1).mapGroups((k, it) => (k, it.size)).collect().toMap
    val expect = Tables.load(spark, sf, "orders").groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(mg == expect)
    // cogroup: customers with their order counts (including zero)
    val cg = customers.groupByKey(_._1)
      .cogroup(orders.groupByKey(_._1)) { (k, cs, os) =>
        if (cs.nonEmpty) Iterator((k, os.size)) else Iterator.empty
      }.collect().toMap
    assert(cg.values.sum == orders.count())
    assert(cg.count(_._2 == 0) == SparkEntry.queries("q_join_anti")(spark, sf).count())
  }

  test("HLL sketches are mergeable: partial sketches union to the full estimate") {
    // The 100-TB distinct-count story: per-partition/per-group sketches
    // (hll_sketch_agg) merge associatively (hll_union_agg) — shuffle
    // carries fixed-size sketch bytes, never the distinct values.
    Tables.register(spark, sf)
    val exact = spark.sql("SELECT COUNT(DISTINCT o_custkey) FROM orders").head.getLong(0)
    val whole = spark.sql(
      "SELECT hll_sketch_estimate(hll_sketch_agg(o_custkey)) FROM orders").head.getLong(0)
    // split the table, sketch each half, merge the sketches
    val merged = spark.sql("""
      SELECT hll_sketch_estimate(hll_union_agg(sk)) FROM (
        SELECT hll_sketch_agg(o_custkey) AS sk FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT hll_sketch_agg(o_custkey) AS sk FROM orders WHERE o_orderkey % 2 = 1)""")
      .head.getLong(0)
    def closeTo(est: Long) = math.abs(est - exact).toDouble / exact < 0.05
    assert(closeTo(whole), s"whole-table estimate $whole vs exact $exact")
    assert(closeTo(merged), s"merged estimate $merged vs exact $exact")
    // NOTE: no whole == merged assertion — once sketches leave exact
    // coupon mode, a direct sketch estimates via HIP while a union result
    // uses the composite estimator; both are in-band but not bit-equal.
  }

  test("parameterized SQL binds named and positional markers") {
    Tables.register(spark, sf)
    val named = spark.sql(
      "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > :lo AND o_orderstatus = :st",
      Map("lo" -> 300000.0, "st" -> "F")).head.getLong(0)
    val positional = spark.sql(
      "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > ? AND o_orderstatus = ?",
      Array(300000.0, "F")).head.getLong(0)
    val want = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 300000.0 && col("o_orderstatus") === "F").count()
    assert(named == want && positional == want,
      s"param binding mismatch: named=$named positional=$positional want=$want")
  }

  test("SQL session variables: DECLARE, SET VAR, and reference in a query") {
    Tables.register(spark, sf)
    spark.sql("DECLARE OR REPLACE VARIABLE lo DOUBLE DEFAULT 300000.0")
    spark.sql("SET VAR lo = 250000.0")
    val n = spark.sql("SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > lo")
      .head.getLong(0)
    assert(n == Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 250000.0).count())
    // variables resolve under their qualified name too
    val q = spark.sql("SELECT system.session.lo AS v").head.getDouble(0)
    assert(q == 250000.0)
  }

  test("IDENTIFIER clause resolves table and column names from strings/parameters") {
    Tables.register(spark, sf)
    // templated-DDL/query safety surface: names come in as VALUES, not
    // string-spliced SQL — the injection-proof dynamic-identifier path
    val lit = spark.sql("SELECT COUNT(*) AS n FROM IDENTIFIER('nation')").head.getLong(0)
    val bound = spark.sql(
      "SELECT COUNT(DISTINCT IDENTIFIER(:col)) AS n FROM IDENTIFIER(:tbl)",
      Map("col" -> "n_regionkey", "tbl" -> "nation")).head.getLong(0)
    assert(lit == Tables.load(spark, sf, "nation").count())
    assert(bound ==
      Tables.load(spark, sf, "nation").select("n_regionkey").distinct.count())
  }

  test("EXECUTE IMMEDIATE runs dynamic SQL with USING parameters and INTO variables") {
    Tables.register(spark, sf)
    // dynamic-SQL surface (Spark 4, SPARK-44751): the statement text is a
    // value, parameters bind through USING — the templated-query path a
    // BI tool or stored procedure emits
    val n = spark.sql(
      "EXECUTE IMMEDIATE 'SELECT COUNT(*) AS n FROM nation WHERE n_regionkey = ?' USING 1")
      .head.getLong(0)
    assert(n == Tables.load(spark, sf, "nation")
      .filter(col("n_regionkey") === 1).count())
    // INTO captures the result in a session variable
    spark.sql("DECLARE OR REPLACE VARIABLE nn BIGINT")
    spark.sql("EXECUTE IMMEDIATE 'SELECT COUNT(*) FROM nation' INTO nn")
    assert(spark.sql("SELECT nn").head.getLong(0) ==
      Tables.load(spark, sf, "nation").count())
  }

  test("SQL scripting: BEGIN/END compound with DECLARE, WHILE, and IF control flow") {
    Tables.register(spark, sf)
    // Spark 4 SQL scripting (SPARK-48338) behind its runtime conf; the
    // procedural surface (migration path for stored-procedure workloads)
    val prev = spark.conf.getOption("spark.sql.scripting.enabled")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try {
      val regions = Tables.load(spark, sf, "region").count()
      val got = spark.sql("""
        BEGIN
          DECLARE total BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          WHILE i < 3 DO
            SET total = total + (SELECT COUNT(*) FROM region);
            SET i = i + 1;
          END WHILE;
          IF total > 0 THEN
            SELECT total AS t;
          END IF;
        END""").head.getLong(0)
      assert(got == 3 * regions, s"scripted loop computed $got, want ${3 * regions}")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.scripting.enabled", v)
      case None    => spark.conf.unset("spark.sql.scripting.enabled")
    }
  }

  test("typed joinWith and reduceGroups match their untyped equivalents") {
    import spark.implicits._
    val orders = Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_totalprice").as[(Long, Double)]
    val customers = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_acctbal").as[(Long, Double)]
    // joinWith keeps both sides as TYPED tuples (no column flattening)
    val jw = customers.joinWith(orders, customers("c_custkey") === orders("o_custkey"))
    assert(jw.head()._1 != null)
    assert(jw.count() == Tables.load(spark, sf, "orders").count(),
      "inner joinWith must pair every order with its customer")
    // outer joinWith null-pads the missing side as a null OBJECT
    val jwLeft = customers.joinWith(orders,
      customers("c_custkey") === orders("o_custkey") && orders("o_totalprice") > 400000.0,
      "left_outer")
    assert(jwLeft.filter(_._2 == null).count() > 0, "left joinWith lost its null padding")
    // reduceGroups: per-key max(total) equals the untyped agg
    val rg = orders.groupByKey(_._1)
      .reduceGroups((a, b) => if (a._2 >= b._2) a else b)
      .map { case (k, (_, v)) => (k, v) }.collect().toMap
    val want = Tables.load(spark, sf, "orders").groupBy("o_custkey")
      .agg(max("o_totalprice")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rg == want)
  }
}
