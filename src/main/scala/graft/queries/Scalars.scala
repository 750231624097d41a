package graft.queries

import graft.{QDef, QModule}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8 FunctionRegistry families:
  * string, math, datetime, conditional, regexp, json, hash, array,
  * generators). One query per family projects a battery of functions over
  * a whole table keyed by its primary key, so the oracle compare checks
  * every row. All functions are codegen'd builtins — no UDFs in the hot
  * path (transcendentals whose last-ulp differs across libm live in the
  * ScalaTest spec instead of the oracle set).
  *
  * DuckDB's wider result types (BIGINT length/strpos, DOUBLE floor) are
  * cast on the oracle side to Spark's (INT/LONG) — see QDef notes.
  */
object Scalars extends QModule {

  val qFnString = QDef(
    "q_fn_string",
    (s, d) => t(s, d, "part").selectExpr(
      "p_partkey",
      "upper(p_type) AS up",
      "lower(p_brand) AS lo",
      "length(p_name) AS len",
      "substring(p_name, 3, 8) AS sub",
      "concat_ws('|', p_brand, p_type) AS cat",
      "lpad(p_brand, 12, '*') AS lp",
      "rpad(p_brand, 12, '*') AS rp",
      "replace(p_type, ' ', '_') AS repl",
      "reverse(p_brand) AS rev",
      "translate(p_brand, '#', '-') AS tr",
      "left(p_name, 5) AS l5",
      "right(p_name, 5) AS r5",
      "split_part(p_name, ' ', 1) AS w1",
      "instr(p_name, 'a') AS pos_a",
      "ascii(p_name) AS asc1",
      "levenshtein(p_brand, 'Brand#11') AS lev",
      "startswith(p_type, 'STANDARD') AS st",
      "contains(p_name, 'blue') AS has_blue",
      "repeat(p_brand, 2) AS rep2",
      "trim(BOTH '#' FROM p_brand) AS trm"),
    Some("""
      SELECT p_partkey,
        upper(p_type) AS up,
        lower(p_brand) AS lo,
        CAST(length(p_name) AS INTEGER) AS len,
        substring(p_name, 3, 8) AS sub,
        concat_ws('|', p_brand, p_type) AS cat,
        lpad(p_brand, 12, '*') AS lp,
        rpad(p_brand, 12, '*') AS rp,
        replace(p_type, ' ', '_') AS repl,
        reverse(p_brand) AS rev,
        translate(p_brand, '#', '-') AS tr,
        left(p_name, 5) AS l5,
        right(p_name, 5) AS r5,
        split_part(p_name, ' ', 1) AS w1,
        CAST(strpos(p_name, 'a') AS INTEGER) AS pos_a,
        CAST(ascii(p_name) AS INTEGER) AS asc1,
        CAST(levenshtein(p_brand, 'Brand#11') AS INTEGER) AS lev,
        starts_with(p_type, 'STANDARD') AS st,
        contains(p_name, 'blue') AS has_blue,
        repeat(p_brand, 2) AS rep2,
        trim(BOTH '#' FROM p_brand) AS trm
      FROM part"""))

  val qFnMath = QDef(
    "q_fn_math",
    (s, d) => t(s, d, "lineitem").selectExpr(
      "l_orderkey", "l_linenumber",
      "abs(l_quantity - 25.0) AS dist25",
      "CAST(signum(l_quantity - 25.0) AS DOUBLE) AS sgn",
      "floor(l_extendedprice) AS flr",
      "ceil(l_extendedprice) AS cl",
      "sqrt(l_extendedprice) AS sq",
      "round(l_quantity) AS rnd",
      "pmod(l_orderkey, 7) AS pm7",
      "l_quantity * l_quantity AS qty2",
      "greatest(l_tax, l_discount) AS gr",
      "least(l_tax, l_discount) AS ls",
      "l_orderkey & 255 AS band",
      "shiftleft(l_linenumber, 2) AS shl",
      "hex(l_orderkey) AS hx"),
    Some("""
      SELECT l_orderkey, l_linenumber,
        abs(l_quantity - 25.0) AS dist25,
        CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sgn,
        CAST(floor(l_extendedprice) AS BIGINT) AS flr,
        CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
        sqrt(l_extendedprice) AS sq,
        round(l_quantity) AS rnd,
        l_orderkey % 7 AS pm7,
        l_quantity * l_quantity AS qty2,
        greatest(l_tax, l_discount) AS gr,
        least(l_tax, l_discount) AS ls,
        l_orderkey & 255 AS band,
        CAST(l_linenumber << 2 AS INTEGER) AS shl,
        hex(l_orderkey) AS hx
      FROM lineitem"""))

  val qFnDatetime = QDef(
    "q_fn_datetime",
    (s, d) => t(s, d, "orders").selectExpr(
      "o_orderkey",
      "year(o_orderdate) AS yr",
      "month(o_orderdate) AS mo",
      "dayofmonth(o_orderdate) AS dom",
      "dayofweek(o_orderdate) AS dow",
      "dayofyear(o_orderdate) AS doy",
      "weekofyear(o_orderdate) AS wk",
      "quarter(o_orderdate) AS qtr",
      "unix_micros(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))) AS mo_start_us",
      "last_day(CAST(o_orderdate AS DATE)) AS eom",
      "date_add(CAST(o_orderdate AS DATE), 30) AS d30",
      "datediff(DATE'2024-06-01', CAST(o_orderdate AS DATE)) AS dd",
      "date_format(o_orderdate, 'yyyy-MM') AS ym",
      "make_date(year(o_orderdate), month(o_orderdate), 1) AS som",
      "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS od_us"),
    Some("""
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS INTEGER) AS yr,
        CAST(month(o_orderdate) AS INTEGER) AS mo,
        CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        CAST(weekofyear(o_orderdate) AS INTEGER) AS wk,
        CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        epoch_us(date_trunc('month', o_orderdate)) AS mo_start_us,
        last_day(o_orderdate) AS eom,
        CAST(o_orderdate AS DATE) + 30 AS d30,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-06-01') AS INTEGER) AS dd,
        strftime(o_orderdate, '%Y-%m') AS ym,
        make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS som,
        epoch_us(o_orderdate) AS od_us
      FROM orders"""))

  val qFnCond = QDef(
    "q_fn_cond",
    (s, d) => t(s, d, "customer").selectExpr(
      "CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket",
      "coalesce(nullif(c_mktsegment, 'BUILDING'), '-') AS seg2",
      "if(c_acctbal < 0, 'neg', 'pos') AS iff")
      .groupBy("bucket", "seg2", "iff").agg(count(lit(1)).as("cnt")),
    Some("""
      SELECT bucket, seg2, iff, COUNT(*) AS cnt FROM (
        SELECT
          CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket,
          coalesce(nullif(c_mktsegment, 'BUILDING'), '-') AS seg2,
          IF(c_acctbal < 0, 'neg', 'pos') AS iff
        FROM customer)
      GROUP BY bucket, seg2, iff"""))

  val qFnRegex = QDef(
    "q_fn_regex",
    (s, d) => t(s, d, "events").selectExpr(
      "event_id",
      """CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS kint""",
      "regexp_replace(event_type, '[aeiou]', '') AS novowel",
      "event_type RLIKE '^(c|p)' AS m"),
    Some("""
      SELECT event_id,
        CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS kint,
        regexp_replace(event_type, '[aeiou]', '', 'g') AS novowel,
        regexp_matches(event_type, '^(c|p)') AS m
      FROM events"""))

  val qFnJson = QDef(
    "q_fn_json",
    (s, d) => t(s, d, "events")
      .groupBy("event_type")
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("int")).as("k_sum"),
        sum(from_json(col("props"), lit("k INT")).getField("k")).as("k_sum2"),
        count(lit(1)).as("cnt")),
    Some("""
      SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum2,
        COUNT(*) AS cnt
      FROM events GROUP BY event_type"""))

  val qFnString2 = QDef(
    "q_fn_string2",
    (s, d) => t(s, d, "part").selectExpr(
      "p_partkey",
      "base64(encode(p_brand, 'UTF-8')) AS b64",
      "decode(unbase64(base64(encode(p_name, 'UTF-8'))), 'UTF-8') AS rt",
      "bin(p_partkey) AS bn",
      "bit_length(p_brand) AS bl",
      "chr(ascii(p_name) + 1) AS nextc",
      "format_string('%d-%s', p_size, p_brand) AS fmt",
      "p_brand || '/' || p_type AS pip"),
    Some("""
      SELECT p_partkey,
        base64(CAST(p_brand AS BLOB)) AS b64,
        CAST(from_base64(base64(CAST(p_name AS BLOB))) AS VARCHAR) AS rt,
        bin(p_partkey) AS bn,
        CAST(bit_length(p_brand) AS INTEGER) AS bl,
        chr(unicode(p_name) + 1) AS nextc,
        printf('%d-%s', p_size, p_brand) AS fmt,
        p_brand || '/' || p_type AS pip
      FROM part"""))

  /** Registry names with no DuckDB counterpart (initcap, soundex,
    * format_number, parse_url, str_to_map, crc32, xxhash64, to_json).
    * DuckDB cannot recompute them, so the query runs them over a FIXED
    * VALUES relation (edge rows: negative/zero numbers, missing and empty
    * URL params, absent map keys) and the oracle is the pinned expected
    * output — the same pins FunctionSpec asserts, promoted to the driver
    * gate so the surface is hash-checked instead of rows-only.
    */
  val qFnMisc = QDef(
    "q_fn_misc",
    sqlQ("""
      SELECT id,
        initcap(s) AS ic,
        soundex(w) AS sx,
        format_number(x, 2) AS fmtn,
        parse_url(u, 'QUERY', 'brand') AS purl,
        str_to_map(m, ',', ':')['b'] AS m_b,
        crc32(encode(w, 'UTF-8')) AS crc,
        xxhash64(w) AS xx,
        to_json(named_struct('w', w, 'n', id)) AS js
      FROM VALUES
        (1, 'economy brushed steel', 'Robert',   1199.99D,    'http://example.com/x?brand=Acme&sz=9', 'a:1,b:7'),
        (2, 'PROMO polished COPPER', 'Rupert',   0.5D,        'http://example.com/p?brand=Zeta',      'a:2,b:42'),
        (3, 'standard anodized tin', 'Ashcraft', -42.129D,    'http://example.com/?q=1&brand=Last',   'b:0,c:3'),
        (4, 'small plated nickel',   'Tymczak',  1234567.891D,'http://example.com/x?other=1',         'a:9,c:4'),
        (5, 'large burnished brass', 'Pfister',  0.0D,        'http://example.com/x?brand=',          'x:1')
        AS t(id, s, w, x, u, m)"""),
    // Pinned expectations: soundex rows are the canonical test vectors
    // (Robert/Rupert→R163, Ashcraft→A261, Tymczak→T522, Pfister→P236),
    // crc32 verified against zlib, xxhash64 is Spark's fixed-seed-42
    // variant (also pinned in FunctionSpec).
    Some("""
      SELECT * FROM (VALUES
        (1, 'Economy Brushed Steel', 'R163', '1,199.99',
         'Acme', '7', CAST(2125754577 AS BIGINT),
         CAST(4062994869349139189 AS BIGINT), '{"w":"Robert","n":1}'),
        (2, 'Promo Polished Copper', 'R163', '0.50',
         'Zeta', '42', CAST(2935251174 AS BIGINT),
         CAST(-2498947209604136897 AS BIGINT), '{"w":"Rupert","n":2}'),
        (3, 'Standard Anodized Tin', 'A261', '-42.13',
         'Last', '0', CAST(2337072898 AS BIGINT),
         CAST(8625032009485139586 AS BIGINT), '{"w":"Ashcraft","n":3}'),
        (4, 'Small Plated Nickel', 'T522', '1,234,567.89',
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(3507137138 AS BIGINT),
         CAST(8439251610845962639 AS BIGINT), '{"w":"Tymczak","n":4}'),
        (5, 'Large Burnished Brass', 'P236', '0.00',
         '', CAST(NULL AS VARCHAR), CAST(2026213310 AS BIGINT),
         CAST(-8593879582400526237 AS BIGINT), '{"w":"Pfister","n":5}')
      ) t(id, ic, sx, fmtn, purl, m_b, crc, xx, js)"""))

  val qFnHash = QDef(
    "q_fn_hash",
    (s, d) => t(s, d, "customer").selectExpr(
      "c_custkey",
      "md5(c_name) AS m",
      "sha2(c_name, 256) AS s256"),
    Some("""
      SELECT c_custkey, md5(c_name) AS m, sha256(c_name) AS s256
      FROM customer"""))

  val qFnArray = QDef(
    "q_fn_array",
    (s, d) => t(s, d, "documents")
      .withColumn("w", split(col("text"), " "))
      .selectExpr(
        "doc_id",
        "size(w) AS nw",
        "array_contains(w, 'spark') AS has_spark",
        "element_at(w, 1) AS first_w",
        "size(array_distinct(w)) AS uniq",
        "array_min(w) AS minw",
        "array_max(w) AS maxw",
        "array_join(slice(w, 1, 5), ' ') AS head5",
        "array_position(w, 'spark') AS pos_spark"),
    Some("""
      SELECT doc_id,
        CAST(len(w) AS INTEGER) AS nw,
        list_contains(w, 'spark') AS has_spark,
        w[1] AS first_w,
        CAST(len(list_distinct(w)) AS INTEGER) AS uniq,
        list_min(w) AS minw,
        list_max(w) AS maxw,
        array_to_string(w[1:5], ' ') AS head5,
        CAST(list_position(w, 'spark') AS BIGINT) AS pos_spark
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)"""))

  val qFnExplode = QDef(
    "q_fn_explode",
    (s, d) => t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt")),
    Some("""
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word"""),
    bench = true)

  val qFnPosexplode = QDef(
    "q_fn_posexplode",
    (s, d) => t(s, d, "documents")
      .filter(col("doc_id") < 5)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word"))),
    Some("""
      WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 5),
      e AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM ws)
      SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, w[i] AS word FROM e"""))

  /** Higher-order functions over arrays (the 4.x surface SURVEY §2.8
    * notes as "free extra" beyond the 2.4 registry): exists/forall/
    * filter/transform composed — DuckDB mirrors via list_filter/len.
    */
  val qFnHof = QDef(
    "q_fn_hof",
    (s, d) => t(s, d, "documents")
      .withColumn("w", split(col("text"), " "))
      .selectExpr(
        "doc_id",
        "exists(w, x -> x = 'spark') AS has_spark",
        "forall(w, x -> length(x) <= 8) AS all_short",
        "size(filter(w, x -> length(x) >= 6)) AS n_long",
        "aggregate(transform(w, x -> length(x)), 0, (a, b) -> a + b) AS tot_len",
        "array_join(transform(slice(w, 1, 3), x -> upper(x)), '-') AS up3"),
    Some("""
      SELECT doc_id,
        len(list_filter(w, x -> x = 'spark')) > 0 AS has_spark,
        len(list_filter(w, x -> length(x) > 8)) = 0 AS all_short,
        CAST(len(list_filter(w, x -> length(x) >= 6)) AS INTEGER) AS n_long,
        CAST(list_sum(list_transform(w, x -> length(x))) AS INTEGER) AS tot_len,
        array_to_string(list_transform(w[1:3], x -> upper(x)), '-') AS up3
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)"""))

  /** Map higher-order functions over real data (not pinned literals):
    * build a map per lineitem row, then transform_values / map_filter /
    * map_zip_with / map_concat, projecting scalars back out. The oracle
    * computes the same scalars with plain arithmetic — DuckDB has no
    * equivalent map HOFs, which is exactly why the projection-based
    * compare is the right gate here.
    */
  val qFnMap = QDef(
    "q_fn_map",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_orderkey") <= 1000)
      .selectExpr(
        "l_orderkey", "l_linenumber",
        "element_at(transform_values(map('qty', l_quantity, 'price', l_extendedprice), (k, v) -> v * 2.0), 'qty') AS qty2",
        "size(map_filter(map('qty', l_quantity, 'price', l_extendedprice), (k, v) -> v > 1000.0)) AS n_big",
        "element_at(map_zip_with(map('q', l_quantity), map('q', l_discount), (k, v1, v2) -> v1 * (1 - v2)), 'q') AS qdisc",
        "cardinality(map_concat(map('a', 1), map('b', 2))) AS n_cat"),
    Some("""
      SELECT l_orderkey, l_linenumber,
        l_quantity * 2.0 AS qty2,
        CAST(CASE WHEN l_quantity > 1000.0 THEN 1 ELSE 0 END
           + CASE WHEN l_extendedprice > 1000.0 THEN 1 ELSE 0 END AS INT) AS n_big,
        l_quantity * (1 - l_discount) AS qdisc,
        CAST(2 AS INT) AS n_cat
      FROM lineitem WHERE l_orderkey <= 1000"""))

  /** try_* family (ANSI-safe variants): under the engine's ANSI posture,
    * try_divide/try_cast return NULL where the strict form would raise —
    * the sanctioned way to keep dirty-data pipelines total. try_cast is
    * shared dialect (DuckDB TRY_CAST); try_divide mirrors as a CASE.
    */
  val qFnTry = QDef(
    "q_fn_try",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_orderkey") <= 200)
      .selectExpr(
        "l_orderkey", "l_linenumber",
        "try_divide(l_extendedprice, l_quantity - 25.0) AS safe_div",
        "try_cast(l_returnflag AS INT) AS rf_int",
        "try_cast(CAST(l_quantity AS STRING) AS DOUBLE) AS q_rt"),
    Some("""
      SELECT l_orderkey, l_linenumber,
        CASE WHEN l_quantity = 25.0 THEN NULL
             ELSE l_extendedprice / (l_quantity - 25.0) END AS safe_div,
        TRY_CAST(l_returnflag AS INT) AS rf_int,
        TRY_CAST(CAST(l_quantity AS STRING) AS DOUBLE) AS q_rt
      FROM lineitem WHERE l_orderkey <= 200"""))

  /** explode_outer: generator that PRESERVES rows whose array is empty
    * (null-padded) — the difference from plain explode that silently
    * drops them. 27 of the first 101 docs have no long words, so the
    * outer rows are non-trivial. Oracle = inner unnest UNION ALL the
    * empty-array rows with NULL.
    */
  val qFnExplodeOuter = QDef(
    "q_fn_explode_outer",
    (s, d) => t(s, d, "documents")
      .filter(col("doc_id") <= 100)
      .withColumn("arr", filter(split(col("text"), " "), w => length(w) >= 7))
      .select(col("doc_id"), explode_outer(col("arr")).as("x")),
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) >= 7) AS arr
        FROM documents WHERE doc_id <= 100)
      SELECT doc_id, x FROM (SELECT doc_id, UNNEST(arr) AS x FROM t) u
      UNION ALL
      SELECT doc_id, NULL AS x FROM t WHERE len(arr) = 0"""))

  /** Array SET operations (union/intersect/except) over two overlapping
    * word slices. Spark's variants de-duplicate; results are sorted on
    * both engines so element ORDER (which the engines define differently)
    * never enters the compare — only set equality does.
    */
  val qFnArraySet = QDef(
    "q_fn_arrayset",
    (s, d) => t(s, d, "documents")
      .filter(col("doc_id") <= 50)
      .selectExpr(
        "doc_id",
        "array_join(array_sort(array_union(slice(split(text, ' '), 1, 8), slice(split(text, ' '), 5, 8))), ',') AS u",
        "array_join(array_sort(array_intersect(slice(split(text, ' '), 1, 8), slice(split(text, ' '), 5, 8))), ',') AS i",
        "array_join(array_sort(array_except(slice(split(text, ' '), 1, 8), slice(split(text, ' '), 5, 8))), ',') AS e"),
    Some("""
      SELECT doc_id,
        array_to_string(list_sort(list_distinct(list_cat(a, b))), ',') AS u,
        array_to_string(list_sort(list_intersect(a, b)), ',') AS i,
        array_to_string(list_sort(list_filter(list_distinct(a), x -> NOT list_contains(b, x))), ',') AS e
      FROM (SELECT doc_id,
              string_split(text, ' ')[1:8] AS a,
              string_split(text, ' ')[5:12] AS b
            FROM documents WHERE doc_id <= 50) t"""))

  /** inline over zip_with: the struct-generator path — two unequal-length
    * slices zipped (shorter side null-padded), one output ROW per struct.
    * Oracle iterates positions with out-of-range indexing → NULL, the
    * same padding rule.
    */
  val qFnInline = QDef(
    "q_fn_inline",
    (s, d) => t(s, d, "documents")
      .filter(col("doc_id") <= 30)
      .selectExpr(
        "doc_id",
        "inline(zip_with(slice(split(text, ' '), 1, 6), slice(split(text, ' '), 4, 8), (x, y) -> named_struct('w1', x, 'w2', y)))"),
    Some("""
      SELECT doc_id, a[CAST(i AS INT)] AS w1, b[CAST(i AS INT)] AS w2
      FROM (SELECT doc_id,
              string_split(text, ' ')[1:6] AS a,
              string_split(text, ' ')[4:11] AS b
            FROM documents WHERE doc_id <= 30) t,
        UNNEST(range(1, greatest(len(a), len(b)) + 1)) AS g(i)"""))

  /** Calendar date spine: generate the full month series, LEFT JOIN the
    * fact's monthly counts so ZERO-activity months stay visible — the
    * gap-free reporting idiom (a bare GROUP BY silently drops empty
    * periods). The spine is generated, not scanned: zero I/O at any data
    * scale. Bounds deliberately OVERHANG the fixture's 1995-01..2001-11
    * date range on both ends, so the zero-fill path is always exercised
    * and a drifted fixture cannot silently fall outside the spine.
    */
  val qFnDateSpine = QDef(
    "q_fn_datespine",
    sqlQ("""
      WITH spine AS (
        SELECT explode(sequence(DATE '1994-07-01', DATE '2002-06-01', INTERVAL 1 MONTH)) AS mo),
      m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo, COUNT(*) AS n
        FROM orders GROUP BY 1)
      SELECT spine.mo, COALESCE(n, 0) AS n_orders
      FROM spine LEFT JOIN m ON spine.mo = m.mo ORDER BY spine.mo"""),
    Some("""
      WITH spine AS (
        SELECT CAST(UNNEST(generate_series(DATE '1994-07-01', DATE '2002-06-01', INTERVAL 1 MONTH)) AS DATE) AS mo),
      m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo, COUNT(*) AS n
        FROM orders GROUP BY 1)
      SELECT spine.mo, COALESCE(n, 0) AS n_orders
      FROM spine LEFT JOIN m ON spine.mo = m.mo ORDER BY spine.mo"""))

  /** from_csv: schema'd CSV-in-a-cell parsing (SURVEY §2.8 from_csv row
    * — the row-level twin of the csv SOURCE, used when a column carries
    * embedded delimited records). DuckDB has no from_csv, so the oracle
    * parses the same literals with split_part + casts — equal results
    * prove the parse, the typing, and null-on-malformed (`PERMISSIVE`)
    * behavior on the bad row.
    */
  val qFnFromCsv = QDef(
    "q_fn_fromcsv",
    sqlQ("""
      SELECT s, c.x AS x, c.y AS y, c.z AS z
      FROM (SELECT s, from_csv(s, 'x INT, y STRING, z DOUBLE') AS c
            FROM VALUES ('1,alpha,1.5'), ('2,beta,2.25'), ('3,gamma,-0.75'),
                        ('oops,delta,9.0') AS t(s))
      ORDER BY s"""),
    Some("""
      SELECT s,
             CAST(CASE WHEN regexp_matches(split_part(s, ',', 1), '^-?\d+$')
                       THEN split_part(s, ',', 1) END AS INT) AS x,
             split_part(s, ',', 2) AS y,
             CAST(split_part(s, ',', 3) AS DOUBLE) AS z
      FROM (VALUES ('1,alpha,1.5'), ('2,beta,2.25'), ('3,gamma,-0.75'),
                   ('oops,delta,9.0')) t(s)
      ORDER BY s"""))

  /** XML scalar family (Spark 4 core): `to_xml` serializes a struct,
    * `from_xml` parses it back with an explicit schema (round-trip
    * recovers the original values — the oracle is simply the source
    * columns), and the Hive `xpath_*` extractors pull typed values out of
    * a constructed document. All per-row projections — one scan, codegen.
    */
  val qFnXml = QDef(
    "q_fn_xml",
    sqlQ("""
      SELECT o_orderkey,
             from_xml(to_xml(named_struct('s', o_orderstatus, 'p', o_totalprice)),
                      's STRING, p DOUBLE').s AS s2,
             from_xml(to_xml(named_struct('s', o_orderstatus, 'p', o_totalprice)),
                      's STRING, p DOUBLE').p AS p2,
             xpath_string(concat('<r><k>', o_orderkey, '</k></r>'), '/r/k') AS xk,
             xpath_int(concat('<r><n>', o_custkey, '</n></r>'), '/r/n') AS xn
      FROM orders"""),
    Some("""
      SELECT o_orderkey, o_orderstatus AS s2, o_totalprice AS p2,
             CAST(o_orderkey AS STRING) AS xk, CAST(o_custkey AS INT) AS xn
      FROM orders"""))

  val defs: Seq[QDef] = Seq(
    qFnString, qFnMath, qFnDatetime, qFnCond, qFnRegex, qFnJson, qFnHash,
    qFnArray, qFnExplode, qFnPosexplode, qFnString2, qFnMisc, qFnHof, qFnMap,
    qFnTry, qFnExplodeOuter, qFnArraySet, qFnInline, qFnDateSpine, qFnFromCsv,
    qFnXml)
}
