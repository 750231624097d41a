package graft.queries

import graft.{Exact, QDef, QModule}

/** SQL-surface constructs beyond bare operators (SURVEY.md §3.1 parse
  * path, §2.13): CTEs, HAVING, USING joins, inline VALUES relations,
  * nested set ops in SQL text. Mostly ANSI — the same text runs on both
  * engines unless noted.
  */
object Sql extends QModule {

  private val cteSql = s"""
      WITH big AS (
        SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 400000),
      percust AS (
        SELECT o_custkey, COUNT(*) AS n_big,
               ${Exact.dsumSql("o_totalprice")} AS spend
        FROM big GROUP BY o_custkey)
      SELECT n_big, COUNT(*) AS n_cust, ${Exact.dsumSql("spend")} AS total
      FROM percust GROUP BY n_big"""
  val qSqlCte = QDef("q_sql_cte", sqlQ(cteSql), Some(cteSql))

  private val havingSql = s"""
      SELECT l_suppkey, COUNT(*) AS cnt, ${Exact.dsumSql("l_quantity")} AS qty
      FROM lineitem GROUP BY l_suppkey
      HAVING COUNT(*) > 550 AND ${Exact.dsumSql("l_quantity")} > 14000"""
  val qSqlHaving = QDef("q_sql_having", sqlQ(havingSql), Some(havingSql))

  private val usingSql = """
      WITH a AS (SELECT c_custkey AS k, c_acctbal FROM customer),
           b AS (SELECT o_custkey AS k, o_totalprice FROM orders)
      SELECT k, COUNT(*) AS n, MAX(c_acctbal) AS bal
      FROM a JOIN b USING (k) GROUP BY k"""
  val qSqlUsing = QDef("q_sql_using", sqlQ(usingSql), Some(usingSql))

  val qSqlValues = QDef(
    "q_sql_values",
    sqlQ("""
      SELECT t.seg, COUNT(c_custkey) AS cnt
      FROM VALUES ('BUILDING'), ('AUTOMOBILE'), ('NOSUCH') AS t(seg)
      LEFT JOIN customer ON c_mktsegment = t.seg
      GROUP BY t.seg"""),
    Some("""
      SELECT t.seg, COUNT(c_custkey) AS cnt
      FROM (VALUES ('BUILDING'), ('AUTOMOBILE'), ('NOSUCH')) t(seg)
      LEFT JOIN customer ON c_mktsegment = t.seg
      GROUP BY t.seg"""))

  private val nestedSetSql = """
      SELECT n_key, COUNT(*) AS cnt FROM (
        SELECT c_nationkey AS n_key FROM customer WHERE c_acctbal > 0
        UNION ALL
        (SELECT s_nationkey FROM supplier
         EXCEPT
         SELECT n_nationkey FROM nation WHERE n_regionkey = 0))
      GROUP BY n_key"""
  val qSqlNestedSet = QDef("q_sql_nestedset", sqlQ(nestedSetSql), Some(nestedSetSql))

  /** LATERAL correlated subquery — top-2 customers per nation, the
    * per-row-subquery shape (SQL:1999 LATERAL; Spark ≥3.2 and DuckDB share
    * the syntax). Catalyst decorrelates the LIMIT-under-correlation into a
    * window rank + filter, so no per-outer-row execution happens — the same
    * plan q_topk_perkey proves scales.
    */
  private val lateralSql = """
      SELECT n_name, t.c_name, t.c_acctbal
      FROM nation, LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t"""
  val qSqlLateral = QDef("q_sql_lateral", sqlQ(lateralSql), Some(lateralSql))

  /** NATURAL JOIN resolution (§2.3 — Analyzer matches the shared column
    * names and deduplicates them in the output). The fixture tables have
    * disjoint prefixes, so the shared key is staged through CTE renames.
    */
  private val naturalSql = """
      WITH a AS (SELECT c_custkey AS k, c_acctbal FROM customer),
           b AS (SELECT o_custkey AS k, o_totalprice FROM orders)
      SELECT k, COUNT(*) AS n, MIN(o_totalprice) AS lo
      FROM a NATURAL JOIN b GROUP BY k"""
  val qSqlNatural = QDef("q_sql_natural", sqlQ(naturalSql), Some(naturalSql))

  /** GROUP BY ALL / ORDER BY ALL (SQL:2023-era sugar, Spark 3.4+): the
    * resolver infers the grouping keys from the non-aggregate select list.
    * Shared dialect — DuckDB resolves the same text identically.
    */
  private val groupAllSql = s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
             ${graft.Exact.dsumSql("l_quantity", 2)} AS qty
      FROM lineitem GROUP BY ALL ORDER BY ALL"""
  val qSqlGroupAll = QDef("q_sql_groupall", sqlQ(groupAllSql), Some(groupAllSql))

  /** Lateral column aliases (Spark 3.4+): a SELECT-list alias referenced
    * by a LATER item in the same list — no subquery nesting needed.
    * DuckDB resolves the same text identically.
    */
  private val lateralAliasSql = """
      SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS net,
             net * (1 + l_tax) AS gross
      FROM lineitem WHERE l_orderkey <= 20 ORDER BY l_orderkey, net"""
  val qSqlLateralAlias = QDef(
    "q_sql_lateralalias", sqlQ(lateralAliasSql), Some(lateralAliasSql))

  /** VARIANT (Spark 4.x semi-structured type): parse_json into a variant,
    * variant_get typed extraction, missing paths → NULL. The oracle
    * mirrors with DuckDB's JSON extraction.
    */
  val qSqlVariant = QDef(
    "q_sql_variant",
    (s, d) => {
      graft.Tables.register(s, d)
      s.sql("""
        SELECT event_id,
               CAST(variant_get(parse_json(props), '$.k', 'int') AS INT) AS k_int,
               CAST(variant_get(parse_json(props), '$.missing', 'string') AS STRING) AS missing_str
        FROM events WHERE event_id <= 100 ORDER BY event_id""")
    },
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
             json_extract_string(props, '$.missing') AS missing_str
      FROM events WHERE event_id <= 100 ORDER BY event_id"""))

  /** WITH RECURSIVE (landed in Spark 4.0): hierarchy traversal carrying
    * depth and a materialized path. Each recursion step is one self-join
    * against the previous frontier — bounded by tree depth, never by row
    * count, so the plan is iteration-of-joins (the UnionLoop machinery),
    * not a driver loop. Same text runs on DuckDB.
    */
  private val recursiveSql = """
      WITH RECURSIVE tree(id, depth, path) AS (
        SELECT 0, 0, CAST('0' AS STRING)
        UNION ALL
        SELECT c.id, t.depth + 1, CONCAT(t.path, '/', CAST(c.id AS STRING))
        FROM (VALUES (1, 0), (2, 0), (3, 1), (4, 1), (5, 2), (6, 3), (7, 5)) AS c(id, parent)
        JOIN tree t ON c.parent = t.id)
      SELECT id, depth, path FROM tree ORDER BY id"""
  val qSqlRecursive = QDef("q_sql_recursive", sqlQ(recursiveSql), Some(recursiveSql))

  /** SQL PIVOT clause (parser-level pivot, Spark ≥3.4 — the SQL spelling
    * of the `.pivot()` API already declared in q_agg_pivot): yearly order
    * counts widen to one column per status. Missing (year, status) cells
    * come back NULL from PIVOT (an aggregate over no rows), so COALESCE
    * pins them to 0 to match the oracle's FILTER form, which DuckDB
    * expresses with ANSI `COUNT(*) FILTER (WHERE …)` — its own PIVOT
    * syntax differs, and the conditional-aggregate form IS the plan both
    * engines execute anyway.
    */
  val qSqlPivot = QDef(
    "q_sql_pivot",
    sqlQ("""
      SELECT yr, COALESCE(f, 0) AS f, COALESCE(o, 0) AS o, COALESCE(p, 0) AS p
      FROM (SELECT o_orderstatus, CAST(YEAR(o_orderdate) AS INT) AS yr FROM orders)
        PIVOT (COUNT(*) FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
      ORDER BY yr"""),
    Some("""
      SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f,
             COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o,
             COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p
      FROM orders GROUP BY 1 ORDER BY yr"""))

  /** SQL UNPIVOT clause (parser-level melt, Spark ≥3.4 — the SQL
    * spelling of the `Dataset.unpivot` API already declared in
    * q_agg_unpivot): per-nation customer metrics back to long form. The
    * unpivoted value columns share one type (BIGINT count + exact BIGINT
    * balance units), as the clause requires. DuckDB's UNPIVOT dialect
    * differs, so the oracle is the UNION ALL form the clause desugars to.
    */
  private val unpivotBase = s"""
      WITH per_nation AS (
        SELECT c_nationkey AS nk, COUNT(*) AS cnt,
               ${graft.Exact.usumSql("c_acctbal", 2)} AS bal_units
        FROM customer GROUP BY c_nationkey)"""
  val qSqlUnpivot = QDef(
    "q_sql_unpivot",
    sqlQ(s"""
      $unpivotBase
      SELECT nk, metric, val
      FROM per_nation UNPIVOT (val FOR metric IN (cnt, bal_units))
      ORDER BY nk, metric"""),
    Some(s"""
      $unpivotBase
      SELECT nk, 'cnt' AS metric, cnt AS val FROM per_nation
      UNION ALL
      SELECT nk, 'bal_units' AS metric, bal_units AS val FROM per_nation
      ORDER BY nk, metric"""))

  /** SQL-defined scalar UDF (Spark ≥4.0 `CREATE FUNCTION … RETURN expr`) —
    * the catalog-managed way users package business expressions without
    * JVM code. The analyzer INLINES the body into the plan, so the exact
    * unit-sum arithmetic, codegen, and pushdown all still apply — the
    * oracle is the same query with the body substituted by hand, and the
    * hash match proves the inlining is semantics-preserving.
    */
  val qSqlUdf = QDef(
    "q_sql_udf",
    (s, d) => {
      graft.Tables.register(s, d)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, dsc DOUBLE)
               RETURNS DOUBLE RETURN p * (1 - dsc)""")
      s.sql(s"""
        SELECT l_returnflag,
               CAST(${graft.Exact.usumSql("net_price(l_extendedprice, l_discount)", 4)} AS DOUBLE) / 1e4 AS net_rev
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some(s"""
      SELECT l_returnflag,
             CAST(${graft.Exact.usumSql("l_extendedprice * (1 - l_discount)", 4)} AS DOUBLE) / 1e4 AS net_rev
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** SQL-defined TABLE function (CREATE FUNCTION ... RETURNS TABLE,
    * SPARK-44746) invoked through a CORRELATED LATERAL join — the
    * view-with-parameters surface: per customer, the TVF returns that
    * customer's orders above a price floor, and the outer query
    * aggregates them. The analyzer inlines the body and decorrelates
    * the lateral into an equi-join (plan-verified by the oracle hash:
    * DuckDB computes the same result as a plain join + aggregate).
    *
    * SHARP EDGE, found by probing and deliberately kept OUT of this
    * query's body: a correlated SQL TVF whose body contains ORDER BY +
    * LIMIT decorrelates WRONG in Spark 4.1 — the GlobalLimit is pulled
    * above the correlation and applied ONCE globally instead of per
    * outer row, silently returning wrong (mostly empty) results. The
    * per-key-top-k shape must be written with a window rank (see
    * q_sql_lateral) until that is fixed upstream; filter-only TVF
    * bodies like this one decorrelate correctly.
    */
  val qSqlTvf = QDef(
    "q_sql_tvf",
    (s, d) => {
      graft.Tables.register(s, d)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION cust_orders(cust BIGINT, minp DOUBLE)
               RETURNS TABLE (ok BIGINT, price DOUBLE)
               RETURN SELECT o_orderkey, o_totalprice FROM orders
                      WHERE o_custkey = cust AND o_totalprice >= minp""")
      s.sql(s"""
        SELECT c.c_custkey, COUNT(*) AS n_big,
               ${graft.Exact.dsumSql("t.price", 2)} AS big_total
        FROM customer c JOIN LATERAL cust_orders(c.c_custkey, 150000.0D) t
        GROUP BY c.c_custkey""")
    },
    Some(s"""
      SELECT c.c_custkey, COUNT(*) AS n_big,
             ${graft.Exact.dsumSql("o.o_totalprice", 2)} AS big_total
      FROM customer c JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_totalprice >= 150000.0
      GROUP BY c.c_custkey"""))

  /** SQL pipe syntax (Spark 4.0 `|>` operators, SPARK-49555): the same
    * relational program written as a left-to-right pipeline — FROM |>
    * WHERE |> AGGREGATE |> WHERE(post-agg HAVING) |> ORDER BY. Parses to
    * the identical logical plan as the nested form, which the standard-
    * SQL oracle proves by hash equality (DuckDB has no pipe syntax, so
    * this is one of the few queries whose engine text and oracle text
    * legitimately differ).
    */
  val qSqlPipe = QDef(
    "q_sql_pipe",
    sqlQ(s"""
      FROM lineitem
      |> WHERE l_quantity >= 10
      |> AGGREGATE COUNT(*) AS cnt, ${Exact.dsumSql("l_extendedprice", 2)} AS rev
         GROUP BY l_returnflag, l_linestatus
      |> WHERE cnt > 100
      |> ORDER BY l_returnflag, l_linestatus"""),
    Some(s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
             ${Exact.dsumSql("l_extendedprice", 2)} AS rev
      FROM lineitem WHERE l_quantity >= 10
      GROUP BY l_returnflag, l_linestatus
      HAVING COUNT(*) > 100
      ORDER BY l_returnflag, l_linestatus"""))

  /** Spark 4 string collations (SQL:2016 COLLATE): case-insensitive
    * GROUPING and COMPARISON through the type system rather than
    * `lower()` rewrites — the collated value groups 'Alpha'/'ALPHA'/
    * 'alpha' as one key and `= 'ALPHA'` matches all three. The grouped
    * key's surface form is whichever variant the engine keeps, so the
    * PROJECTED key is `MIN(lower(name))` (deterministic in both
    * engines); DuckDB spells the same collation NOCASE. Engine-relevant
    * because a 100 TB text corpus dedups/joins on collated keys without
    * materializing normalized copies of every string column.
    */
  private def collateSql(dialect: String): String = {
    val (rel, key, cmp) = dialect match {
      case "spark" => (
        "SELECT name COLLATE UTF8_LCASE AS cname, name FROM " +
          "VALUES ('Alpha'), ('ALPHA'), ('alpha'), ('Beta'), ('beta'), ('Gamma') AS t(name)",
        "cname",
        "cname = 'ALPHA'")
      case _ => (
        "SELECT name AS cname, name FROM (VALUES ('Alpha'), ('ALPHA'), ('alpha'), ('Beta'), ('beta'), ('Gamma')) t(name)",
        "cname COLLATE NOCASE",
        "cname COLLATE NOCASE = 'ALPHA'")
    }
    s"""
      SELECT MIN(lower(name)) AS grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN $cmp THEN 1 ELSE 0 END) AS BIGINT) AS eq_alpha
      FROM ($rel) c
      GROUP BY $key"""
  }
  val qSqlCollate = QDef(
    "q_sql_collate",
    sqlQ(collateSql("spark")),
    Some(collateSql("duck")))

  val defs: Seq[QDef] = Seq(qSqlCte, qSqlHaving, qSqlUsing, qSqlValues,
    qSqlNestedSet, qSqlLateral, qSqlNatural, qSqlGroupAll, qSqlLateralAlias,
    qSqlVariant, qSqlRecursive, qSqlPivot, qSqlUnpivot, qSqlUdf, qSqlPipe,
    qSqlCollate, qSqlTvf)
}
