package graft.queries

import graft.{Exact, QDef, QModule, Tables}

/** Row-level DML — DELETE FROM / UPDATE / MERGE INTO (SURVEY §2.13; lifts
  * the COVERAGE "v2-only DML fence"). Each query materializes a DML target
  * in the engine's [[graft.sources.DmlCatalog]] (a DataSource-V2 catalog
  * with group-based copy-on-write row-level operations), mutates it with
  * REAL DML statements through Catalyst's RewriteDelete/Update/MergeInto
  * rewrites, and returns the post-DML state; the DuckDB oracle computes
  * the same final state purely relationally from the parquet inputs — so
  * a hash match proves the whole DML pipeline (parse → rewrite → replace
  * scan → outer-join merge shapes → atomic group replacement) is
  * semantics-preserving.
  *
  * Scale: the rewrites plan exactly the join shapes a lakehouse MERGE
  * plans (target-scan ⟗ source on the ON condition); group granularity is
  * the storage side's concern (files/partitions in Iceberg/Delta; one
  * whole-table group here — dimension-sized targets, see DmlCatalog
  * scaladoc). Determinism: money deltas go through the [[Exact]] unit-sum
  * pattern, so the merged balances are bit-identical on both engines.
  */
object Dml extends QModule {

  private def dmlQ(setup: Seq[String], result: String): QFn = (s, d) => {
    Tables.register(s, d)
    s.conf.set("spark.sql.catalog.graft_dml",
      classOf[graft.sources.DmlCatalog].getName)
    setup.foreach(s.sql(_))
    s.sql(result)
  }

  // ---- DELETE FROM -------------------------------------------------------
  // Copy orders in, delete low-value finished orders, aggregate survivors.
  private val delResult = s"""
      SELECT o_orderstatus, COUNT(*) AS n, ${Exact.dsumSql("o_totalprice")} AS total
      FROM graft_dml.dml_del GROUP BY o_orderstatus"""
  val qDmlDelete = QDef(
    "q_dml_delete",
    dmlQ(
      Seq(
        "DROP TABLE IF EXISTS graft_dml.dml_del",
        """CREATE TABLE graft_dml.dml_del AS
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders""",
        "DELETE FROM graft_dml.dml_del WHERE o_orderstatus = 'F' AND o_totalprice < 150000.0"),
      delResult),
    Some(s"""
      WITH dml_del AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 150000.0))
      SELECT o_orderstatus, COUNT(*) AS n, ${Exact.dsumSql("o_totalprice")} AS total
      FROM dml_del GROUP BY o_orderstatus"""))

  // ---- UPDATE ------------------------------------------------------------
  // Rescue overdrawn customers: bump balance, relabel segment.
  private val updResult = s"""
      SELECT c_mktsegment, COUNT(*) AS n, ${Exact.dsumSql("c_acctbal")} AS bal
      FROM graft_dml.dml_upd GROUP BY c_mktsegment"""
  val qDmlUpdate = QDef(
    "q_dml_update",
    dmlQ(
      Seq(
        "DROP TABLE IF EXISTS graft_dml.dml_upd",
        """CREATE TABLE graft_dml.dml_upd AS
           SELECT c_custkey, c_mktsegment, c_acctbal FROM customer""",
        """UPDATE graft_dml.dml_upd
           SET c_acctbal = c_acctbal + 1000.0, c_mktsegment = 'RESCUED'
           WHERE c_acctbal < 0"""),
      updResult),
    Some(s"""
      WITH dml_upd AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'RESCUED' ELSE c_mktsegment END AS c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN c_acctbal + 1000.0 ELSE c_acctbal END AS c_acctbal
        FROM customer)
      SELECT c_mktsegment, COUNT(*) AS n, ${Exact.dsumSql("c_acctbal")} AS bal
      FROM dml_upd GROUP BY c_mktsegment"""))

  // ---- MERGE INTO --------------------------------------------------------
  // Upsert per-customer order stats into an even-keyed account snapshot,
  // exercising all three clause families: MATCHED → UPDATE (balance +=
  // exact spend), NOT MATCHED → INSERT, NOT MATCHED BY SOURCE → DELETE.
  private val mrgSource = s"""
      SELECT o_custkey AS k, COUNT(*) AS cnt, ${Exact.dsumSql("o_totalprice")} AS spend
      FROM orders GROUP BY o_custkey"""
  val qDmlMerge = QDef(
    "q_dml_merge",
    dmlQ(
      Seq(
        "DROP TABLE IF EXISTS graft_dml.dml_mrg",
        """CREATE TABLE graft_dml.dml_mrg AS
           SELECT c_custkey AS k, c_acctbal AS bal, CAST(0 AS BIGINT) AS n_orders
           FROM customer WHERE c_custkey % 2 = 0""",
        s"""MERGE INTO graft_dml.dml_mrg t
           USING ($mrgSource) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET bal = t.bal + s.spend, n_orders = s.cnt
           WHEN NOT MATCHED THEN INSERT (k, bal, n_orders) VALUES (s.k, CAST(0.0 AS DOUBLE), s.cnt)
           WHEN NOT MATCHED BY SOURCE THEN DELETE"""),
      "SELECT k, bal, n_orders FROM graft_dml.dml_mrg"),
    Some(s"""
      WITH t AS (
        SELECT c_custkey AS k, c_acctbal AS bal FROM customer WHERE c_custkey % 2 = 0),
      s AS ($mrgSource)
      SELECT s.k AS k,
             CASE WHEN t.k IS NOT NULL THEN t.bal + s.spend ELSE 0.0 END AS bal,
             s.cnt AS n_orders
      FROM s LEFT JOIN t ON t.k = s.k"""))

  // ---- VERSION AS OF time travel ----------------------------------------
  // Three committed states (CTAS → DELETE → UPDATE), then one query reads
  // ALL of them by version plus the latest, proving snapshot isolation of
  // the version chain; the oracle recomputes each state relationally.
  val qDmlTimetravel = QDef(
    "q_dml_timetravel",
    dmlQ(
      Seq(
        "DROP TABLE IF EXISTS graft_dml.dml_tt",
        """CREATE TABLE graft_dml.dml_tt AS
           SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders""",
        "DELETE FROM graft_dml.dml_tt WHERE o_orderstatus = 'O'",
        """UPDATE graft_dml.dml_tt SET o_totalprice = o_totalprice * 2
           WHERE o_orderstatus = 'F'"""),
      s"""
      SELECT v, CAST(COUNT(*) AS BIGINT) AS n,
             ${Exact.dsumSql("total", 2)} AS sum_price
      FROM (
        SELECT 0 AS v, o_totalprice AS total
        FROM graft_dml.dml_tt VERSION AS OF 0
        UNION ALL
        SELECT 1, o_totalprice FROM graft_dml.dml_tt VERSION AS OF 1
        UNION ALL
        SELECT 2, o_totalprice FROM graft_dml.dml_tt VERSION AS OF 2
        UNION ALL
        SELECT 3, o_totalprice FROM graft_dml.dml_tt) s
      GROUP BY v"""),
    Some(s"""
      WITH v0 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      v1 AS (SELECT * FROM v0 WHERE NOT (o_orderstatus = 'O')),
      v2 AS (SELECT o_orderkey, o_orderstatus,
                    CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
                         ELSE o_totalprice END AS o_totalprice FROM v1)
      SELECT v, CAST(COUNT(*) AS BIGINT) AS n,
             ${Exact.dsumSql("total", 2)} AS sum_price
      FROM (
        SELECT 0 AS v, o_totalprice AS total FROM v0
        UNION ALL SELECT 1, o_totalprice FROM v1
        UNION ALL SELECT 2, o_totalprice FROM v2
        UNION ALL SELECT 3, o_totalprice FROM v2) s
      GROUP BY v"""))

  // ---- Change data feed (version-diff CDC) --------------------------------
  // The lakehouse CDF surface (Delta's table_changes / Iceberg's
  // changelog): every changed row between two committed versions, tagged
  // insert/delete/update with old and new values. Computed as a snapshot
  // DIFF — a full outer join of VERSION AS OF 0 and latest on the primary
  // key, classified by side-nullness and value inequality — which is how
  // a format computes CDF when no change files were stored; at 100 TB the
  // join is key-partitioned on both sides (two scans + one co-partitioned
  // shuffle), never a row-by-row log replay. The oracle recomputes both
  // versions relationally and mirrors the same diff, so a hash match
  // proves the version chain preserves exactly the row images CDC needs.
  private val cdfDiff = """
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                  WHEN b.o_orderkey IS NULL THEN 'delete'
                  ELSE 'update' END AS change_type,
             a.o_totalprice AS old_price, b.o_totalprice AS new_price
      FROM va a FULL OUTER JOIN vb b ON a.o_orderkey = b.o_orderkey
      WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
         OR a.o_totalprice <> b.o_totalprice"""
  val qDmlCdf = QDef(
    "q_dml_cdf",
    dmlQ(
      Seq(
        "DROP TABLE IF EXISTS graft_dml.dml_cdf",
        """CREATE TABLE graft_dml.dml_cdf AS
           SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders""",
        "DELETE FROM graft_dml.dml_cdf WHERE o_orderstatus = 'O'",
        """UPDATE graft_dml.dml_cdf SET o_totalprice = o_totalprice * 2
           WHERE o_orderstatus = 'F'"""),
      s"""
      WITH va AS (SELECT * FROM graft_dml.dml_cdf VERSION AS OF 0),
      vb AS (SELECT * FROM graft_dml.dml_cdf)
      $cdfDiff"""),
    Some(s"""
      WITH va AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      vb AS (SELECT o_orderkey, o_orderstatus,
                    CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
                         ELSE o_totalprice END AS o_totalprice
             FROM va WHERE NOT (o_orderstatus = 'O'))
      $cdfDiff"""))

  // ---- Incremental view maintenance from the change feed ------------------
  // The O(changes) refresh story: a materialized aggregate is brought
  // up to date by MERGING the old view with signed contributions from
  // the change feed — never by rescanning the base table. The feed is
  // MATERIALIZED once as a catalog table in setup (the analog of a
  // format's stored change files; computing it by snapshot diff costs
  // the two scans q_dml_cdf prices — after that, refresh cost is
  // O(|changes| + |groups|)). Algebra: SUM/COUNT are self-subtractable,
  // so each changed row contributes (-old, +new) — group MOVES fall out
  // for free (the update below moves rows 'P' → 'F'), inserts add a
  // never-seen group, and a group whose count reaches zero drops.
  // Exactness: contributions are summed in BIGINT money-units (the
  // [[Exact]] pattern) so view0 + delta is bit-identical to a direct
  // recompute — which is precisely what the DuckDB oracle does, so the
  // hash match PROVES refreshed == recomputed.
  private val ivmUnits = "CAST(FLOOR(%s * 1e4 + 0.5) AS BIGINT)"
  private val ivmDiff = """
      SELECT a.o_orderkey AS ka, b.o_orderkey AS kb,
             a.o_orderstatus AS ga, b.o_orderstatus AS gb,
             a.o_totalprice AS pa, b.o_totalprice AS pb
      FROM (SELECT * FROM graft_dml.dml_ivm VERSION AS OF 0) a
      FULL OUTER JOIN (SELECT * FROM graft_dml.dml_ivm) b
        ON a.o_orderkey = b.o_orderkey
      WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
         OR a.o_orderstatus <> b.o_orderstatus
         OR a.o_totalprice <> b.o_totalprice"""
  val qDmlIvm = QDef(
    "q_dml_ivm",
    dmlQ(
      Seq(
        "DROP TABLE IF EXISTS graft_dml.dml_ivm",
        "DROP TABLE IF EXISTS graft_dml.ivm_cdf",
        """CREATE TABLE graft_dml.dml_ivm AS
           SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders""",
        "DELETE FROM graft_dml.dml_ivm WHERE o_orderstatus = 'O' AND o_totalprice < 100000.0",
        """UPDATE graft_dml.dml_ivm SET o_orderstatus = 'F', o_totalprice = o_totalprice + 10.0
           WHERE o_orderstatus = 'P'""",
        """INSERT INTO graft_dml.dml_ivm
           SELECT o_orderkey + 100000000, 'N', o_totalprice FROM orders
           WHERE o_orderstatus = 'F' AND o_totalprice > 400000.0""",
        s"CREATE TABLE graft_dml.ivm_cdf AS $ivmDiff"),
      s"""
      WITH mv0 AS (
        SELECT o_orderstatus AS g, CAST(COUNT(*) AS BIGINT) AS n0,
               CAST(SUM(${ivmUnits.format("o_totalprice")}) AS BIGINT) AS u0
        FROM graft_dml.dml_ivm VERSION AS OF 0 GROUP BY o_orderstatus),
      delta AS (
        SELECT e.g AS g, CAST(SUM(e.dn) AS BIGINT) AS dn,
               CAST(SUM(e.du) AS BIGINT) AS du
        FROM (SELECT explode(filter(array(
                CASE WHEN ka IS NOT NULL THEN named_struct(
                  'g', ga, 'dn', CAST(-1 AS BIGINT),
                  'du', -${ivmUnits.format("pa")}) END,
                CASE WHEN kb IS NOT NULL THEN named_struct(
                  'g', gb, 'dn', CAST(1 AS BIGINT),
                  'du', ${ivmUnits.format("pb")}) END),
              x -> x IS NOT NULL)) AS e
              FROM graft_dml.ivm_cdf) t
        GROUP BY e.g)
      SELECT COALESCE(m.g, d.g) AS o_orderstatus,
             CAST(COALESCE(m.n0, 0) + COALESCE(d.dn, 0) AS BIGINT) AS n,
             CAST(COALESCE(m.u0, 0) + COALESCE(d.du, 0) AS DOUBLE) / 1e4 AS total
      FROM mv0 m FULL OUTER JOIN delta d ON m.g = d.g
      WHERE COALESCE(m.n0, 0) + COALESCE(d.dn, 0) > 0"""),
    Some(s"""
      WITH v1 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 10.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE NOT (o_orderstatus = 'O' AND o_totalprice < 100000.0)
        UNION ALL
        SELECT o_orderkey + 100000000, 'N', o_totalprice FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 400000.0)
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(${ivmUnits.format("o_totalprice")}) AS BIGINT) AS DOUBLE) / 1e4 AS total
      FROM v1 GROUP BY o_orderstatus"""))

  // Holistic aggregates (MIN/MAX) are NOT self-subtractable — a deleted
  // row that held the group minimum invalidates the old value — so the
  // IVM form is DIRTY-GROUP recompute: groups touched by the feed
  // recompute from the latest snapshot (with group-partitioned storage
  // that scan is partition-pruned to the dirty groups), untouched groups
  // pass their old view rows through unread. The downward UPDATE below
  // makes the recompute load-bearing (the old max of '3-MEDIUM' is gone);
  // three of five priority groups stay clean and ride the passthrough.
  val qDmlIvmMinmax = QDef(
    "q_dml_ivm_minmax",
    dmlQ(
      Seq(
        "DROP TABLE IF EXISTS graft_dml.dml_ivmm",
        "DROP TABLE IF EXISTS graft_dml.ivmm_dirty",
        """CREATE TABLE graft_dml.dml_ivmm AS
           SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders""",
        "DELETE FROM graft_dml.dml_ivmm WHERE o_orderpriority = '1-URGENT' AND o_totalprice < 120000.0",
        """UPDATE graft_dml.dml_ivmm SET o_totalprice = o_totalprice * 0.5
           WHERE o_orderpriority = '3-MEDIUM' AND o_totalprice > 300000.0""",
        """CREATE TABLE graft_dml.ivmm_dirty AS
           SELECT DISTINCT g FROM (
             SELECT explode(filter(array(a.o_orderpriority, b.o_orderpriority),
                    x -> x IS NOT NULL)) AS g
             FROM (SELECT * FROM graft_dml.dml_ivmm VERSION AS OF 0) a
             FULL OUTER JOIN (SELECT * FROM graft_dml.dml_ivmm) b
               ON a.o_orderkey = b.o_orderkey
             WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
                OR a.o_totalprice <> b.o_totalprice) t"""),
      """
      WITH mv0 AS (
        SELECT o_orderpriority AS g, MIN(o_totalprice) AS mn,
               MAX(o_totalprice) AS mx, CAST(COUNT(*) AS BIGINT) AS n
        FROM graft_dml.dml_ivmm VERSION AS OF 0 GROUP BY o_orderpriority)
      SELECT o_orderpriority AS g, MIN(o_totalprice) AS mn,
             MAX(o_totalprice) AS mx, CAST(COUNT(*) AS BIGINT) AS n
      FROM graft_dml.dml_ivmm
      WHERE o_orderpriority IN (SELECT g FROM graft_dml.ivmm_dirty)
      GROUP BY o_orderpriority
      UNION ALL
      SELECT g, mn, mx, n FROM mv0
      WHERE g NOT IN (SELECT g FROM graft_dml.ivmm_dirty)"""),
    Some("""
      WITH v1 AS (
        SELECT o_orderkey, o_orderpriority,
               CASE WHEN o_orderpriority = '3-MEDIUM' AND o_totalprice > 300000.0
                    THEN o_totalprice * 0.5 ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE NOT (o_orderpriority = '1-URGENT' AND o_totalprice < 120000.0))
      SELECT o_orderpriority AS g, MIN(o_totalprice) AS mn,
             MAX(o_totalprice) AS mx, CAST(COUNT(*) AS BIGINT) AS n
      FROM v1 GROUP BY o_orderpriority"""))

  def defs: Seq[QDef] = Seq(qDmlDelete, qDmlUpdate, qDmlMerge, qDmlTimetravel,
    qDmlCdf, qDmlIvm, qDmlIvmMinmax)
}
