package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** An in-memory DataSource V2 catalog whose tables accept row-level DML —
  * `DELETE FROM`, `UPDATE`, and `MERGE INTO` — via Spark's group-based
  * copy-on-write rewrite ([[SupportsRowLevelOperations]]).
  *
  * Why this exists (SURVEY §2.13 / COVERAGE "v2-only DML fence"): stock
  * Spark only plans row-level DML against a connector that implements the
  * `RowLevelOperation` contract — the parquet file source and the
  * in-memory session catalog do not (the reference's 2.4 SQL has no MERGE
  * at all). This catalog supplies the missing contract, so the engine's
  * FULL Catalyst DML pipeline is exercised end-to-end: parser →
  * `DeleteFromTable`/`UpdateTable`/`MergeIntoTable` → the
  * `RewriteDeleteFromTable`/`RewriteUpdateTable`/`RewriteMergeIntoTable`
  * analyzer rewrites → `ReplaceData` over the operation's scan → V2 batch
  * write that swaps the rewritten group in one atomic commit.
  *
  * Scale posture (100 TB): the ENGINE-side capability proven here — the
  * rewrite rules, the join shapes they plan (merge = outer join on the ON
  * condition), atomic group replacement — is exactly what Iceberg/Delta
  * plug into; only the storage differs. This catalog keeps one group per
  * table in driver memory (fine for dimension-sized upsert targets, the
  * spec- and oracle-checked use), where a lakehouse format keys groups to
  * data files so a MERGE rewrites only affected files. The group-based
  * `RowLevelOperation` surface is identical in both.
  *
  * Register per session (runtime-settable — catalogs load lazily):
  * `spark.conf.set("spark.sql.catalog.graft_dml", classOf[DmlCatalog].getName)`.
  */
class DmlCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog {
  private var catalogName: String = "graft_dml"
  // Backing store is JVM-shared PER CATALOG NAME, not per instance: Spark
  // instantiates a fresh catalog plugin in every cloned session (notably
  // the per-micro-batch sessions foreachBatch hands out), and a catalog
  // whose tables vanish in a clone is not a catalog — a metastore/lakehouse
  // log is shared state by definition. The streaming CDC-upsert spec
  // (StreamingDmlSpec) fails without this.
  private def tables: ConcurrentHashMap[String, DmlTable] =
    DmlCatalog.stores.computeIfAbsent(catalogName,
      _ => new ConcurrentHashMap[String, DmlTable]())
  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    tables.keySet().asScala.toArray.sorted
      .map(k => Identifier.of(Array.empty[String], k))

  override def loadTable(ident: Identifier): Table =
    Option(tables.get(key(ident)))
      .getOrElse(throw new NoSuchTableException(ident))

  /** Time travel (`VERSION AS OF n`): version n = the table state after
    * its n-th committed write (CTAS population = version 0), served as a
    * read-only snapshot. The version chain lives with the table data —
    * the same snapshot-lineage contract a lakehouse format keeps in its
    * metadata log.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = loadTable(ident).asInstanceOf[DmlTable]
    val v = try version.toInt catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"non-numeric table version '$version'")
    }
    val snap = t.snapshotAt(v).getOrElse(throw new IllegalArgumentException(
      if (t.isExpired(v))
        s"table ${key(ident)} version $v was expired by vacuum (latest ${t.latestVersion})"
      else
        s"table ${key(ident)} has no version $v (versions 0..${t.latestVersion})"))
    new DmlSnapshot(s"${key(ident)}@v$v", t.schema(), snap)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val t = new DmlTable(key(ident), schema)
    if (tables.putIfAbsent(key(ident), t) != null)
      throw new TableAlreadyExistsException(ident)
    t
  }

  /** Schema evolution: ADD COLUMNS (nullable, top-level) — the additive
    * evolution every lakehouse format supports. Existing rows (and every
    * retained snapshot) are migrated with NULL for the new column, so
    * time-travel reads serve the LATEST schema with nulls where history
    * predates the column (the simple uniform-schema policy; Delta-style
    * per-snapshot schemas plug into the same change surface). Everything
    * else (renames, drops, type changes) refuses loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = loadTable(ident).asInstanceOf[DmlTable]
    changes.foreach {
      case add: TableChange.AddColumn if add.fieldNames().length == 1 =>
        require(add.isNullable,
          "ADD COLUMN must be nullable — existing rows have no value for it")
        t.addColumn(add.fieldNames()(0), add.dataType())
      case c => throw new UnsupportedOperationException(
        s"ALTER TABLE change $c not supported (only nullable ADD COLUMN)")
    }
    t
  }

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(key(ident)) != null

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val t = Option(tables.remove(key(from)))
      .getOrElse(throw new NoSuchTableException(from))
    if (tables.putIfAbsent(key(to), t) != null)
      throw new TableAlreadyExistsException(to)
  }

  // ------------------------------------------------- stored procedures
  // Spark 4 DSv2 stored procedures (SPARK-44167): maintenance commands a
  // user invokes as `CALL graft_dml.system.vacuum('t', 2)` — the Iceberg
  // `CALL catalog.system.*` surface. `vacuum` is the retention step that
  // completes the table lifecycle (write → time travel → CDF → expire):
  // it drops all but the newest `keep` version snapshots; expired
  // `VERSION AS OF` reads then refuse loudly while retained ones serve.
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array("system"), "vacuum"))

  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure = {
    val ok = ident.namespace().sameElements(Array("system")) &&
      ident.name().equalsIgnoreCase("vacuum")
    if (!ok) throw new RuntimeException(
      s"procedure ${key(ident)} not found (try system.vacuum)")
    new VacuumProcedure(tables)
  }

  // Minimal namespace surface: a single implicit default namespace, so
  // resolution (USE / qualified names) never trips on metadata lookups.
  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array("default"))
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String], metadata: util.Map[String, String]): Unit = ()
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit = ()
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = false
}

/** `system.vacuum(table, keep)` — the DSv2 stored-procedure form of
  * snapshot retention ([[DmlTable.vacuum]]): invoked through Spark's
  * `CALL` statement, bound by the analyzer (`BindProcedures` coerces and
  * orders arguments, named or positional), and returning a one-row
  * result scan (expired/retained counts) like any maintenance command.
  */
private[sources] class VacuumProcedure(
    tables: ConcurrentHashMap[String, DmlTable])
    extends procedures.UnboundProcedure {
  override def name(): String = "vacuum"
  override def description(): String =
    "expire all but the newest `keep` version snapshots of `table`"

  override def bind(inputType: StructType): procedures.BoundProcedure =
    new procedures.BoundProcedure {
      override def name(): String = VacuumProcedure.this.name()
      override def description(): String = VacuumProcedure.this.description()
      override def isDeterministic: Boolean = false
      override def parameters(): Array[procedures.ProcedureParameter] = Array(
        procedures.ProcedureParameter.in("table", types.StringType).build(),
        procedures.ProcedureParameter.in("keep", types.IntegerType).build())
      override def call(input: InternalRow): util.Iterator[Scan] = {
        val tname = input.getUTF8String(0).toString
        val keep = input.getInt(1)
        require(keep >= 1, s"vacuum keep must be >= 1, got $keep")
        val t = Option(tables.get(tname)).getOrElse(
          throw new RuntimeException(s"vacuum: no such table '$tname'"))
        val (expired, retained) = t.vacuum(keep)
        val out = new StructType()
          .add("expired_versions", types.IntegerType, nullable = false)
          .add("retained_versions", types.IntegerType, nullable = false)
        val row = UnsafeProjection.create(out)(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](expired, retained))).copy()
        // procedure output must be a LocalScan in Spark 4.1 (the result is
        // driver-sized by definition — counts, not data)
        val result = new org.apache.spark.sql.connector.read.LocalScan {
          override def readSchema(): StructType = out
          override def rows(): Array[InternalRow] = Array(row)
        }
        util.List.of[Scan](result).iterator()
      }
    }
}

object DmlCatalog {
  /** Per-catalog-name table stores — the in-memory analog of the shared
    * metastore/metadata log every real catalog plugin fronts. See the
    * note on `DmlCatalog.tables`.
    */
  private val stores =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, DmlTable]]()
}

/** One DML-capable table: full-schema rows held as an immutable snapshot
  * array (UnsafeRow — compact and serializable, so scan partitions ship
  * slices straight into tasks). Every write installs a new snapshot
  * atomically at commit; readers that already planned keep their snapshot
  * (snapshot isolation, the same model as a lakehouse table version).
  */
private[graft] class DmlTable(tableName: String, initialSchema: StructType)
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  @volatile private var tableSchema: StructType = initialSchema

  @volatile private[sources] var rows: Array[InternalRow] = Array.empty
  /** Snapshot per committed write, for `VERSION AS OF` (index = version). */
  private val history = new util.concurrent.CopyOnWriteArrayList[Array[InternalRow]]()
  /** Observability for specs: row-level commands this table executed. */
  private[graft] val opsSeen = new util.concurrent.CopyOnWriteArrayList[String]()

  private[sources] def recordVersion(): Unit = history.add(rows)
  private[sources] def snapshotAt(v: Int): Option[Array[InternalRow]] =
    if (v >= 0 && v < history.size) Option(history.get(v)) else None
  private[sources] def isExpired(v: Int): Boolean =
    v >= 0 && v < history.size && history.get(v) == null
  private[sources] def latestVersion: Int = history.size - 1

  /** Additive schema evolution: widen the schema by one nullable column
    * and migrate current rows + every retained snapshot (NULL-filled).
    * Snapshot arrays can be SHARED between `rows` and history entries —
    * the identity map migrates each distinct array exactly once so the
    * sharing (and memory shape) survives evolution.
    */
  private[sources] def addColumn(
      colName: String, dt: org.apache.spark.sql.types.DataType): Unit =
    synchronized {
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
      val old = tableSchema
      val proj = UnsafeProjection.create(
        old.fields.zipWithIndex.map { case (f, i) =>
          BoundReference(i, f.dataType, f.nullable): org.apache.spark.sql.catalyst.expressions.Expression
        }.toIndexedSeq :+ (Literal(null, dt): org.apache.spark.sql.catalyst.expressions.Expression))
      val seen = new util.IdentityHashMap[Array[InternalRow], Array[InternalRow]]()
      def migrate(a: Array[InternalRow]): Array[InternalRow] =
        if (a == null) null
        else Option(seen.get(a)).getOrElse {
          val m = a.map(r => proj(r).copy(): InternalRow)
          seen.put(a, m); m
        }
      rows = migrate(rows)
      for (i <- 0 until history.size) history.set(i, migrate(history.get(i)))
      tableSchema = old.add(colName, dt, nullable = true)
    }

  /** Retention: expire every snapshot but the newest `keep` (version
    * NUMBERS are stable — expired slots tombstone to null so later
    * versions keep their index, exactly like a lakehouse metadata log
    * that deletes old snapshot files but never renumbers). Returns
    * (expired-this-call, still-retained).
    */
  private[sources] def vacuum(keep: Int): (Int, Int) = synchronized {
    val cutoff = math.max(0, history.size - keep)
    var expired = 0
    for (i <- 0 until cutoff if history.get(i) != null) {
      history.set(i, null); expired += 1
    }
    (expired, history.size - cutoff)
  }

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new DmlScan(tableSchema, rows)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DmlWriteBuilder(this, info.schema(), replaceAll = false)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      // The operation reads the group being rewritten (here: the whole
      // table — one group) ...
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
        opsSeen.add(info.command().toString)
        () => new DmlScan(tableSchema, rows)
      }
      // ... and its write REPLACES that group with the surviving rows the
      // rewrite computed (copy-on-write). See DmlWriterFactory for how the
      // ReplaceData stream's __row_operation marker is consumed.
      override def newWriteBuilder(info2: LogicalWriteInfo): WriteBuilder =
        new DmlWriteBuilder(DmlTable.this, info2.schema(), replaceAll = true)
    }
}

/** Scan over a fixed snapshot, sliced for parallel read. */
private[sources] class DmlScan(schema: StructType, snapshot: Array[InternalRow])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val slices = math.min(4, math.max(1, snapshot.length))
    (0 until slices).map { i =>
      val from = snapshot.length.toLong * i / slices
      val until = snapshot.length.toLong * (i + 1) / slices
      DmlSlice(snapshot.slice(from.toInt, until.toInt)): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rs = partition.asInstanceOf[DmlSlice].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rs.length }
        override def get(): InternalRow = rs(i)
        override def close(): Unit = ()
      }
    }
}

private[sources] case class DmlSlice(rows: Array[InternalRow]) extends InputPartition

/** A read-only historical version of a [[DmlTable]] (`VERSION AS OF`). */
private[sources] class DmlSnapshot(
    snapName: String, snapSchema: StructType, snap: Array[InternalRow])
    extends Table with SupportsRead {
  override def name(): String = snapName
  override def schema(): StructType = snapSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new DmlScan(snapSchema, snap)
}

private[sources] case class DmlCommit(rows: Array[InternalRow]) extends WriterCommitMessage

/** Append by default; `replaceAll` for copy-on-write group replacement;
  * `truncate()` upgrades an append to an overwrite (INSERT OVERWRITE).
  */
private[sources] class DmlWriteBuilder(
    table: DmlTable, writeSchema: StructType, replaceAll: Boolean)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new DmlWriterFactory(writeSchema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val incoming = messages.collect { case DmlCommit(rs) => rs }.flatten
        table.synchronized {
          table.rows =
            if (replaceAll || truncateFirst) incoming
            else table.rows ++ incoming
          table.recordVersion()
        }
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

/** Copies incoming rows into compact serializable UnsafeRows.
  *
  * Row-level (ReplaceData) streams arrive UNprojected when the operation
  * declares no required metadata attributes: Spark's plain
  * `DataWritingSparkTask` hands the writer the full query-output row — a
  * leading `__row_operation` INT marker, then the data columns
  * (`LogicalWriteInfo.schema()` still reports only the data columns). The
  * marker is detected by arity (numFields == schema+1), validated to be a
  * write flavor (5=WRITE, 6=WRITE_WITH_METADATA — deleted rows never
  * reach a ReplaceData stream), and dropped; plain appends project 1:1.
  */
private[sources] class DmlWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      private def proj(offset: Int) = UnsafeProjection.create(
        schema.fields.zipWithIndex.map { case (f, i) =>
          BoundReference(i + offset, f.dataType, f.nullable)
        }.toIndexedSeq)
      private lazy val dataProj = proj(0)
      private lazy val markedProj = proj(1)
      private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      override def write(record: InternalRow): Unit =
        if (record.numFields == schema.length + 1) {
          val op = record.getInt(0)
          require(op == 5 || op == 6, s"unexpected __row_operation marker $op")
          buf += markedProj(record).copy()
        } else buf += dataProj(record).copy()
      override def commit(): WriterCommitMessage = DmlCommit(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
