package graft.catalog

import java.util.Collections
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, GraftCatalogBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.GraftTable

/** SQL catalog over a directory of graft tables — the DDL/DML front door
  * the reference leaves to its destinations (BigQuery datasets, ClickHouse
  * databases; reference crates/etl-destinations/src/bigquery/core.rs
  * table management, clickhouse/sql.rs DDL):
  *
  *   spark.sql.catalog.graft       = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.root  = /warehouse
  *
  *   CREATE NAMESPACE graft.cdc;
  *   CREATE TABLE graft.cdc.users (id BIGINT, name STRING)
  *     PARTITIONED BY (bucket(32, id));      -- bucket spec = table identity
  *   INSERT INTO graft.cdc.users VALUES ...; -- append (new snapshot)
  *   INSERT OVERWRITE graft.cdc.users ...;   -- full reload
  *   ALTER TABLE graft.cdc.users ADD COLUMN age INT;
  *   SELECT * FROM graft.cdc.users WHERE id = 7;
  *
  * The same directories remain plain [[GraftTable]]s: the CDC sinks merge
  * into them, the `graft_table(...)` TVFs time-travel them, and this
  * catalog reads the SAME manifest snapshot — one storage layer, three
  * fronts (programmatic, TVF, catalog).
  *
  * Scale notes: scans delegate to Spark's native parquet DSv2 table over
  * the manifest's live file list, so filter/column pushdown, row-group
  * skipping (files are key-sorted per bucket) and vectorized reading all
  * apply; the manifest replaces file listing (O(1) driver planning, no
  * directory sweeps). Writes go through the manifest commit protocol —
  * append publishes one new snapshot, concurrent committers resolve via
  * the optimistic-concurrency manifest publish.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root=<dir>"))
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier) =
    Paths.get(root, ident.namespace() :+ ident.name(): _*)
  private def isTableDir(p: java.nio.file.Path) =
    Files.exists(p.resolve("_meta.json"))

  // -------------------------------------------------------------- tables
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get(root, namespace: _*)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(
      (catalogName +: namespace).toSeq)
    val st = Files.list(dir)
    val subdirs = try st.iterator().asScala.toVector finally st.close()
    subdirs.filter(p => Files.isDirectory(p) && isTableDir(p))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftSqlTable(GraftTable.open(dirOf(ident).toString),
      (catalogName +: (ident.namespace() :+ ident.name())).mkString("."))
  }

  /** Time travel: `SELECT ... FROM t VERSION AS OF 3` pins the scan to
    * snapshot 3's manifest (readable until vacuum expiry). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val t = GraftTable.open(dirOf(ident).toString)
    val v = version.toLong
    require(t.versions.contains(v),
      s"version $v of ${ident.name()} is not retained " +
        s"(available: ${t.versions.mkString(",")})")
    new GraftSqlTable(t,
      (catalogName +: (ident.namespace() :+ ident.name())).mkString(".") +
        s"@v$v", pinnedVersion = Some(v))
  }

  /** `TIMESTAMP AS OF`: resolves to the last snapshot committed at or
    * before the timestamp (manifest mtime = commit time). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val t = GraftTable.open(dirOf(ident).toString)
    val v = t.versionAsOfTimestamp(timestampMicros / 1000L).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot of ${ident.name()} at or before " +
          s"timestamp $timestampMicros"))
    loadTable(ident, v.toString)
  }

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    if (tableExists(ident))
      throw new TableAlreadyExistsException(ident)
    val schema = GraftCatalogBridge.v2ColumnsToStructType(info.columns())
    // identity from the bucket transform (PARTITIONED BY (bucket(n, keys)))
    // or the "keys"/"buckets" table properties; default = first column
    val (keys, buckets) = info.partitions().toSeq match {
      case Seq(t) if GraftCatalogBridge.asBucket(t).nonEmpty =>
        GraftCatalogBridge.asBucket(t).get
      case Seq() =>
        val keys = Option(info.properties().get("keys"))
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq(schema.fieldNames.head))
        val buckets = Option(info.properties().get("buckets"))
          .map(_.trim.toInt).getOrElse(32)
        (keys, buckets)
      case other => throw new UnsupportedOperationException(
        s"graft tables support only bucket(n, cols) partitioning, got: " +
          other.map(_.describe()).mkString(", "))
    }
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"bucket key $k is not a column of the table"))
    GraftTable.create(dirOf(ident).toString, schema, keys, buckets)
    loadTable(ident)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    createTable(ident, new TableInfo.Builder()
      .withColumns(GraftCatalogBridge.structTypeToV2Columns(schema))
      .withPartitions(partitions).withProperties(properties).build())

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val t = GraftTable.open(dirOf(ident).toString)
    changes.foreach {
      case _: TableChange.AddColumn | _: TableChange.DeleteColumn |
           _: TableChange.RenameColumn | _: TableChange.UpdateColumnType => ()
      case c => throw new UnsupportedOperationException(
        s"graft catalog cannot apply ${c.getClass.getSimpleName}")
    }
    changes.collect { case r: TableChange.RenameColumn => r }.foreach { r =>
      require(!t.keyCols.contains(r.fieldNames().mkString(".")),
        s"cannot rename bucket key ${r.fieldNames().mkString(".")}")
    }
    changes.collect { case d: TableChange.DeleteColumn => d }.foreach { d =>
      require(!t.keyCols.contains(d.fieldNames().mkString(".")),
        s"cannot drop bucket key ${d.fieldNames().mkString(".")}")
    }
    t.evolveSchema(cur =>
      GraftCatalogBridge.applySchemaChanges(cur, changes.toSeq))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) return false
    val st = Files.walk(dir)
    val all = try st.iterator().asScala.toVector finally st.close()
    all.reverse.foreach(Files.deleteIfExists(_))
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(dirOf(newIdent).getParent)
    Files.move(dirOf(oldIdent), dirOf(newIdent), StandardCopyOption.ATOMIC_MOVE)
  }

  // ---------------------------------------------------------- namespaces
  override def listNamespaces(): Array[Array[String]] = {
    val st = Files.list(Paths.get(root))
    val subdirs = try st.iterator().asScala.toVector finally st.close()
    subdirs.filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => Array(p.getFileName.toString)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = Paths.get(root, namespace: _*)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(
      (catalogName +: namespace).toSeq)
    val st = Files.list(dir)
    val subdirs = try st.iterator().asScala.toVector finally st.close()
    subdirs.filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => namespace :+ p.getFileName.toString).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (Files.isDirectory(Paths.get(root, namespace: _*)) &&
        !isTableDir(Paths.get(root, namespace: _*)))

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      (catalogName +: namespace).toSeq)
    Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    Files.createDirectories(Paths.get(root, namespace: _*))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val dir = Paths.get(root, namespace: _*)
    if (!Files.isDirectory(dir)) return false
    if (!cascade) {
      val st = Files.list(dir)
      val empty = try !st.iterator().hasNext finally st.close()
      require(empty, s"namespace ${namespace.mkString(".")} is not empty")
    }
    val st = Files.walk(dir)
    val all = try st.iterator().asScala.toVector finally st.close()
    all.reverse.foreach(Files.deleteIfExists(_))
    true
  }
}

/** DSv2 face of one [[GraftTable]]: reads delegate to Spark's native
  * parquet table over the CURRENT manifest's live files (vectorized scan,
  * filter/column pushdown, row-group skipping on the key-sorted files);
  * writes go through the V1 fallback into the manifest commit protocol
  * (INSERT INTO → append snapshot, INSERT OVERWRITE/TRUNCATE → reload).
  */
final class GraftSqlTable(val table: GraftTable, fullName: String,
    pinnedVersion: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations {
  import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
  import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable

  override def name(): String = fullName

  override def schema(): StructType =
    pinnedVersion.map(v => table.schemaOf(v).getOrElse(new StructType()))
      .getOrElse(table.currentSchema.getOrElse(new StructType()))

  private def liveFiles: Seq[String] =
    pinnedVersion.map(table.filesOf).getOrElse(table.currentFiles)

  override def partitioning(): Array[Transform] =
    Array(Expressions.bucket(table.nBuckets, table.keyCols: _*))

  override def properties(): java.util.Map[String, String] =
    Map("keys" -> table.keyCols.mkString(","),
      "buckets" -> table.nBuckets.toString,
      "provider" -> "graft").asJava

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    // recursiveFileLookup: the file list is explicit leaf files — disable
    // partition discovery so the physical _bucket=N layout stays internal
    val opts = new CaseInsensitiveStringMap(
      (options.asScala ++ Map("recursiveFileLookup" -> "true")).asJava)
    ParquetTable(fullName, spark, opts, liveFiles,
      Some(schema()), classOf[ParquetFileFormat]).newScanBuilder(opts)
  }

  /** V1 source Filter → Column, for the subset SQL DELETE pushes down.
    * None = untranslatable → canDeleteWhere refuses and Spark reports
    * the condition as too complex (the row-level-operation API is the
    * escape hatch, not silent partial deletes). */
  private def toCondition(f: sources.Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, not}
    f match {
      case sources.EqualTo(a, v) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) => Some(col(a).contains(v))
      case sources.And(l, r) =>
        for (a <- toCondition(l); b <- toCondition(r)) yield a && b
      case sources.Or(l, r) =>
        for (a <- toCondition(l); b <- toCondition(r)) yield a || b
      case sources.Not(c) => toCondition(c).map(not)
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    pinnedVersion.isEmpty && filters.forall(toCondition(_).nonEmpty)

  /** SQL `DELETE FROM t WHERE …`: bucket-pruned copy-on-write rewrite
    * (only buckets holding matching rows are touched — the DuckLake
    * `DELETE … WHERE pred` shape, reference ducklake/batches.rs). */
  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    import org.apache.spark.sql.functions.lit
    require(pinnedVersion.isEmpty,
      s"$fullName is a time-travel snapshot — deletes go to the current table")
    val cond = filters.flatMap(toCondition)
      .reduceOption(_ && _).getOrElse(lit(true))
    table.deleteWhere(SparkSession.active, cond)
  }

  /** SQL `UPDATE` / `MERGE INTO` via group-based (copy-on-write)
    * row-level operations: Spark's rewrite rules read the table through
    * the operation's scan, apply the edits, and hand the COMPLETE
    * replacement contents to the operation's write. The scan is the same
    * native parquet delegation as normal reads; the write stages the
    * replacement as plain parquet via Spark's own parquet BatchWrite
    * (executor-side, fully distributed), and commit() re-buckets the
    * staged contents into one snapshot with [[GraftTable.replaceAll]] —
    * the replay high-water mark survives, the swap is manifest-atomic,
    * and an abort just deletes the staging dir. (DELETE prefers the
    * bucket-pruned SupportsDelete path; this is its full-rewrite
    * fallback and the only path for UPDATE/MERGE.) */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory,
      PhysicalWriteInfo, RowLevelOperation, WriterCommitMessage}
    require(pinnedVersion.isEmpty,
      s"$fullName is a time-travel snapshot — row-level ops target the current table")
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()

      /** Whole table = one replacement group. The scan must NOT accept
        * data-filter pushdown: Spark pushes the command's condition into
        * a pushdown-capable row-level scan, and a parquet scan drops
        * non-matching ROWS — the write would then replace the table with
        * matches only. A plain build()-only ScanBuilder keeps every row
        * flowing; the rewrite plan's conditional projection applies the
        * edits. */
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
        val inner = GraftSqlTable.this.newScanBuilder(options)
        new ScanBuilder {
          override def build(): org.apache.spark.sql.connector.read.Scan =
            inner.build()
        }
      }

      override def newWriteBuilder(w: LogicalWriteInfo): WriteBuilder = {
        val spark = SparkSession.active
        val staging = s"${table.root}/.rowlevel-${java.util.UUID.randomUUID()}"
        val stagingOpts = new CaseInsensitiveStringMap(
          Map("path" -> staging).asJava)
        // Spark 4 prepends a __row_operation INT column to group-based
        // replacement rows (RowDeltaUtils.OPERATION_COLUMN) without
        // widening LogicalWriteInfo.schema; the staging schema carries
        // it explicitly and commit() strips it (dropping DELETE-marked
        // rows — group-based plans emit survivors only, so that filter
        // is defense in depth).
        val opCol = org.apache.spark.sql.catalyst.util.RowDeltaUtils
          .OPERATION_COLUMN
        val extSchema = StructType(
          org.apache.spark.sql.types.StructField(opCol,
            org.apache.spark.sql.types.IntegerType, nullable = false) +:
            w.schema().fields)
        val extInfo = new LogicalWriteInfo {
          override def options(): CaseInsensitiveStringMap = w.options()
          override def queryId(): String = w.queryId()
          override def schema(): StructType = extSchema
          override def rowIdSchema(): java.util.Optional[StructType] =
            w.rowIdSchema()
          override def metadataSchema(): java.util.Optional[StructType] =
            w.metadataSchema()
        }
        val delegate = ParquetTable(s"$fullName-staging", spark, stagingOpts,
          Seq(staging), Some(extSchema), classOf[ParquetFileFormat])
          .newWriteBuilder(extInfo).build().toBatch
        def dropStaging(): Unit = {
          val p = Paths.get(staging)
          if (Files.exists(p)) {
            val st = Files.walk(p)
            val all = try st.iterator().asScala.toVector finally st.close()
            all.reverse.foreach(Files.deleteIfExists(_))
          }
        }
        new WriteBuilder {
          override def build(): Write = new Write {
            override def toBatch: BatchWrite = new BatchWrite {
              // the Hadoop commit protocol does its own task-commit
              // arbitration; double coordination (wrapper default true +
              // committer) deadlocks into CommitDenied on every attempt
              override def useCommitCoordinator(): Boolean =
                delegate.useCommitCoordinator()
              override def createBatchWriterFactory(
                  pi: PhysicalWriteInfo): DataWriterFactory =
                delegate.createBatchWriterFactory(pi)
              override def commit(msgs: Array[WriterCommitMessage]): Unit = {
                delegate.commit(msgs) // staged parquet now complete
                try {
                  import org.apache.spark.sql.functions.{col, lit}
                  table.replaceAll(
                    spark.read.schema(extSchema).parquet(staging)
                      .filter(col(opCol) =!= lit(
                        org.apache.spark.sql.catalyst.util.RowDeltaUtils
                          .DELETE_OPERATION))
                      .drop(opCol))
                } finally dropStaging()
              }
              override def abort(msgs: Array[WriterCommitMessage]): Unit = {
                try delegate.abort(msgs) finally dropStaging()
              }
            }
          }
        }
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"$fullName is a time-travel snapshot — writes go to the current table")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ov: Boolean): Unit =
              if (overwrite || ov) table.overwrite(data)
              else table.append(data)
          }
      }
    }
  }
}
