package graft.catalog

import java.util.Collections
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{GraftCatalogBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, Write, WriteBuilder}
import org.apache.spark.sql.sources
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
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with ProcedureCatalog {
  private var catalogName: String = _
  private var root: String = _

  // ---------------------------------------------------------- procedures
  /** Maintenance as SQL stored procedures under `system` — see
    * [[GraftProcedures]] (lease-gated compact / merge_adjacent_files /
    * collapse_layers / vacuum / rebucket / zorder). */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftProcedures.names.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    (if (ident.namespace().sameElements(Array("system")))
       GraftProcedures.load(ident.name(), root)
     else None).getOrElse(throw new RuntimeException(
      s"procedure not found: $catalogName.${ident.namespace()
        .mkString(".")}.${ident.name()}"))

  // ----------------------------------------------------------- functions
  /** The one catalog function: `bucket` — resolved by Spark's SPJ
    * machinery (V2ExpressionUtils.loadV2FunctionOpt looks it up under
    * the EMPTY namespace) when matching two scans' reported
    * `bucket(n, keys)` transforms, and evaluated only if a non-aligned
    * side must be shuffled to match. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      Array(Identifier.of(Array.empty[String], "bucket"))
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(
      (catalogName +: namespace.toSeq))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().isEmpty && ident.name() == "bucket")
      org.apache.spark.sql.GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

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
    if (!tableExists(ident)) {
      // metadata tables (Iceberg shape): `db.t.snapshots` arrives as
      // Identifier(["db","t"], "snapshots") — serve it when the PARENT
      // is a real table and the trailing name is a known meta view
      val ns = ident.namespace()
      if (ns.nonEmpty && GraftMetaTables.Names(ident.name())) {
        val parent = Identifier.of(ns.dropRight(1), ns.last)
        if (tableExists(parent))
          return GraftMetaTables(
            GraftTable.open(dirOf(parent).toString), ident.name(),
            (catalogName +: (ns :+ ident.name())).mkString("."))
      }
      throw new NoSuchTableException(ident)
    }
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
    // optional extra data-skipping stats columns (leading key is always
    // harvested): TBLPROPERTIES ('stats.cols' = 'ts,other')
    val statsCols = Option(info.properties().get("stats.cols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    statsCols.foreach(c => require(schema.fieldNames.contains(c),
      s"stats.cols entry $c is not a column of the table"))
    GraftTable.create(dirOf(ident).toString, schema, keys, buckets,
      statsCols)
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
    val hasData = t.currentFiles.nonEmpty
    changes.collect { case r: TableChange.RenameColumn => r }.foreach { r =>
      // bucket keys rename like any column (zero-movement mapping
      // commit; routing hashes VALUES and `_meta.json` keeps physical
      // names that GraftTable.open translates) — only DROP and RETYPE
      // of a key stay refused below.
      // with data, renames go through the manifest's Delta-style name
      // mapping (GraftTable.renameColumn) — top-level columns only
      require(!hasData || r.fieldNames().length == 1,
        s"cannot rename nested field ${r.fieldNames().mkString(".")} on a " +
          "table with data (name mapping covers top-level columns)")
    }
    changes.collect { case a: TableChange.AddColumn => a }.foreach { a =>
      // a new column's on-disk name is its logical name: refuse names an
      // EXISTING column still uses on disk (its pre-rename identity) —
      // old files would leak that column's values into the new one
      val name = a.fieldNames().mkString(".")
      val mapping = t.columnMapping
      val logical = t.currentSchema.map(_.fieldNames.toSet).getOrElse(Set.empty)
      // on-disk names in use: the live schema's physical names PLUS every
      // mapping target — a DROPPED renamed column leaves the schema but
      // its physical name stays occupied in old files (the mapping entry
      // is the durable marker), and re-adding it would resurrect that
      // column's stored values
      val physInUse = t.currentSchema
        .map(_.fieldNames.iterator.map(n => mapping.getOrElse(n, n)).toSet)
        .getOrElse(Set.empty) ++ mapping.values
      require(!physInUse.contains(name) || logical.contains(name),
        s"cannot add column $name: a renamed column is (or was) stored as " +
          s"'$name' on disk")
    }
    changes.collect { case d: TableChange.DeleteColumn => d }.foreach { d =>
      require(!t.keyCols.contains(d.fieldNames().mkString(".")),
        s"cannot drop bucket key ${d.fieldNames().mkString(".")}")
    }
    changes.collect { case u: TableChange.UpdateColumnType => u }.foreach { u =>
      // hash(5:INT) != hash(5L:BIGINT): retyping a bucket key re-routes
      // every existing key to a different bucket, breaking merge/DELETE
      // pruning — same class of hazard as renaming/dropping a key
      require(!t.keyCols.contains(u.fieldNames().mkString(".")),
        s"cannot change the type of bucket key ${u.fieldNames().mkString(".")}" +
          " (bucket routing is type-sensitive)")
      // with data, only WIDENING casts: existing files keep the old
      // physical type, and the vectorized reader fails outright on a
      // narrowing read schema (the table would become unreadable)
      val name = u.fieldNames().mkString(".")
      t.currentSchema.flatMap(_.fields.find(_.name == name)).foreach { f =>
        require(!hasData ||
          org.apache.spark.sql.catalyst.expressions.Cast
            .canUpCast(f.dataType, u.newDataType()),
          s"cannot change $name from ${f.dataType.simpleString} to " +
            s"${u.newDataType().simpleString} on a table with data: " +
            "existing files keep the old type and only widening " +
            "(up-cast) reads are safe")
      }
    }
    // delegate through the IDEMPOTENT DDL planner
    // (GraftTable.applyDdlPlan — the reference's interrupted-schema-
    // change recovery analog): the target schema is computed TOLERANTLY
    // over the current one, so re-running this exact alterTable against
    // a table a previous run left half-altered (rename committed, the
    // evolve not) skips the already-applied steps and converges. SQL
    // statements stay strict — Spark's analyzer validates each change
    // against the loaded schema before this method runs; the tolerance
    // surfaces only for programmatic/recovery replays.
    val renameMap = changes.collect {
      case r: TableChange.RenameColumn => r.fieldNames()(0) -> r.newName()
    }.toMap
    val cur = t.currentSchema.getOrElse(new org.apache.spark.sql.types
      .StructType())
    val afterRenames = org.apache.spark.sql.types.StructType(
      cur.fields.map(f => renameMap.get(f.name)
        .fold(f)(to => f.copy(name = to))))
    val target = changes.filterNot(_.isInstanceOf[TableChange.RenameColumn])
      .foldLeft(afterRenames) { (s, c) => c match {
        case a: TableChange.AddColumn
            if s.fieldNames.contains(a.fieldNames().mkString(".")) => s
        case d: TableChange.DeleteColumn
            if !s.fieldNames.contains(d.fieldNames().mkString(".")) => s
        case other =>
          GraftCatalogBridge.applySchemaChanges(s, Seq(other))
      }}
    t.applyDdlPlan(target, renameMap)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) return false
    graft.core.Fs.deleteRecursively(dir)
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
    // a table dir is not a namespace (mirrors namespaceExists): without
    // this, DROP NAMESPACE … CASCADE aimed at a table path would delete
    // the table while reporting a namespace drop
    if (isTableDir(dir)) throw new NoSuchNamespaceException(
      (catalogName +: namespace).toSeq)
    if (!cascade) {
      val st = Files.list(dir)
      val empty = try !st.iterator().hasNext finally st.close()
      require(empty, s"namespace ${namespace.mkString(".")} is not empty")
    }
    graft.core.Fs.deleteRecursively(dir)
    true
  }
}

/** DSv2 face of one [[GraftTable]]: reads delegate to Spark's native
  * parquet table over the CURRENT manifest's live files (vectorized scan,
  * filter/column pushdown, row-group skipping on the key-sorted files);
  * writes go through the V1 fallback into the manifest commit protocol
  * (INSERT INTO → append snapshot, INSERT OVERWRITE/TRUNCATE → reload).
  *
  * The physical `_bucket=N` layout is surfaced as a `_bucket` PARTITION
  * column on the parquet delegation (hidden from `SELECT *` — the table
  * schema stays data-only; it is a [[SupportsMetadataColumns metadata
  * column]]). That makes `_bucket` the row-level-operation GROUP id:
  * Spark's `RowLevelOperationRuntimeGroupFiltering` sees a scan whose
  * runtime filter attribute is `_bucket`, computes the matching groups
  * with a dynamic-pruning subquery (works for UPDATE's static WHERE *and*
  * MERGE's join condition), prunes the scan to those buckets, and the
  * commit replaces exactly the scanned buckets via
  * [[GraftTable.replaceBuckets]] — a single-row UPDATE rewrites one
  * bucket, not 100 TB. */
final class GraftSqlTable(val table: GraftTable, fullName: String,
    pinnedVersion: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns {
  import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
  import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable

  override def name(): String = fullName

  override def schema(): StructType =
    pinnedVersion.map(v => table.schemaOf(v).getOrElse(new StructType()))
      .getOrElse(table.currentSchema.getOrElse(new StructType()))

  private def liveFiles: Seq[String] = {
    // the catalog plans RAW parquet scans over the manifest file list —
    // that cannot express the merge-on-read layer fold (upserts would
    // duplicate base rows, key-only delete files would read as data).
    // Catalog-owned tables never grow layers (every catalog write path
    // is copy-on-write), so this only trips for an externally
    // maintained MoR table registered here — refuse loudly instead of
    // returning silently wrong rows.
    val layered = pinnedVersion
      .map(v => table.readManifest(v).layers.nonEmpty)
      .getOrElse(table.hasLayers)
    if (layered) throw new IllegalStateException(
      s"$fullName has merge-on-read delta layers: collapseLayers (or " +
        "compact) before SQL-catalog scans, or query it through the " +
        "graft_table('<root>') TVF, which folds layers")
    pinnedVersion.map(table.filesOf).getOrElse(table.currentFiles)
  }

  /** Genuine renames (logical → physical) in force at this snapshot,
    * restricted to visible columns — empty for never-renamed tables, so
    * the common case takes the unwrapped scan path. */
  private def scanMapping: Map[String, String] = {
    val m = pinnedVersion.map(table.mappingOf).getOrElse(table.columnMapping)
    if (m.isEmpty) m
    else {
      val visible = schema().fieldNames.toSet
      m.filter { case (l, p) => l != p && visible(l) }
    }
  }

  /** The schema the parquet files actually carry (renamed columns under
    * their on-disk names). */
  private def physicalSchema(mapping: Map[String, String]): StructType =
    StructType(schema().fields.map(f =>
      f.copy(name = mapping.getOrElse(f.name, f.name))))

  override def partitioning(): Array[Transform] =
    Array(Expressions.bucket(table.currentNBuckets, table.keyCols: _*))

  /** The bucket count the SCANNED snapshot was laid out with (a pinned
    * pre-rebucket snapshot hashes bucket(oldN, keys)) — what the SPJ
    * partitioning claim reports, and what [[graft.plans
    * .GraftSpjInjectRule]] compares across join sides before injecting
    * the implied `_bucket` equality. */
  def spjBucketCount: Int =
    pinnedVersion.map(table.nBucketsOf).getOrElse(table.currentNBuckets)

  /** The columns the bucket hash runs over (`bucketCols` ⊆ keys — a
    * proper subset for secondary-index tables). */
  def spjBucketCols: Seq[String] = table.bucketCols

  override def properties(): java.util.Map[String, String] = {
    val extra = table.statsCols.drop(1)
    // live snapshot facts beside the identity: DESCRIBE EXTENDED shows
    // the current version, replay mark and outstanding MoR layer count
    // without any data access (driver-side manifest read)
    val snap = table.currentVersion.map { v =>
      val m = table.readManifest(v)
      Map("current.version" -> v.toString,
        "high.water" -> m.highWater,
        "layers" -> m.layers.size.toString)
    }.getOrElse(Map.empty)
    (Map("keys" -> table.keyCols.mkString(","),
      "buckets" -> table.currentNBuckets.toString,
      "provider" -> "graft") ++ snap ++
      (if (extra.isEmpty) Map.empty
       else Map("stats.cols" -> extra.mkString(",")))).asJava
  }

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  /** `_bucket` (INT): the storage-group id of a row. An empty table has
    * no files to infer the partition column from, so it exposes none —
    * [[requiredMetadataAttributes]] mirrors this. */
  override def metadataColumns(): Array[MetadataColumn] =
    if (liveFiles.isEmpty) Array.empty
    else Array(GraftSqlTable.BucketColumn)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    // basePath: the explicit leaf-file list is partition-discovered
    // against the data dir, so `_bucket=N` becomes a partition column.
    // Normal reads never see it (column pruning drops it unless the
    // metadata column is referenced); row-level operations use it as the
    // replacement-group id and get partition-pruned scans for free.
    val files = liveFiles
    val extra = // empty file list: nothing to partition-discover against
      if (files.isEmpty) Map("recursiveFileLookup" -> "true")
      else Map("basePath" -> s"${table.root}/data")
    val opts = new CaseInsensitiveStringMap(
      (options.asScala ++ extra).asJava)
    val mapping = scanMapping
    def mk(fs: Seq[String]): ScanBuilder =
      org.apache.spark.sql.GraftScanBridge.mappedBuilder(
        ParquetTable(fullName, spark, opts, fs,
          Some(physicalSchema(mapping)), classOf[ParquetFileFormat])
          .newScanBuilder(opts), mapping)
    // manifest-level data skipping: when the scan carries range
    // predicates over any stats column, drop whole files before planning
    // (the row-group stats inside surviving files still apply on top)
    val stats = table.currentFileStats
    val strStats = table.currentFileStrStats
    val built =
      if ((stats.nonEmpty || strStats.nonEmpty) && files.nonEmpty)
        new org.apache.spark.sql.GraftFileSkippingBuilder(mk, files,
          stats.get _, strStats.get _)
      else mk(files)
    // storage-partitioned joins: report bucket(n, bucketCols) key-grouped
    // partitioning (one input partition per live bucket) so equi-joins of
    // co-bucketed graft tables plan WITHOUT a shuffle on either side
    // (needs spark.sql.sources.v2.bucketing.enabled=true). Empty tables
    // skip the report — zero partitions carry no co-location to exploit.
    // When every scanned bucket holds ≤1 file (the compacted steady
    // state) the scan also reports per-partition key ordering, letting
    // the SPJ sort-merge join drop its sorts
    // (spark.sql.sources.v2.bucketing.sorting.enabled).
    if (files.isEmpty) built
    else {
      val byBucket = pinnedVersion.map(v => table.readManifest(v).files)
        .getOrElse(table.currentFilesByBucket)
      // ordering = the writer's file sort (the FULL key list); only
      // valid when each bucket is one file — multi-file buckets
      // concatenate sorted runs, which is not sorted
      val sortCols =
        if (byBucket.valuesIterator.forall(_.size <= 1)) table.keyCols
        else Nil
      // the REPORTED bucket count must be the one the scanned files
      // were laid out with: a pinned pre-rebucket snapshot hashes
      // bucket(oldN, keys) — claiming currentNBuckets over it would let
      // SPJ match partition values across incompatible layouts and
      // silently drop join rows
      val nb = pinnedVersion.map(table.nBucketsOf)
        .getOrElse(table.currentNBuckets)
      org.apache.spark.sql.GraftBucketedScan.builder(built,
        nb, table.bucketCols, sortCols)
    }
  }

  /** Plan a fresh (unpruned-columns) scan over only `buckets`' live
    * files, for the runtime group filter. None = those buckets hold no
    * files (the caller plans an empty scan instead — zero files cannot
    * partition-infer `_bucket` and would change the scan schema). */
  private def prunedScan(buckets: Seq[Int],
      options: CaseInsensitiveStringMap): Option[Scan] = {
    // same raw-scan limitation as liveFiles: a layered snapshot cannot
    // feed a row-level operation's replacement scan (replaceBuckets
    // also refuses at the write side, but failing here keeps the error
    // ahead of any rewrite work)
    if (table.hasLayers) throw new IllegalStateException(
      s"$fullName has merge-on-read delta layers: collapseLayers " +
        "before SQL row-level operations")
    val byBucket = table.currentFilesByBucket
    val files = buckets.flatMap(byBucket.getOrElse(_, Nil))
    if (files.isEmpty) None
    else {
      val spark = SparkSession.active
      val opts = new CaseInsensitiveStringMap(
        (options.asScala ++
          Map("basePath" -> s"${table.root}/data")).asJava)
      val mapping = scanMapping
      Some(org.apache.spark.sql.GraftScanBridge.mappedBuilder(
        ParquetTable(s"$fullName-groups", spark, opts, files,
          Some(physicalSchema(mapping)), classOf[ParquetFileFormat])
          .newScanBuilder(opts), mapping)
        .build())
    }
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
    * the operation's scan, apply the edits, and hand the complete
    * replacement contents OF THE SCANNED GROUPS to the operation's write.
    * The group id is the `_bucket` partition column: this operation asks
    * for it via [[requiredMetadataAttributes]], and Spark's
    * `RowLevelOperationRuntimeGroupFiltering` rule then plants a
    * dynamic-pruning subquery (matching rows → distinct `_bucket`) that
    * reaches the scan through `SupportsRuntimeFiltering.filter` — the
    * scan reads ONLY matched buckets, for UPDATE's WHERE and MERGE's ON
    * condition alike. The write stages the replacement as plain parquet
    * via Spark's own parquet BatchWrite (executor-side, fully
    * distributed), and commit() re-buckets the staged contents with
    * [[GraftTable.replaceBuckets]] over exactly the buckets the runtime
    * filter selected — untouched buckets carry their files over. When the
    * runtime filter never fires (no WHERE, group filtering disabled,
    * empty table), the safe fallback is the full-table
    * [[GraftTable.replaceAll]]. The replay high-water mark survives, the
    * swap is manifest-atomic, and an abort just deletes the staging dir.
    * (DELETE prefers the bucket-pruned SupportsDelete path; this is its
    * runtime-pruned fallback and the only path for UPDATE/MERGE.) */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory,
      PhysicalWriteInfo, RowLevelOperation, WriterCommitMessage}
    require(pinnedVersion.isEmpty,
      s"$fullName is a time-travel snapshot — row-level ops target the current table")
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()

      /** Buckets the runtime group filter selected; None = the filter
        * never fired and the write must assume every bucket was scanned.
        * Written driver-side by [[GraftSqlTable.BucketRecordingScan]]
        * before the write stage runs, read by commit() after it. */
      @volatile private var matchedBuckets: Option[Seq[Int]] = None

      /** `_bucket` joins the read relation so the runtime group filter
        * has an attribute to prune on. Empty table → no partition column
        * to bind (and nothing to prune). */
      override def requiredMetadataAttributes(): Array[NamedReference] =
        if (liveFiles.isEmpty) Array.empty
        else Array(Expressions.column("_bucket"))

      /** The scan must NOT accept static data-filter pushdown: Spark
        * pushes the command's condition into a pushdown-capable row-level
        * scan, and a parquet scan drops non-matching ROWS — the write
        * would then replace surviving groups with matches only. A
        * build()-only ScanBuilder keeps every row of a scanned bucket
        * flowing (the rewrite plan's conditional projection applies the
        * edits); group-granular pruning arrives at RUNTIME through the
        * recording wrapper instead. */
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
        val inner = GraftSqlTable.this.newScanBuilder(options)
        new ScanBuilder {
          override def build(): org.apache.spark.sql.connector.read.Scan =
            new GraftSqlTable.BucketRecordingScan(inner.build(),
              bs => matchedBuckets = Some(bs),
              bs => prunedScan(bs, options))
        }
      }

      override def newWriteBuilder(w: LogicalWriteInfo): WriteBuilder = {
        val spark = SparkSession.active
        val staging = s"${table.root}/.rowlevel-${java.util.UUID.randomUUID()}"
        val stagingOpts = new CaseInsensitiveStringMap(
          Map("path" -> staging).asJava)
        // The staged parquet carries exactly the DATA columns
        // (LogicalWriteInfo.schema). What Spark hands the physical writer
        // varies: with metadata attributes requested, ReplaceData's row
        // projection delivers data-only rows; without them (empty-table
        // path) the rows arrive RAW as [__row_operation :: data], the
        // operation column prepended without widening the declared write
        // schema. [[GraftSqlTable.RowLevelWriterFactory]] dispatches on
        // row arity, projecting raw rows down to the data columns and
        // skipping DELETE-marked ones (group-based plans emit survivors
        // only — defense in depth). The scanned `_bucket` metadata never
        // reaches storage: it would be stale for key-changing edits, and
        // commit re-derives buckets from keys.
        val dataSchema = w.schema()
        val delegate = ParquetTable(s"$fullName-staging", spark, stagingOpts,
          Seq(staging), Some(dataSchema), classOf[ParquetFileFormat])
          .newWriteBuilder(w).build().toBatch
        def dropStaging(): Unit =
          graft.core.Fs.deleteRecursively(Paths.get(staging))
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
                new GraftSqlTable.RowLevelWriterFactory(
                  delegate.createBatchWriterFactory(pi), dataSchema)
              override def commit(msgs: Array[WriterCommitMessage]): Unit = {
                delegate.commit(msgs) // staged parquet now complete
                try {
                  val replacement =
                    spark.read.schema(dataSchema).parquet(staging)
                  matchedBuckets match {
                    case Some(bs) => table.replaceBuckets(bs, replacement)
                    case None     => table.replaceAll(replacement)
                  }
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

  /** Native DSv2 INSERT INTO / INSERT OVERWRITE: a bucket-aware
    * BatchWrite. [[GraftSqlTable.GraftInsertWrite]] declares clustered-
    * by-keys distribution with EXACTLY nBuckets partitions — Spark's
    * HashPartitioning id expression (pmod(murmur3(keys, 42), n)) is the
    * table's own bucketExpr, so each task receives exactly one bucket's
    * rows, key-sorted by the required ordering — and the writers stream
    * parquet straight into the final `data/_bucket=N/` layout (no
    * staging rename pass; on an object store the V1 path's post-write
    * move is a full copy). Files stay invisible until commit() publishes
    * ONE manifest referencing them; aborted tasks leave orphans for
    * vacuum. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"$fullName is a time-travel snapshot — writes go to the current table")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write =
        new GraftSqlTable.GraftInsertWrite(table, info.schema(), overwrite)
    }
  }
}

object GraftSqlTable {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions => XE, SortDirection, SortOrder => V2SortOrder}
  import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriterCommitMessage}

  /** Files one task wrote: (bucket, root-relative path). */
  private final case class InsertFiles(files: Seq[(Int, String)])
      extends WriterCommitMessage


  /** See [[GraftSqlTable.newWriteBuilder]] for the plan shape. */
  private[catalog] final class GraftInsertWrite(table: GraftTable,
      writeSchema: StructType, overwrite: Boolean)
      extends Write with RequiresDistributionAndOrdering {
    // pinned once at write-plan build so the declared distribution and
    // the executor-side bucket router always agree — and post-rebucket
    // inserts hash with the evolved count, not the creation-time one
    private val writeBuckets = table.currentNBuckets
    override def requiredDistribution(): Distribution =
      Distributions.clustered(
        table.keyCols.map(k => XE.column(k): org.apache.spark.sql.connector
          .expressions.Expression).toArray)
    override def requiredNumPartitions(): Int = writeBuckets
    override def requiredOrdering(): Array[V2SortOrder] =
      table.keyCols.map(k =>
        XE.sort(XE.column(k), SortDirection.ASCENDING)).toArray

    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory = {
        // driver-side: bake the session's parquet write options into the
        // hadoop conf the executors' ParquetWriteSupport will init from
        // (the same keys ParquetFileFormat.prepareWrite sets)
        import org.apache.spark.sql.internal.SQLConf
        val sqlConf = SQLConf.get
        val c = SparkSession.active.sessionState.newHadoopConf()
        // data files carry PHYSICAL column names (renamed columns keep
        // their on-disk name; the manifest mapping translates on read)
        val l2p = table.columnMapping
        val physSchema =
          if (l2p.isEmpty) writeSchema
          else StructType(writeSchema.fields.map(f =>
            f.copy(name = l2p.getOrElse(f.name, f.name))))
        org.apache.spark.sql.execution.datasources.parquet
          .ParquetWriteSupport.setSchema(physSchema, c)
        Seq(SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
          SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
          SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE,
          SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED)
          .foreach(e => c.set(e.key, sqlConf.getConf(e).toString))
        c.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
          sqlConf.parquetOutputTimestampType.toString)
        c.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
        c.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
          sqlConf.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
        c.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
          sqlConf.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
        new GraftInsertWriterFactory(table.root, table.keyCols,
          writeBuckets, writeSchema,
          new org.apache.spark.util.SerializableConfiguration(c))
      }
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val files = messages.collect { case InsertFiles(fs) => fs }.flatten
          .groupBy(_._1).map { case (b, fs) => b -> fs.map(_._2).toSeq }
        if (overwrite) table.overwriteFiles(files, writeSchema)
        else if (files.nonEmpty) table.appendFiles(files, writeSchema)
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        messages.collect { case InsertFiles(fs) => fs }.flatten.foreach {
          case (_, rel) =>
            Files.deleteIfExists(Paths.get(s"${table.root}/$rel"))
        }
    }
  }

  private final class GraftInsertWriterFactory(root: String,
      keyCols: Seq[String], nBuckets: Int, schema: StructType,
      conf: org.apache.spark.util.SerializableConfiguration)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int,
        taskId: Long): DataWriter[InternalRow] =
      new GraftInsertWriter(root, keyCols, nBuckets, schema, conf.value)
  }

  /** Executor-side parquet writer: routes each row to its bucket via the
    * same murmur3-pmod expression the table's merge path uses (codegen'd
    * projection — the distribution contract makes this one bucket per
    * task in practice, but the router is authoritative, so AQE
    * coalescing or a future distribution change cannot misfile rows) and
    * streams it through Spark's own ParquetWriteSupport into the final
    * bucket directory. */
  private final class GraftInsertWriter(root: String, keyCols: Seq[String],
      nBuckets: Int, schema: StructType,
      conf: org.apache.hadoop.conf.Configuration)
      extends DataWriter[InternalRow] {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetWriter
    import org.apache.parquet.hadoop.api.WriteSupport
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, Murmur3Hash, Pmod, UnsafeProjection}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport

    private val fields = schema.fields
    private val bucketProj = {
      val keyRefs = keyCols.map { k =>
        val i = fields.indexWhere(_.name == k)
        require(i >= 0, s"bucket key $k missing from INSERT schema " +
          s"(${schema.fieldNames.mkString(",")})")
        BoundReference(i, fields(i).dataType, fields(i).nullable)
      }
      UnsafeProjection.create(Seq(
        Pmod(new Murmur3Hash(keyRefs), Literal(nBuckets))))
    }

    private final class Builder(p: Path)
        extends ParquetWriter.Builder[InternalRow, Builder](p) {
      override def self(): Builder = this
      override def getWriteSupport(c: Configuration)
          : WriteSupport[InternalRow] = new ParquetWriteSupport
    }

    // bucket → (writer, root-relative path); the distribution contract
    // makes this a 1-entry map in practice
    private val open = scala.collection.mutable.Map.empty[
      Int, (ParquetWriter[InternalRow], String)]

    private def writerFor(b: Int): ParquetWriter[InternalRow] =
      open.getOrElseUpdate(b, {
        val rel = s"data/_bucket=$b/${java.util.UUID.randomUUID()}.parquet"
        Files.createDirectories(Paths.get(s"$root/data/_bucket=$b"))
        (new Builder(new Path(s"$root/$rel")).withConf(conf)
          .withCompressionCodec(CompressionCodecName.SNAPPY).build(), rel)
      })._1

    override def write(row: InternalRow): Unit =
      writerFor(bucketProj(row).getInt(0)).write(row)

    override def commit(): WriterCommitMessage = {
      open.values.foreach(_._1.close())
      InsertFiles(open.toSeq.map { case (b, (_, rel)) => (b, rel) })
    }

    override def abort(): Unit = {
      open.values.foreach { case (w, rel) =>
        try w.close() catch { case _: Throwable => () }
        Files.deleteIfExists(Paths.get(s"$root/$rel"))
      }
    }

    override def close(): Unit = ()
  }

  /** The storage-group id, surfaced as a connector metadata column so
    * `SELECT *` stays data-only but row-level operations (and curious
    * `SELECT _bucket, ...` debugging) can reach it. */
  object BucketColumn extends MetadataColumn {
    override def name(): String = "_bucket"
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.IntegerType
    override def isNullable: Boolean = false
    override def comment(): String =
      "hash-bucket storage group of the row (row-level-operation group id)"
  }

  /** Executor-side adapter between the shapes Spark feeds a group-based
    * row-level write and the data-only parquet staging schema. Rows
    * arrive either already projected to the data columns (when metadata
    * attributes were requested) or raw as
    * `[__row_operation :: data (:: metadata)]`; arity tells them apart
    * (the widths are distinct by construction). Raw rows are projected
    * down with a codegen'd [[UnsafeProjection]] and DELETE-marked ones
    * dropped. */
  private[catalog] final class RowLevelWriterFactory(
      inner: org.apache.spark.sql.connector.write.DataWriterFactory,
      dataSchema: StructType)
      extends org.apache.spark.sql.connector.write.DataWriterFactory {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.connector.write.DataWriter

    private val dataWidth = dataSchema.fields.length

    override def createWriter(partitionId: Int,
        taskId: Long): DataWriter[InternalRow] = {
      val w = inner.createWriter(partitionId, taskId)
      new DataWriter[InternalRow] {
        import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
        // fields 1..dataWidth of a raw [__row_operation :: data …] row
        private lazy val dropOp = UnsafeProjection.create(
          dataSchema.fields.zipWithIndex.map { case (f, i) =>
            BoundReference(i + 1, f.dataType, f.nullable)
          }.toIndexedSeq)
        override def write(row: InternalRow): Unit =
          if (row.numFields == dataWidth) w.write(row)
          else if (row.getInt(0) != org.apache.spark.sql.catalyst.util
              .RowDeltaUtils.DELETE_OPERATION) w.write(dropOp(row))
        override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage =
          w.commit()
        override def abort(): Unit = w.abort()
        override def close(): Unit = w.close()
      }
    }
  }

  /** Runtime-group-filtering seam for row-level operations. Spark 4's
    * FileScan no longer implements [[SupportsRuntimeFiltering]] itself,
    * so this wrapper provides it: it advertises `_bucket` as the
    * prunable attribute, and when the group-filter subquery delivers its
    * `_bucket IN (…)` predicate it (a) records the matched bucket ids
    * for the operation's commit and (b) swaps the delegate for a fresh
    * parquet scan planned over ONLY those buckets' files (the manifest
    * maps bucket → files, so pruning is an O(groups) driver lookup, no
    * file listing). Runs entirely on the driver (runtime filtering and
    * partition planning are driver-side), so the callbacks are ordinary
    * closures. */
  private[catalog] final class BucketRecordingScan(inner: Scan,
      record: Seq[Int] => Unit,
      prune: Seq[Int] => Option[Scan]) extends Scan with SupportsRuntimeFiltering {
    @volatile private var effective: Scan = inner
    @volatile private var emptied = false

    override def readSchema(): StructType = inner.readSchema()
    override def description(): String = inner.description()
    override def toBatch: Batch =
      if (emptied) new Batch {
        override def planInputPartitions()
            : Array[org.apache.spark.sql.connector.read.InputPartition] =
          Array.empty
        override def createReaderFactory()
            : org.apache.spark.sql.connector.read.PartitionReaderFactory =
          inner.toBatch.createReaderFactory()
      }
      else effective.toBatch

    override def filterAttributes(): Array[NamedReference] =
      if (inner.readSchema().fieldNames.contains("_bucket"))
        Array(Expressions.column("_bucket"))
      else Array.empty

    override def filter(filters: Array[sources.Filter]): Unit = {
      val buckets = filters.toSeq.collect {
        case sources.In("_bucket", vs) =>
          vs.toSeq.collect { case n: Number => n.intValue }
        case sources.EqualTo("_bucket", n: Number) => Seq(n.intValue)
      }
      // Invariant: the commit replaces exactly the groups the scan
      // produced. Prune ONLY when every predicate is an understood
      // _bucket predicate we also recorded; anything else is suppressed
      // so the scan stays whole-table and the commit's replaceAll
      // fallback stays correct.
      if (filters.nonEmpty && buckets.size == filters.length) {
        val bs = buckets.flatten.distinct.sorted
        record(bs)
        prune(bs) match {
          case Some(s) => effective = s
          case None    => emptied = true // no live files in matched buckets
        }
      }
    }
  }
}
