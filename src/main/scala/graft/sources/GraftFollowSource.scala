package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.GraftTable

/** Streaming CONSUMPTION of a graft table — the checkpointed DSv2 face
  * of [[GraftTable.changesSince]] (CDF-lite at the format's natural
  * bucket granularity; the Delta change-data-feed shape). Registered as
  * `format("graft-follow")` with option `path`.
  *
  * Scale design: the stream itself carries METADATA rows, not data —
  * each micro-batch is the manifest diff between two snapshot versions:
  * a CONTROL row (`_bucket = -1`) with the leader's pinned schema DDL
  * and column name mapping at the target version, then one row per
  * (bucket, live file) to read plus one TOMBSTONE row per bucket whose
  * replacement is empty. A follower applies a batch by replacing
  * exactly the mentioned buckets, reading the listed files with the
  * session's native vectorized parquet scan
  * ([[GraftFollower.applyBatch]]) — the heavy data path never funnels
  * through a custom row reader, and a 100 TB table's update stream is
  * O(changed buckets) per trigger. The control row also propagates
  * METADATA-ONLY commits (a leader RENAME COLUMN touches no files but
  * still produces a batch), so follower schemas track leader renames
  * without waiting for the next data write. Offsets are manifest
  * versions, so kill/restart resumes from the checkpointed version; a
  * resume from an EXPIRED version (vacuumed manifest — the
  * slot-invalidation analog) degrades to one FULL-REFRESH batch:
  * tombstones for every bucket plus the complete live file list, which
  * under the same replace-contract rebuilds the follower without a
  * special case (changesSince `fullRefresh` semantics,
  * GraftTable.scala).
  */
class GraftFollowSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-follow"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftFollowSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftFollowTable(opts.get("path"),
      Option(opts.get("maxVersionsPerTrigger")).map(_.toInt))
  }
}

object GraftFollowSource {
  /** One CONTROL row per batch (`_bucket` = -1, `schema_ddl` +
    * `mapping_json` = leader metadata at `version`), then one row per
    * file to read (tombstone=false) or per bucket to empty
    * (tombstone=true, file null). `version` is the snapshot the batch
    * lands the follower on.
    *
    * Merge-on-read leaders: a replaced bucket's contents may be a
    * LAYERED fold — `kind` distinguishes base files ("base"), layer
    * upsert files ("up") and key-only layer delete files ("del"), with
    * `layer_v` ordering the fold (highest layer wins per key). CoW
    * batches carry only "base" rows, so pre-MoR followers read
    * unchanged. */
  val schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("_bucket", IntegerType, nullable = false),
    StructField("file", StringType, nullable = true),
    StructField("tombstone", BooleanType, nullable = false),
    StructField("schema_ddl", StringType, nullable = true),
    StructField("mapping_json", StringType, nullable = true),
    StructField("kind", StringType, nullable = true),
    StructField("layer_v", LongType, nullable = false)))

  /** Compact, order-stable JSON for the logical→physical name mapping
    * (same escaping rules as the manifest writer). */
  def mappingToJson(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (l, p) =>
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      s""""${esc(l)}":"${esc(p)}""""
    }.mkString("{", ",", "}")

  def mappingFromJson(s: String): Map[String, String] = {
    if (s == null || s.isEmpty || s == "{}") return Map.empty
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    JsonMethods.parse(s).extract[Map[String, String]]
  }
}

final class GraftFollowTable(root: String, maxVersions: Option[Int] = None)
    extends Table with SupportsRead {
  override def name(): String = s"graft-follow:$root"
  override def schema(): StructType = GraftFollowSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = GraftFollowSource.schema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream = new GraftFollowStream(root, maxVersions)
      override def toBatch: Batch =
        throw new UnsupportedOperationException(
          "graft-follow is a streaming source; batch reads go through " +
            "the catalog/TVF surfaces")
    }
}

/** Version offset (json = the long). -1 = before any snapshot. */
final case class VersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** Shared admission control for the two follow streams: offsets are
  * snapshot versions, and `maxVersionsPerTrigger` (or an engine-supplied
  * ReadMaxRows limit) caps how many RETAINED versions one micro-batch
  * may span — a catch-up drains in bounded per-trigger chunks instead
  * of jumping straight to the log head. Also resolves an EXPIRED end
  * offset (a replayed batch whose target manifest was vacuumed while
  * the batch was uncommitted) to the oldest retained version: retention
  * drops a prefix, so an expired `to` implies the whole window —
  * including `from` — expired, and the planner's full-refresh path
  * covers it; without this the replay would crash-loop on the missing
  * manifest. */
private[sources] trait VersionCappedStream extends SupportsAdmissionControl {
  protected def table: GraftTable
  protected def maxVersions: Option[Int]

  def latestOffset(): Offset =
    VersionOffset(table.currentVersion.getOrElse(-1L))
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset].version
    val cur = table.currentVersion.getOrElse(-1L)
    if (cur <= s) return VersionOffset(cur.max(s))
    val cap = limit match {
      case r: ReadMaxRows => Some(r.maxRows().toInt)
      case _              => maxVersions
    }
    cap match {
      case None => VersionOffset(cur)
      case Some(n) =>
        val ahead = table.versions.filter(_ > s).take(math.max(1, n))
        VersionOffset(ahead.lastOption.getOrElse(cur))
    }
  }
  override def getDefaultReadLimit: ReadLimit =
    maxVersions.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  /** The replayed end offset if its manifest survives, else the oldest
    * retained version (None = table has no versions at all). */
  protected def resolveEnd(to: Long): Option[Long] = {
    val vs = table.versions
    if (vs.contains(to)) Some(to) else vs.headOption
  }
}

final class GraftFollowStream(root: String,
    protected val maxVersions: Option[Int] = None)
    extends MicroBatchStream with VersionCappedStream {
  protected def table: GraftTable = GraftTable.open(root)

  override def initialOffset(): Offset = VersionOffset(-1L)
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VersionOffset].version
    val to0 = end.asInstanceOf[VersionOffset].version
    if (to0 < 0 || to0 == from) return Array.empty
    val t = table
    val to = resolveEnd(to0).getOrElse(return Array.empty)
    // one manifest read per side (this runs on every trigger)
    val toM = t.readManifest(to)
    val known = from >= 0 && from != to && t.versions.contains(from)
    val fromM = if (known) Some(t.readManifest(from)) else None
    val cur = toM.files
    // per-bucket layered contents at `to`: base files plus every layer
    // file touching the bucket, tagged for the follower's fold. A
    // bucket with NO contents at `to` (base gone, no layer touches it)
    // is a tombstone.
    def bucketRows(b: Int): Seq[FollowFile] = {
      val base = cur.getOrElse(b, Nil)
        .map(f => FollowFile(b, Some(f), "base", -1L))
      val layered = toM.layers.flatMap(l =>
        l.ups.getOrElse(b, Nil).map(f => FollowFile(b, Some(f), "up",
          l.version)) ++
          l.del.getOrElse(b, Nil).map(f => FollowFile(b, Some(f), "del",
            l.version)))
      val all = base ++ layered
      if (all.isEmpty) Seq(FollowFile(b, None, "base", -1L)) else all
    }
    // diff on RAW manifest entries; resolve to absolute paths on emit
    val rows: Seq[FollowFile] = (fromM match {
      case None =>
        // full refresh: every bucket is replaced — tombstone the empty
        // ones so the consumer's stale buckets clear under the same
        // replace-contract (no special case). The range covers the
        // WIDEST known layout (creation-time count, current count, and
        // every bucket the target snapshot occupies): after a rebucket
        // the consumer may hold buckets under either count, and an
        // occupied bucket beyond the creation-time count must still be
        // emitted or its rows would silently vanish from the follower
        (((0 until math.max(t.nBuckets, t.currentNBuckets)).toSet ++
          cur.keySet ++
          toM.layers.flatMap(l => l.ups.keySet ++ l.del.keySet))
          .toSeq.sorted).flatMap(bucketRows)
      case Some(bm) =>
        val before = bm.files
        // layer-aware: merge-on-read commits change a bucket's rows
        // without touching base files — buckets touched by a layer not
        // common to both endpoints are changed too
        val commonLayers = bm.layers.map(_.version).toSet
          .intersect(toM.layers.map(_.version).toSet)
        val layerTouched = (bm.layers ++ toM.layers)
          .filterNot(l => commonLayers.contains(l.version))
          .flatMap(l => l.ups.keySet ++ l.del.keySet).toSet
        val changed = (cur.collect {
          case (b, fs) if before.get(b) != Some(fs) => b }.toSet ++
          layerTouched).toSeq
        val gone = (before.keySet -- cur.keySet).toSeq
          .filterNot(changed.contains)
        changed.flatMap(bucketRows) ++
          gone.map(b => FollowFile(b, None, "base", -1L))
    }).map(r => r.copy(file = r.file.map(t.resolved)))
    if (rows.isEmpty && fromM.exists(bm =>
        toM.schemaDdl == bm.schemaDdl &&
          toM.columnMapping == bm.columnMapping))
      // nothing changed beyond the version counter (e.g. a replay-mark
      // only commit): skip the batch entirely
      Array.empty
    else
      Array(GraftFollowPartition(to, rows.sortBy(_.bucket),
        toM.schemaDdl,
        GraftFollowSource.mappingToJson(toM.columnMapping)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFollowReaderFactory
}

/** One file (or tombstone) of one replaced bucket: `kind` ∈ base | up |
  * del, `layerV` orders the merge-on-read fold (-1 for base). */
final case class FollowFile(bucket: Int, file: Option[String],
    kind: String, layerV: Long)

/** The whole diff rides one partition: it is metadata-scale (file names
  * + bucket ids + one schema/mapping control payload), and followers
  * consume it on the driver anyway. */
final case class GraftFollowPartition(version: Long,
    rows: Seq[FollowFile], schemaDdl: String,
    mappingJson: String) extends InputPartition

final class GraftFollowReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFollowPartition]
    new PartitionReader[InternalRow] {
      // control row first, then the file/tombstone rows
      private val it = Iterator.single(
        InternalRow(p.version, -1, null, false,
          UTF8String.fromString(p.schemaDdl),
          UTF8String.fromString(p.mappingJson), null, -1L)) ++
        p.rows.iterator.map { r =>
          InternalRow(p.version, r.bucket,
            r.file.map(UTF8String.fromString).orNull, r.file.isEmpty,
            null, null, UTF8String.fromString(r.kind), r.layerV)
        }
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        cur = it.next()
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** Follower-side application of one `graft-follow` micro-batch: mirror
  * any leader column RENAMES signalled by the control row, then replace
  * each mentioned bucket of `target` with the batch's listed files'
  * rows (none for tombstoned buckets). Files carry the leader's
  * PHYSICAL column names; the control row's schema + mapping translate
  * them to the leader's logical names on read, so the follower's
  * logical schema tracks the leader's across renames. File reads use
  * the session's native parquet scan; the only driver materialization
  * is the metadata-scale file list. Typical use:
  *
  * {{{
  * spark.readStream.format("graft-follow").option("path", leaderRoot)
  *   .load().writeStream.option("checkpointLocation", ckpt)
  *   .foreachBatch { (df, _) => GraftFollower.applyBatch(df, follower) }
  *   .start()
  * }}}
  */
object GraftFollower {
  def applyBatch(batch: DataFrame, target: GraftTable): Unit = {
    val spark = batch.sparkSession
    val meta = batch
      .select("_bucket", "file", "schema_ddl", "mapping_json", "kind",
        "layer_v").collect()
    if (meta.isEmpty) return
    val ctrl = meta.find(_.getInt(0) == -1)
    val leaderDdl = ctrl.map(_.getString(2)).filter(_ != null).getOrElse("")
    val leaderMapping = GraftFollowSource.mappingFromJson(
      ctrl.map(_.getString(3)).orNull)
    if (leaderDdl.nonEmpty)
      mirrorRenames(target, StructType.fromDDL(leaderDdl))
    val data = meta.filter(_.getInt(0) >= 0)
    if (data.isEmpty) return
    val buckets = data.map(_.getInt(0)).distinct.toSeq
    def kindOf(r: org.apache.spark.sql.Row): String =
      if (r.isNullAt(4)) "base" else r.getString(4)
    def filesOf(k: String => Boolean): Seq[(Long, Seq[String])] = data
      .filter(r => !r.isNullAt(1) && k(kindOf(r)))
      .groupBy(_.getLong(5)).toSeq.sortBy(_._1)
      .map { case (lv, rs) => lv -> rs.map(_.getString(1)).toSeq }
    val baseFiles = filesOf(_ == "base").flatMap(_._2)
    val rows =
      if (baseFiles.isEmpty && !data.exists(r => kindOf(r) != "base")) {
        // tombstone-only batch on a follower with no schema yet (fresh
        // follower of an empty/truncated leader): nothing to clear, and
        // a StructType(Nil) frame cannot resolve the bucket key columns
        val schema = target.currentSchema.getOrElse(StructType(Nil))
        if (schema.isEmpty) return
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      } else {
        val base = readLeaderFiles(spark, baseFiles, leaderDdl,
          leaderMapping)
        // merge-on-read leader: fold the shipped layers over the base —
        // the same keyed LWW the leader's own reads apply (highest
        // touching layer wins; delete-marker winners stay gone)
        foldLayers(spark, base,
          filesOf(_ == "up").map { case (lv, fs) => (lv, fs, false) } ++
            filesOf(_ == "del").map { case (lv, fs) => (lv, fs, true) },
          leaderDdl, leaderMapping, target)
      }
    target.replaceBuckets(buckets, rows)
  }

  /** Keyed layered-LWW fold (the follower-side mirror of the leader's
    * layer application): among all layer rows touching a key, the one
    * from the highest layer wins; upsert winners replace, delete
    * winners remove. Delete files are KEY-ONLY parquet. */
  private def foldLayers(spark: SparkSession, base: DataFrame,
      layers: Seq[(Long, Seq[String], Boolean)], leaderDdl: String,
      mapping: Map[String, String], target: GraftTable): DataFrame = {
    import org.apache.spark.sql.functions._
    if (layers.isEmpty) return base
    val keyCols = target.keyCols
    val keyDdl =
      if (leaderDdl.isEmpty) ""
      else StructType(StructType.fromDDL(leaderDdl)
        .fields.filter(f => keyCols.contains(f.name))).toDDL
    val tagged = layers.filter(_._2.nonEmpty).map { case (lv, fs, isDel) =>
      readLeaderFiles(spark, fs, if (isDel) keyDdl else leaderDdl,
        mapping)
        .withColumn("_lv", lit(lv))
        .withColumn("_alive", lit(!isDel))
    }
    if (tagged.isEmpty) return base
    val all = tagged.reduce(_.unionByName(_, allowMissingColumns = true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("_lv").desc)
    val winners = all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("_alive"))
      .drop("_lv", "_alive", "_rn")
    val touched = all.select(keyCols.map(col): _*).distinct()
    base.join(broadcast(touched), keyCols, "left_anti")
      .unionByName(winners, allowMissingColumns = true)
  }

  /** Read leader data files (PHYSICAL column names on disk) and surface
    * the leader's LOGICAL names — [[GraftTable.readUnderMapping]], the
    * same translation the table's own reads use. Pre-schema leaders (no
    * control payload) fall back to the raw file schema. */
  private def readLeaderFiles(spark: SparkSession, files: Seq[String],
      leaderDdl: String, mapping: Map[String, String]): DataFrame =
    if (leaderDdl.isEmpty)
      spark.read.parquet(files: _*).drop("_bucket")
    else
      GraftTable.readUnderMapping(spark, files, leaderDdl, mapping,
        basePath = None)

  /** Mirror leader renames onto the follower: only when both schemas
    * have the SAME field count (a pure rename never changes it) is a
    * position whose TYPE matches but whose NAME differs — with neither
    * name present on the other side — a rename of that column, applied
    * via the follower's own [[GraftTable.renameColumn]] (manifest
    * name-mapping, zero data movement). Positional identity is exact
    * for the rename-only case (renameColumn preserves field order); a
    * batch that also spans ADD/DROP commits (field counts differ, or a
    * dropped column's position was reused) falls back to the widen-only
    * evolution contract instead of guessing a wrong pair. */
  private[sources] def mirrorRenames(target: GraftTable,
      leaderLogical: StructType): Unit = {
    val cur = target.currentSchema.getOrElse(return)
    if (cur.length != leaderLogical.length) return
    val curNames = cur.fieldNames.toSet
    val ldNames = leaderLogical.fieldNames.toSet
    cur.fields.indices.foreach { i =>
      val c = cur.fields(i)
      val l = leaderLogical.fields(i)
      if (c.name != l.name && c.dataType == l.dataType &&
          !ldNames.contains(c.name) && !curNames.contains(l.name) &&
          !target.keyCols.contains(c.name))
        target.renameColumn(c.name, l.name)
    }
  }
}
