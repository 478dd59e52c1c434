package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
  * one row per (bucket, live file) to read plus one TOMBSTONE row per
  * bucket whose replacement is empty. A follower applies a batch by
  * replacing exactly the mentioned buckets, reading the listed files
  * with the session's native vectorized parquet scan
  * ([[GraftFollower.applyBatch]]) — the heavy data path never funnels
  * through a custom row reader, and a 100 TB table's update stream is
  * O(changed buckets) per trigger. Offsets are manifest versions, so
  * kill/restart resumes from the checkpointed version; a resume from an
  * EXPIRED version (vacuumed manifest — the slot-invalidation analog)
  * degrades to one FULL-REFRESH batch: tombstones for every bucket plus
  * the complete live file list, which under the same replace-contract
  * rebuilds the follower without a special case (changesSince
  * `fullRefresh` semantics, GraftTable.scala).
  */
class GraftFollowSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-follow"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftFollowSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftFollowTable(properties.get("path"))
}

object GraftFollowSource {
  /** One row per file to read (tombstone=false) or per bucket to empty
    * (tombstone=true, file null). `version` is the snapshot the batch
    * lands the follower on. */
  val schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("_bucket", IntegerType, nullable = false),
    StructField("file", StringType, nullable = true),
    StructField("tombstone", BooleanType, nullable = false)))
}

final class GraftFollowTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft-follow:$root"
  override def schema(): StructType = GraftFollowSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = GraftFollowSource.schema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream = new GraftFollowStream(root)
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

final class GraftFollowStream(root: String) extends MicroBatchStream {
  private def table = GraftTable.open(root)

  override def initialOffset(): Offset = VersionOffset(-1L)
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toLong)
  override def latestOffset(): Offset =
    VersionOffset(table.currentVersion.getOrElse(-1L))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VersionOffset].version
    val to = end.asInstanceOf[VersionOffset].version
    if (to < 0 || to == from) return Array.empty
    val t = table
    val cur = t.filesByBucketOf(to)
    val known = from >= 0 && t.versions.contains(from)
    val rows: Seq[(Int, Option[String])] =
      if (!known) {
        // full refresh: every bucket is replaced — tombstone the empty
        // ones so the consumer's stale buckets clear under the same
        // replace-contract (no special case)
        val live = cur.keySet
        cur.toSeq.flatMap { case (b, fs) => fs.map(f => b -> Option(f)) } ++
          (0 until t.nBuckets).filterNot(live).map(b => b -> None)
      } else {
        val before = t.filesByBucketOf(from)
        val changed = cur.collect {
          case (b, fs) if before.get(b) != Some(fs) => b }.toSeq
        val gone = (before.keySet -- cur.keySet).toSeq
        changed.flatMap(b => cur(b).map(f => b -> Option(f))) ++
          gone.map(b => b -> None)
      }
    if (rows.isEmpty) Array.empty
    else Array(GraftFollowPartition(to, rows.sortBy(_._1)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFollowReaderFactory
}

/** The whole diff rides one partition: it is metadata-scale (file names
  * + bucket ids), and followers consume it on the driver anyway. */
final case class GraftFollowPartition(version: Long,
    rows: Seq[(Int, Option[String])]) extends InputPartition

final class GraftFollowReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFollowPartition]
    new PartitionReader[InternalRow] {
      private val it = p.rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val (bucket, file) = it.next()
        cur = InternalRow(p.version, bucket,
          file.map(UTF8String.fromString).orNull, file.isEmpty)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** Follower-side application of one `graft-follow` micro-batch: replace
  * each mentioned bucket of `target` with the batch's listed files'
  * rows (none for tombstoned buckets). File reads use the session's
  * native parquet scan; the only driver materialization is the
  * metadata-scale file list. Typical use:
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
    val meta = batch.select("_bucket", "file").collect()
    if (meta.isEmpty) return
    val buckets = meta.map(_.getInt(0)).distinct.toSeq
    val files = meta.filter(!_.isNullAt(1)).map(_.getString(1)).toSeq
    val rows =
      if (files.isEmpty) {
        // tombstone-only batch on a follower with no schema yet (fresh
        // follower of an empty/truncated leader): nothing to clear, and
        // a StructType(Nil) frame cannot resolve the bucket key columns
        val schema = target.currentSchema.getOrElse(StructType(Nil))
        if (schema.isEmpty) return
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      } else spark.read.parquet(files: _*).drop("_bucket")
    target.replaceBuckets(buckets, rows)
  }
}
