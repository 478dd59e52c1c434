package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.GraftTable

/** Checkpointed STREAMING consumption of the row-level change feed —
  * the DSv2 face of [[GraftTable.rowChangesBetween]], exactly as
  * `graft-follow` is the streaming face of `changesSince`. Registered
  * as `format("graft-row-follow")` with option `path`.
  *
  * Scale design: like graft-follow, the stream itself carries METADATA
  * rows only — one row per retained snapshot TRANSITION the batch
  * spans, `(from_version, to_version)`. The heavy part — reading the
  * changed buckets on both sides and diffing them into tagged change
  * rows — runs through [[GraftRowFeed.changes]] on the session's native
  * parquet scans, so a 100 TB leader's feed costs O(changed buckets per
  * commit), never a custom row reader. Per-transition expansion keeps
  * every change row attributable to the commit that produced it
  * (`_commit_version`, the Delta-CDF shape). Offsets are manifest
  * versions; a restart resumes from the checkpointed version, and a
  * resume from an EXPIRED version degrades to one full-refresh
  * transition whose feed is the complete state as `insert` rows
  * (`rowChangesBetween` contract — deletions since the expired version
  * are unobservable). */
class GraftRowFollowSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-row-follow"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRowFollowSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftRowFollowTable(opts.get("path"),
      Option(opts.get("maxVersionsPerTrigger")).map(_.toInt))
  }
}

object GraftRowFollowSource {
  /** One row per snapshot transition the batch spans. */
  val schema: StructType = StructType(Seq(
    StructField("from_version", LongType, nullable = false),
    StructField("to_version", LongType, nullable = false)))
}

final class GraftRowFollowTable(root: String,
    maxVersions: Option[Int] = None) extends Table with SupportsRead {
  override def name(): String = s"graft-row-follow:$root"
  override def schema(): StructType = GraftRowFollowSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = GraftRowFollowSource.schema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream = new GraftRowFollowStream(root, maxVersions)
      override def toBatch: Batch =
        throw new UnsupportedOperationException(
          "graft-row-follow is a streaming source; the poll-based batch " +
            "shape is the graft_table_changes TVF / rowChangesSince")
    }
}

final class GraftRowFollowStream(root: String,
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
    // an expired replayed end offset resolves to the oldest retained
    // version (VersionCappedStream.resolveEnd) — the whole window
    // expired with it, so the feed degrades to a full refresh there
    val to = resolveEnd(to0).getOrElse(return Array.empty)
    if (to <= from) return Array.empty
    // retained versions inside (from, to]: per-commit transitions where
    // the manifests survive; expired intermediates collapse into the
    // first transition (whose from-side may itself be expired — then
    // rowChangesBetween degrades it to a full refresh)
    val vs = table.versions.filter(v => v > from && v <= to)
    val transitions =
      if (vs.isEmpty) Seq(from -> to)
      else (from +: vs).zip(vs)
    Array(GraftRowFollowPartition(transitions))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRowFollowReaderFactory
}

/** The whole transition list rides one partition: it is metadata-scale
  * (two longs per commit) and consumed on the driver by
  * [[GraftRowFeed.changes]]. */
final case class GraftRowFollowPartition(transitions: Seq[(Long, Long)])
    extends InputPartition

final class GraftRowFollowReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftRowFollowPartition]
    new PartitionReader[InternalRow] {
      private val it = p.transitions.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val (f, t) = it.next()
        cur = InternalRow(f, t)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** Consumer-side expansion of one `graft-row-follow` micro-batch into
  * tagged change rows: each transition becomes a `rowChangesBetween`
  * feed (table columns + `_change_type`) with `_commit_version` = the
  * transition's target version and `_full_refresh` marking a feed that
  * must be treated as complete state (expired from-version). Columns
  * added mid-range union by name (earlier commits read them as null).
  * Typical use:
  *
  * {{{
  * spark.readStream.format("graft-row-follow").option("path", root)
  *   .load().writeStream.option("checkpointLocation", ckpt)
  *   .foreachBatch { (df, _) =>
  *     val feed = GraftRowFeed.changes(df, root)
  *     ... // apply / append / audit the tagged rows
  *   }.start()
  * }}}
  */
object GraftRowFeed {
  /** One tagged change frame per transition in the batch, in commit
    * order — the pre-union shape both [[changes]] and [[applyBatch]]
    * build on. A batch spanning a RENAME COLUMN would otherwise carry
    * feeds whose column names differ per transition (each is under its
    * target version's logical schema): every feed aligns onto the LAST
    * transition's logical names through the stable physical identity. */
  private[graft] def transitionFeeds(batch: DataFrame,
      table: GraftTable): Seq[(Long, Boolean, DataFrame)] = {
    val spark = batch.sparkSession
    val transitions = batch.select("from_version", "to_version").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    if (transitions.isEmpty) return Seq.empty
    val finalTo = transitions.last._2
    val finalPhysToLogical = table.mappingOf(finalTo).map(_.swap)
    transitions.toSeq.map { case (f, t) =>
      val c = table.rowChangesBetween(spark, f, t)
      val mapping = table.mappingOf(t)
      val renames = c.rows.columns
        .filterNot(_ == "_change_type").flatMap { n =>
          val p = mapping.getOrElse(n, n)
          val fin = finalPhysToLogical.getOrElse(p, p)
          if (fin != n) Some(n -> fin) else None
        }.toMap
      val rows =
        if (renames.isEmpty) c.rows else c.rows.withColumnsRenamed(renames)
      (t, c.fullRefresh, rows)
    }
  }

  def changes(batch: DataFrame, root: String): DataFrame = {
    val spark = batch.sparkSession
    transitionFeeds(batch, GraftTable.open(root))
      .map { case (t, fullRefresh, rows) =>
        rows.withColumn("_commit_version", lit(t))
          .withColumn("_full_refresh", lit(fullRefresh))
      }
      .reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
      .getOrElse(spark.emptyDataFrame)
  }

  /** Row-level REPLICATION consumer: apply one micro-batch's change feed
    * to a keyed target [[GraftTable]]. Each commit applies as its own
    * merge with `_seq` = the leader commit version, so the target's
    * replay high-water makes restarts exactly-once: a batch replayed
    * after a crash (offsets WAL'd before foreachBatch commits) filters
    * to a no-op instead of double-applying. Full-refresh transitions
    * (expired checkpoint) rebuild via overwrite, which resets the mark —
    * correct, because the subsequent commits' versions exceed it again.
    * Deletes ride the preimage payload; preimages are otherwise
    * informational. Typical use:
    *
    * {{{
    * spark.readStream.format("graft-row-follow").option("path", root)
    *   .load().writeStream.option("checkpointLocation", ckpt)
    *   .foreachBatch { (df, _) => GraftRowFeed.applyBatch(df, root, replica) }
    *   .start()
    * }}}
    */
  def applyBatch(batch: DataFrame, root: String, target: GraftTable): Unit = {
    import org.apache.spark.sql.functions.{col, format_string, lit, when}
    val leader = GraftTable.open(root)
    val feeds = transitionFeeds(batch, leader)
    if (feeds.isEmpty) return
    // mirror leader renames first (the feeds are aligned onto the FINAL
    // transition's logical names): without this a post-rename merge
    // would widen the replica with the new name while untouched keys
    // kept the old column — permanent divergence from leader.read
    val payload = StructType(feeds.last._3.schema.fields
      .filterNot(_.name == "_change_type"))
    GraftFollower.mirrorRenames(target, payload)
    // each commit applies as its own merge directly from its transition
    // frame (never re-filtering the unioned feed — that re-executed all
    // N transition joins per commit)
    feeds.foreach { case (v, fullRefresh, rows) =>
      if (fullRefresh)
        target.overwrite(rows.filter(col("_change_type") === "insert")
          .drop("_change_type"))
      else
        target.merge(rows.filter(col("_change_type") =!= "update_preimage")
          .withColumn("_op",
            when(col("_change_type") === "delete", "D").otherwise("U"))
          .withColumn("_seq", format_string("%016x/%016x", lit(v), lit(0L)))
          .drop("_change_type"))
    }
  }
}
