package graft.catalog

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType,
  StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.GraftTable

/** Iceberg-style METADATA TABLES over a graft table's manifest chain —
  * observability from plain SQL (the `db.t.snapshots` / `db.t.files`
  * shape):
  *
  *   SELECT * FROM cat.db.t.snapshots   -- retained versions: commit
  *                                      -- time, high-water, footprint
  *   SELECT * FROM cat.db.t.files       -- live files: bucket, kind
  *                                      -- (base/layer), bytes
  *   SELECT * FROM cat.db.t.layers      -- merge-on-read layer chain
  *
  * All driver-side manifest reads (no Spark job): a metadata query on a
  * 100 TB table costs O(retained manifests + files in the manifest),
  * never a data scan. Time-travel discovery (`VERSION AS OF` targets)
  * reads `snapshots`; maintenance triggers read `files`/`layers`. */
object GraftMetaTables {
  val Names: Set[String] = Set("snapshots", "files", "layers",
    "partitions")

  def apply(t: GraftTable, which: String, fullName: String): Table =
    new MetaTable(t, which, fullName)

  private def sz(t: GraftTable, f: String): Long =
    try Files.size(Paths.get(t.resolved(f)))
    catch { case _: java.io.IOException => 0L }

  private final class MetaTable(t: GraftTable, which: String,
      fullName: String) extends Table with SupportsRead {
    import scala.jdk.CollectionConverters._
    override def name(): String = fullName
    override def capabilities(): java.util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava

    override def schema(): StructType = which match {
      case "snapshots" => StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("committed_at", TimestampType),
        StructField("high_water", StringType),
        StructField("files", IntegerType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("layers", IntegerType, nullable = false),
        StructField("same_data", BooleanType, nullable = false),
        StructField("n_buckets", IntegerType, nullable = false)))
      case "files" => StructType(Seq(
        StructField("bucket", IntegerType, nullable = false),
        StructField("path", StringType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("kind", StringType, nullable = false),
        StructField("layer_version", LongType)))
      case "partitions" => StructType(Seq(
        StructField("bucket", IntegerType, nullable = false),
        StructField("files", IntegerType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("layer_files", IntegerType, nullable = false),
        StructField("layer_bytes", LongType, nullable = false)))
      case _ => StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("upsert_files", IntegerType, nullable = false),
        StructField("delete_files", IntegerType, nullable = false),
        StructField("bytes", LongType, nullable = false)))
    }

    private def rows(): Array[InternalRow] = which match {
      case "snapshots" =>
        t.versions.map { v =>
          val m = t.readManifest(v)
          val base = m.files.valuesIterator.flatten.toSeq
          val layerFiles = m.layers.flatMap(l =>
            l.ups.valuesIterator.flatten ++ l.del.valuesIterator.flatten)
          new GenericInternalRow(Array[Any](
            v,
            if (m.committedAtMs < 0) null else m.committedAtMs * 1000L,
            UTF8String.fromString(m.highWater),
            base.size + layerFiles.size,
            (base ++ layerFiles).map(sz(t, _)).sum,
            m.layers.size,
            m.sameData,
            m.nBucketsOverride.getOrElse(t.nBuckets)))
        }.toArray
      case "files" =>
        val m = t.currentVersion.map(t.readManifest).toSeq
        m.flatMap { m =>
          val base = m.files.toSeq.sortBy(_._1).flatMap { case (b, fs) =>
            fs.map(f => (b, f, "base", null: Any)) }
          val layered = m.layers.flatMap { l =>
            l.ups.toSeq.sortBy(_._1).flatMap { case (b, fs) =>
              fs.map(f => (b, f, "layer-upsert", l.version: Any)) } ++
            l.del.toSeq.sortBy(_._1).flatMap { case (b, fs) =>
              fs.map(f => (b, f, "layer-delete", l.version: Any)) }
          }
          (base ++ layered).map { case (b, f, kind, lv) =>
            new GenericInternalRow(Array[Any](
              b, UTF8String.fromString(f), sz(t, f),
              UTF8String.fromString(kind), lv)): InternalRow
          }
        }.toArray
      case "partitions" =>
        // per-bucket footprint — the skew-diagnosis view: a bucket far
        // above the median is a rebucket/salting candidate
        t.currentVersion.map(t.readManifest).toSeq.flatMap { m =>
          val layered = m.layers.flatMap(l =>
            (l.ups.toSeq ++ l.del.toSeq)).groupBy(_._1)
          (m.files.keySet ++ layered.keySet).toSeq.sorted.map { b =>
            val base = m.files.getOrElse(b, Nil)
            val lfs = layered.getOrElse(b, Nil).flatMap(_._2)
            new GenericInternalRow(Array[Any](
              b, base.size, base.map(sz(t, _)).sum,
              lfs.size, lfs.map(sz(t, _)).sum)): InternalRow
          }
        }.toArray
      case _ =>
        t.currentVersion.map(t.readManifest).toSeq.flatMap(_.layers)
          .map { l =>
            val ups = l.ups.valuesIterator.flatten.toSeq
            val dels = l.del.valuesIterator.flatten.toSeq
            new GenericInternalRow(Array[Any](
              l.version, ups.size, dels.size,
              (ups ++ dels).map(sz(t, _)).sum)): InternalRow
          }.toArray
    }

    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] = MetaTable.this.rows()
        override def readSchema(): StructType = MetaTable.this.schema()
      }
    }
  }
}
