package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType,
  StringType, StructField, StructType}

import graft.sinks.GraftTable

/** SQL-invocable maintenance — DSv2 stored procedures (SPARK-44167, the
  * Iceberg `CALL catalog.system.rewrite_data_files(...)` shape) under
  * the catalog's `system` namespace:
  *
  *   CALL cat.system.compact(`table` => 'db.t', max_files => 4)
  *   CALL cat.system.merge_adjacent_files('db.t', 67108864)
  *   CALL cat.system.collapse_layers('db.t')
  *   CALL cat.system.zorder('db.t', 'a', 'b')
  *   CALL cat.system.rebucket('db.t', 64)
  *   CALL cat.system.vacuum('db.t', 2)
  *
  * Every procedure takes the table's MAINTENANCE LEASE first
  * ([[GraftTable.runMaintenanceUnderLease]]): a CALL beside a live CDC
  * pipeline serializes against its in-process maintenance and pauses
  * its apply path at the quiesce point — the etl-maintenance
  * coordination contract, now reachable from SQL. A CALL that loses the
  * lease race returns `acquired = false` and does nothing (retry-able),
  * mirroring the reference runner's skip-when-held behavior. */
object GraftProcedures {
  import ProcedureParameter.in

  private def tableParam =
    in("table", StringType).comment("table as 'namespace.table'").build()

  val names: Seq[String] = Seq("compact", "merge_adjacent_files",
    "collapse_layers", "vacuum", "rebucket", "zorder")

  def load(name: String, root: String): Option[UnboundProcedure] = {
    def open(parts: String): GraftTable =
      GraftTable.open(java.nio.file.Paths
        .get(root, parts.split('.').toIndexedSeq: _*).toString)
    def result(fields: (String, org.apache.spark.sql.types.DataType)*) =
      StructType(fields.map { case (n, t) => StructField(n, t) })
    name match {
      case "compact" => Some(proc("compact",
        "rewrite buckets holding more than max_files files",
        Array(tableParam,
          in("max_files", IntegerType).defaultValue("4").build()),
        result("acquired" -> BooleanType, "buckets_rewritten" -> IntegerType),
        (spark, in_) => {
          val t = open(in_.getUTF8String(0).toString)
          var n = -1
          val got = t.runMaintenanceUnderLease(leaseOwner) {
            n = t.compact(spark, in_.getInt(1)).size }
          Seq(new GenericInternalRow(Array[Any](got, n)))
        }))
      case "merge_adjacent_files" => Some(proc("merge_adjacent_files",
        "merge each bucket's sub-target files into one (layer-safe)",
        Array(tableParam,
          in("target_bytes", LongType).defaultValue("67108864").build(),
          in("max_compacted_files", IntegerType).defaultValue("40").build(),
          in("min_active_data_files", IntegerType).defaultValue("0")
            .build()),
        result("acquired" -> BooleanType, "buckets_rewritten" -> IntegerType),
        (spark, in_) => {
          val t = open(in_.getUTF8String(0).toString)
          var n = -1
          val got = t.runMaintenanceUnderLease(leaseOwner) {
            n = t.mergeAdjacentFiles(spark, in_.getLong(1), in_.getInt(2),
              in_.getInt(3)).size }
          Seq(new GenericInternalRow(Array[Any](got, n)))
        }))
      case "collapse_layers" => Some(proc("collapse_layers",
        "fold merge-on-read delta layers back into a clean base",
        Array(tableParam),
        result("acquired" -> BooleanType, "layers_collapsed" -> IntegerType),
        (spark, in_) => {
          val t = open(in_.getUTF8String(0).toString)
          var n = -1
          val got = t.runMaintenanceUnderLease(leaseOwner) {
            n = t.layerPressure.layers
            t.collapseLayers(spark) }
          Seq(new GenericInternalRow(Array[Any](got, n)))
        }))
      case "vacuum" => Some(proc("vacuum",
        "expire snapshots older than the latest `keep`; reclaim files",
        Array(tableParam,
          in("keep", IntegerType).defaultValue("2").build()),
        result("acquired" -> BooleanType, "versions_kept" -> IntegerType),
        (_, in_) => {
          val t = open(in_.getUTF8String(0).toString)
          val keep = in_.getInt(1)
          val got = t.runMaintenanceUnderLease(leaseOwner) {
            t.vacuum(keep) }
          Seq(new GenericInternalRow(Array[Any](got,
            if (got) math.min(keep, t.versions.size) else -1)))
        }))
      case "rebucket" => Some(proc("rebucket",
        "evolve the bucket count (full data-identical rewrite)",
        Array(tableParam, in("new_buckets", IntegerType).build()),
        result("acquired" -> BooleanType, "n_buckets" -> IntegerType),
        (spark, in_) => {
          val t = open(in_.getUTF8String(0).toString)
          val got = t.runMaintenanceUnderLease(leaseOwner) {
            t.rebucket(spark, in_.getInt(1)) }
          Seq(new GenericInternalRow(Array[Any](got, t.currentNBuckets)))
        }))
      case "zorder" => Some(proc("zorder",
        "Z-ORDER cluster each bucket by the Morton interleave of two " +
          "columns (2-D data skipping)",
        Array(tableParam, in("col_a", StringType).build(),
          in("col_b", StringType).build(),
          in("files_per_bucket", IntegerType).defaultValue("4").build()),
        result("acquired" -> BooleanType),
        (spark, in_) => {
          val t = open(in_.getUTF8String(0).toString)
          val got = t.runMaintenanceUnderLease(leaseOwner) {
            t.clusterBy(spark, in_.getUTF8String(1).toString,
              in_.getUTF8String(2).toString, in_.getInt(3)) }
          Seq(new GenericInternalRow(Array[Any](got)))
        }))
      case _ => None
    }
  }

  private def leaseOwner =
    s"sql-procedure@${java.util.UUID.randomUUID()}"

  private def proc(name0: String, desc: String,
      params: Array[ProcedureParameter], schema: StructType,
      body: (SparkSession, InternalRow) => Seq[InternalRow])
      : UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = name0
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val out = body(SparkSession.active, input).toArray
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = out
          override def readSchema(): StructType = schema
        }).iterator()
      }
    }
}
