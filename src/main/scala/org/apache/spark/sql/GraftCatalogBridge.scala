package org.apache.spark.sql

import org.apache.spark.sql.connector.catalog.{CatalogV2Util, Column => V2Column, TableChange}
import org.apache.spark.sql.connector.expressions.{BucketTransform, Transform}
import org.apache.spark.sql.types.StructType

/** Bridge to Spark 4's private[sql] catalog utilities, needed by the
  * graft SQL catalog plugin (graft.catalog.GraftCatalog): column-model
  * conversion, ALTER TABLE schema-change application, and bucket-transform
  * introspection are all `private[sql]` despite being the canonical
  * implementations every catalog uses. */
object GraftCatalogBridge {
  def v2ColumnsToStructType(cols: Array[V2Column]): StructType =
    CatalogV2Util.v2ColumnsToStructType(cols)

  def structTypeToV2Columns(schema: StructType): Array[V2Column] =
    CatalogV2Util.structTypeToV2Columns(schema)

  def applySchemaChanges(schema: StructType,
      changes: Seq[TableChange]): StructType =
    CatalogV2Util.applySchemaChanges(schema, changes, None, "ALTER TABLE")

  /** (bucket key column names, bucket count) when `t` is a bucket
    * transform. */
  def asBucket(t: Transform): Option[(Seq[String], Int)] = t match {
    case b: BucketTransform =>
      Some((b.columns.map(_.fieldNames.mkString(".")).toSeq,
        b.numBuckets.value().asInstanceOf[Number].intValue()))
    case _ => None
  }
}
