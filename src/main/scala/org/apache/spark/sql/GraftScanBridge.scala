package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns, SupportsRuntimeFiltering}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Bridge for the graft catalog's renamed-column reads: wraps the file
  * scan so LOGICAL column names (the table's visible schema) translate
  * to PHYSICAL on-disk names on the way in (column pruning, filter
  * pushdown) and back on the way out (`readSchema`). Row/columnar data
  * is positional, so the delegate's readers pass through untouched.
  * Lives in this package because `SupportsPushDownCatalystFilters` —
  * the interface Spark's file sources actually push through — is
  * `private[sql]`. */
object GraftScanBridge {

  /** `logicalToPhysical` must contain only genuine renames (l != p). */
  def mappedBuilder(inner: ScanBuilder,
      logicalToPhysical: Map[String, String]): ScanBuilder =
    if (logicalToPhysical.isEmpty) inner
    else new MappedBuilder(inner, logicalToPhysical)

  private def renameExpr(e: Expression, m: Map[String, String]): Expression =
    e.transform {
      case a: AttributeReference if m.contains(a.name) => a.withName(m(a.name))
    }

  private final class MappedBuilder(inner: ScanBuilder,
      l2p: Map[String, String]) extends ScanBuilder
      with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters {
    private val p2l = l2p.map(_.swap)

    override def pruneColumns(requiredSchema: StructType): Unit = inner match {
      case s: SupportsPushDownRequiredColumns => s.pruneColumns(StructType(
        requiredSchema.fields.map(f =>
          f.copy(name = l2p.getOrElse(f.name, f.name)))))
      case _ => ()
    }

    override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
      inner match {
        case s: SupportsPushDownCatalystFilters =>
          // residuals return to the post-scan Filter: restore logical names
          s.pushFilters(filters.map(renameExpr(_, l2p)))
            .map(renameExpr(_, p2l))
        case _ => filters
      }

    override def pushedFilters: Array[Predicate] = inner match {
      case s: SupportsPushDownCatalystFilters => s.pushedFilters
      case _ => Array.empty
    }

    override def build(): Scan = new MappedScan(inner.build(), p2l)
  }

  private final class MappedScan(inner: Scan, p2l: Map[String, String])
      extends Scan with SupportsRuntimeFiltering {
    override def readSchema(): StructType = StructType(
      inner.readSchema().fields.map(f =>
        f.copy(name = p2l.getOrElse(f.name, f.name))))
    override def toBatch: Batch = inner.toBatch
    override def description(): String = inner.description()
    // runtime group filtering (`_bucket` is never renamed) passes through
    override def filterAttributes(): Array[NamedReference] = inner match {
      case s: SupportsRuntimeFiltering => s.filterAttributes()
      case _ => Array.empty
    }
    override def filter(filters: Array[sources.Filter]): Unit = inner match {
      case s: SupportsRuntimeFiltering => s.filter(filters)
      case _ => ()
    }
  }
}
