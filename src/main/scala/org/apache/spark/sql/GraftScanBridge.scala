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

/** Manifest-level data skipping for the graft catalog scan: a deferred
  * builder that runs the normal pushdown dialogue against a probe built
  * over ALL files, and at `build()` — once the pushed filters are
  * known — drops every file whose per-column [min,max] ranges the
  * filters exclude (ANY stats column's interval disjoint ⇒ the file
  * cannot match), replaying the recorded pruning/pushdown onto a
  * rebuilt scan over the survivors. Skipping is conservative: files or
  * columns without stats always survive, strict bounds widen to
  * inclusive, and un-analyzable predicates constrain nothing — the
  * pushed filters still run inside every scanned file, so pruning can
  * only remove files that cannot contain matches. One file is always
  * retained (an empty list could not partition-infer `_bucket` and
  * would change the scan schema). Lives here for the same
  * `private[sql]` reason as [[GraftScanBridge]]. */
/** Shared interval analysis for manifest-level data skipping: maps
  * filter expressions to per-column [lo, hi] constraints comparable
  * against the footer-harvested file stats. Used by the catalog scan
  * ([[GraftFileSkippingBuilder]], analyzed `AttributeReference`s) and
  * by `GraftTable.deleteWhere`'s discovery pass (unanalyzed `Column`
  * trees, `UnresolvedAttribute`s). Conservative by construction: an
  * un-analyzable predicate constrains nothing, and a file lacking
  * stats for a constrained column always survives. */
object GraftFileSkipping {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Cast,
    EqualTo, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan,
    LessThanOrEqual, Literal}

  private def asLong(v: Any): Option[Long] = v match {
    case i: java.lang.Integer => Some(i.longValue)
    case i: java.lang.Long => Some(i.longValue)
    case i: java.lang.Short => Some(i.longValue)
    case _ => None
  }

  /** Integral literal, through any foldable cast the analyzer wrapped
    * around it (`id < 5` on a bigint column arrives as
    * `id < cast(5 as bigint)` in un-optimized trees). */
  private object LitLong {
    def unapply(e: Expression): Option[Long] = e match {
      case l: Literal => asLong(l.value)
      case c: Cast if c.child.isInstanceOf[Literal] && c.foldable =>
        try asLong(c.eval(null)) catch {
          case scala.util.control.NonFatal(_) => None
        }
      case _ => None
    }
  }

  /** Per-column interval [lo, hi] a conjunct constrains — empty map =
    * no constraint from this conjunct. Values normalize to Long (ints,
    * longs, date days, timestamp micros — matching the footer stats). */
  def intervals(e: Expression): Map[String, (Long, Long)] = {
    def nameOf(a: Expression): Option[String] = a match {
      case r: AttributeReference => Some(r.name)
      case u: UnresolvedAttribute => Some(u.name)
      case _ => None
    }
    def one(a: Expression, r: (Long, Long)): Map[String, (Long, Long)] =
      nameOf(a).map(_ -> r).toMap
    e match {
      case CAnd(l, r) => meet(intervals(l), intervals(r))
      case EqualTo(a, LitLong(v)) => one(a, (v, v))
      case EqualTo(LitLong(v), a) => one(a, (v, v))
      case GreaterThan(a, LitLong(v)) => one(a, (v, Long.MaxValue))
      case GreaterThanOrEqual(a, LitLong(v)) => one(a, (v, Long.MaxValue))
      case LessThan(a, LitLong(v)) => one(a, (Long.MinValue, v))
      case LessThanOrEqual(a, LitLong(v)) => one(a, (Long.MinValue, v))
      case GreaterThan(LitLong(v), a) => one(a, (Long.MinValue, v))
      case GreaterThanOrEqual(LitLong(v), a) => one(a, (Long.MinValue, v))
      case LessThan(LitLong(v), a) => one(a, (v, Long.MaxValue))
      case LessThanOrEqual(LitLong(v), a) => one(a, (v, Long.MaxValue))
      case In(a, ls) =>
        val vs = ls.flatMap(LitLong.unapply)
        if (vs.size == ls.size && vs.nonEmpty) one(a, (vs.min, vs.max))
        else Map.empty
      case InSet(a, vs) if vs.nonEmpty =>
        val longs = vs.toSeq.flatMap(asLong)
        if (longs.size == vs.size) one(a, (longs.min, longs.max))
        else Map.empty
      case _ => Map.empty
    }
  }

  /** Conjuncts compose by per-column interval intersection. */
  def meet(x: Map[String, (Long, Long)],
      y: Map[String, (Long, Long)]): Map[String, (Long, Long)] =
    (x.keySet ++ y.keySet).map { k =>
      (x.get(k), y.get(k)) match {
        case (Some((a, b)), Some((c, d))) =>
          k -> (math.max(a, c), math.min(b, d))
        case (v, w) => k -> v.orElse(w).get
      }
    }.toMap

  def bounds(conjuncts: Seq[Expression]): Map[String, (Long, Long)] =
    conjuncts.map(intervals)
      .foldLeft(Map.empty[String, (Long, Long)])(meet)

  /** True iff the file's stats cannot exclude the bounds (missing
    * stats/columns ⇒ keep). */
  def survives(stats: Option[Map[String, (Long, Long)]],
      bounds: Map[String, (Long, Long)]): Boolean =
    stats.forall(cs => bounds.forall { case (c, (lo, hi)) =>
      cs.get(c).forall { case (mn, mx) => hi >= mn && lo <= mx } })

  // ------------------------------------------------- string intervals
  // Query-side bounds for STRING columns: [lo, hi] with hi = None for
  // unbounded above ("" is the natural unbounded-below). Strict
  // comparisons widen to inclusive — conservative, like the long path.

  private object LitStr {
    import org.apache.spark.unsafe.types.UTF8String
    def unapply(e: Expression): Option[String] = e match {
      case l: Literal if l.dataType ==
          org.apache.spark.sql.types.StringType => l.value match {
        case u: UTF8String => Some(u.toString)
        case s: String => Some(s)
        case _ => None
      }
      case c: Cast if c.child.isInstanceOf[Literal] && c.foldable &&
          c.dataType == org.apache.spark.sql.types.StringType =>
        try c.eval(null) match {
          case u: UTF8String => Some(u.toString)
          case _ => None
        } catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }
  }

  def strIntervals(e: Expression)
      : Map[String, (String, Option[String])] = {
    def nameOf(a: Expression): Option[String] = a match {
      case r: AttributeReference => Some(r.name)
      case u: UnresolvedAttribute => Some(u.name)
      case _ => None
    }
    def one(a: Expression, r: (String, Option[String]))
        : Map[String, (String, Option[String])] =
      nameOf(a).map(_ -> r).toMap
    e match {
      case CAnd(l, r) => strMeet(strIntervals(l), strIntervals(r))
      case EqualTo(a, LitStr(v)) => one(a, (v, Some(v)))
      case EqualTo(LitStr(v), a) => one(a, (v, Some(v)))
      case GreaterThan(a, LitStr(v)) => one(a, (v, None))
      case GreaterThanOrEqual(a, LitStr(v)) => one(a, (v, None))
      case LessThan(a, LitStr(v)) => one(a, ("", Some(v)))
      case LessThanOrEqual(a, LitStr(v)) => one(a, ("", Some(v)))
      case GreaterThan(LitStr(v), a) => one(a, ("", Some(v)))
      case GreaterThanOrEqual(LitStr(v), a) => one(a, ("", Some(v)))
      case LessThan(LitStr(v), a) => one(a, (v, None))
      case LessThanOrEqual(LitStr(v), a) => one(a, (v, None))
      case In(a, ls) =>
        val vs = ls.flatMap(LitStr.unapply)
        if (vs.size == ls.size && vs.nonEmpty)
          one(a, (vs.min, Some(vs.max)))
        else Map.empty
      case InSet(a, vs) if vs.nonEmpty =>
        val ss = vs.toSeq.flatMap {
          case u: org.apache.spark.unsafe.types.UTF8String =>
            Some(u.toString)
          case s: String => Some(s)
          case _ => None
        }
        if (ss.size == vs.size) one(a, (ss.min, Some(ss.max)))
        else Map.empty
      case _ => Map.empty
    }
  }

  def strMeet(x: Map[String, (String, Option[String])],
      y: Map[String, (String, Option[String])])
      : Map[String, (String, Option[String])] =
    (x.keySet ++ y.keySet).map { k =>
      (x.get(k), y.get(k)) match {
        case (Some((a, b)), Some((c, d))) =>
          val hi = (b, d) match {
            case (Some(p), Some(q)) => Some(if (p < q) p else q)
            case (p, q) => p.orElse(q)
          }
          k -> (if (a > c) a else c, hi)
        case (v, w) => k -> v.orElse(w).get
      }
    }.toMap

  def strBounds(conjuncts: Seq[Expression])
      : Map[String, (String, Option[String])] =
    conjuncts.map(strIntervals)
      .foldLeft(Map.empty[String, (String, Option[String])])(strMeet)

  /** File string stats are INCLUSIVE bounds (lower = truncated min ≤
    * every value; upper = truncated-incremented max ≥ every value), so
    * a file is skippable only when the query interval lies strictly
    * outside. Missing stats/columns ⇒ keep. */
  def survivesStr(stats: Option[Map[String, (String, String)]],
      bounds: Map[String, (String, Option[String])]): Boolean =
    stats.forall(cs => bounds.forall { case (c, (qLo, qHi)) =>
      cs.get(c).forall { case (fLo, fUp) =>
        qHi.forall(_ >= fLo) && qLo <= fUp }
    })
}

final class GraftFileSkippingBuilder(
    mk: Seq[String] => ScanBuilder, allFiles: Seq[String],
    statsOf: String => Option[Map[String, (Long, Long)]],
    strStatsOf: String => Option[Map[String, (String, String)]] =
      _ => None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters
    with connector.read.SupportsPushDownAggregates {

  private val probe = mk(allFiles)
  private var prunedSchema: Option[StructType] = None
  private var pushed: Seq[Expression] = Nil
  private var pushedAgg: Option[connector.expressions.aggregate.Aggregation] =
    None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    prunedSchema = Some(requiredSchema)
    probe match {
      case s: SupportsPushDownRequiredColumns => s.pruneColumns(requiredSchema)
      case _ => ()
    }
  }

  // aggregate pushdown passthrough (footer-only COUNT/MIN/MAX): record
  // for the rebuilt-survivors replay — manifest-level file skipping and
  // footer aggregation COMPOSE (fewer files, each answered from its
  // footer)
  override def supportCompletePushDown(
      agg: connector.expressions.aggregate.Aggregation): Boolean =
    probe match {
      case s: connector.read.SupportsPushDownAggregates =>
        s.supportCompletePushDown(agg)
      case _ => false
    }
  override def pushAggregation(
      agg: connector.expressions.aggregate.Aggregation): Boolean =
    probe match {
      case s: connector.read.SupportsPushDownAggregates
          if s.pushAggregation(agg) =>
        pushedAgg = Some(agg); true
      case _ => false
    }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushed = filters
    probe match {
      case s: SupportsPushDownCatalystFilters => s.pushFilters(filters)
      case _ => filters
    }
  }

  override def pushedFilters: Array[Predicate] = probe match {
    case s: SupportsPushDownCatalystFilters => s.pushedFilters
    case _ => Array.empty
  }

  override def build(): Scan = {
    val bounds = GraftFileSkipping.bounds(pushed)
    val sBounds = GraftFileSkipping.strBounds(pushed)
    val keep =
      if (bounds.isEmpty && sBounds.isEmpty) allFiles
      else allFiles.filter(p =>
        GraftFileSkipping.survives(statsOf(p), bounds) &&
        GraftFileSkipping.survivesStr(strStatsOf(p), sBounds))
    if (keep.size == allFiles.size) probe.build()
    else {
      val survivors = if (keep.nonEmpty) keep else allFiles.take(1)
      val b = mk(survivors)
      // replay the pushdown dialogue in Spark's own order:
      // filters → aggregation → column pruning
      b match {
        case s: SupportsPushDownCatalystFilters => s.pushFilters(pushed)
        case _ => ()
      }
      (b, pushedAgg) match {
        case (s: connector.read.SupportsPushDownAggregates, Some(a)) =>
          s.pushAggregation(a)
        case _ => ()
      }
      (b, prunedSchema) match {
        case (s: SupportsPushDownRequiredColumns, Some(sch)) =>
          s.pruneColumns(sch)
        case _ => ()
      }
      b.build()
    }
  }
}
