package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute,
  AttributeReference, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.catalog.GraftSqlTable

/** Analyzer rule: auto-inject the implied `_bucket = _bucket` equality
  * into composite-key joins of co-bucketed graft catalog tables.
  *
  * Spark's storage-partitioned joins (SPARK-37375) resolve only
  * SINGLE-reference bucket transforms, so composite-key graft tables
  * report `identity(_bucket)` instead ([[org.apache.spark.sql
  * .GraftBucketedScan]]); the documented workaround was the user
  * hand-writing `a._bucket = b._bucket` into the join. At 100 TB the
  * forgotten hand-written term IS the join cost — both inputs
  * re-materialized across the cluster — so this rule adds it for them:
  * when BOTH join sides scan graft tables whose snapshots share one
  * bucket count, and the equi-condition already equates the FULL bucket
  * column set position-for-position (the bucket id is a pure,
  * order-sensitive hash of those columns, so the equality is implied —
  * never changes the result, for any join type), the condition gains
  * `left._bucket = right._bucket` and planning co-locates shuffle-free.
  *
  * Runs at ANALYSIS: the `_bucket` metadata column must still be
  * threadable into the relation output (Spark's own AddMetadataColumns
  * picks up the new reference exactly as it does for a hand-written
  * term); by optimization time the scan is built and pruned. The rule
  * stands down — leaving the plan untouched and correct, just shuffled —
  * when a side is not a graft scan, holds more than one graft scan, the
  * bucket counts differ, a rename/alias hides the key attributes, or
  * the key set is only partially equated.
  *
  * Install-time conf: constructing the rule (once per session) sets
  * `spark.sql.requireAllClusterKeysForCoPartition=false`, the session
  * conf SPJ needs whenever the partition key is a strict subset of the
  * join keys (the same conf Iceberg's SPJ guide prescribes; plan-choice
  * leniency only, never correctness). A later explicit user set wins —
  * the rule never re-asserts it.
  *
  * Safety guard (round-11 advice; hardened round 13): a HAND-WRITTEN
  * `_bucket = _bucket` term between graft scans with DIFFERENT bucket
  * counts silently drops matching rows — the bucket id is only
  * comparable across one layout. When the term PROVABLY binds the two
  * relations' metadata bucket columns (exprId provenance), analysis
  * FAILS with the reason (`graft.spj.allowMismatchedBucketTerm=true`
  * opts back into warn-and-run); unprovable name matches only warn.
  */
class GraftSpjInjectRule(spark: SparkSession) extends Rule[LogicalPlan] {
  try {
    // an explicit user choice (spark-defaults or an earlier set) wins;
    // only the DEFAULT is overridden
    val k = "spark.sql.requireAllClusterKeysForCoPartition"
    if (!spark.sessionState.conf.contains(k)) spark.conf.set(k, "false")
  } catch { case _: Throwable => () } // session still warming up: skip

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case j @ Join(_, _, _, Some(cond), _)
          if j.childrenResolved && cond.resolved =>
        inject(j, cond).getOrElse(j)
    }

  /** The single graft relation under one join side, or None (zero or
    * several — ambiguous, stand down). */
  private def graftSide(p: LogicalPlan)
      : Option[(DataSourceV2Relation, GraftSqlTable)] =
    p.collect {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlTable] =>
        r -> r.table.asInstanceOf[GraftSqlTable]
    } match {
      case Seq(one) => Some(one)
      case _ => None
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Attribute pairs the condition equates (either operand order). */
  private def equiPairs(cond: Expression)
      : Seq[(AttributeReference, AttributeReference)] =
    conjuncts(cond).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
      case EqualNullSafe(a: AttributeReference, b: AttributeReference) =>
        (a, b)
    }

  /** The side's output attribute for a relation column, traced by
    * exprId so renames/aliases (fresh exprIds) make the rule stand
    * down instead of guessing. */
  private def attrOf(rel: DataSourceV2Relation, name: String)
      : Option[Attribute] =
    rel.output.find(a => conf.resolver(a.name, name))

  /** The RELATION's `_bucket` metadata attribute, required to be the
    * ONLY `_bucket` visible at the side level: a user-projected alias
    * named `_bucket` (fresh exprId) must make the rule stand down, or
    * the injected equality would bind an arbitrary user column and
    * silently drop rows. */
  private def bucketAttr(side: LogicalPlan,
      rel: DataSourceV2Relation): Option[Attribute] = {
    val relAttr = (rel.output ++ rel.metadataOutput)
      .find(a => conf.resolver(a.name, "_bucket"))
    val visible = (side.output ++ side.metadataOutput)
      .filter(a => conf.resolver(a.name, "_bucket"))
    (relAttr, visible) match {
      case (Some(ra), Seq(single)) if single.exprId == ra.exprId =>
        Some(single)
      case _ => None // shadowed, duplicated, or not threadable
    }
  }

  private def inject(j: Join, cond: Expression): Option[Join] = {
    val pairs = equiPairs(cond)
    if (pairs.isEmpty) return None
    val (lRel, lt) = graftSide(j.left).getOrElse(return None)
    val (rRel, rt) = graftSide(j.right).getOrElse(return None)

    // the advice guard: a hand-written _bucket equality across
    // MISMATCHED layouts drops rows. When the term PROVABLY binds the
    // two graft metadata bucket columns (exprId provenance — not a
    // user data column that happens to be named _bucket), this is a
    // certainly-wrong query: FAIL at analysis instead of warning (the
    // execution-time [[GraftSpjGuardRule]] backstop only runs under
    // AQE, so a non-AQE session would otherwise silently drop rows).
    // `graft.spj.allowMismatchedBucketTerm=true` opts back into the
    // warn-and-shuffle behavior for the user who truly means it;
    // unprovable cases (aliased/re-projected attrs) keep the warning.
    val handPairs = pairs.filter { case (a, b) =>
      conf.resolver(a.name, "_bucket") && conf.resolver(b.name, "_bucket") }
    if (handPairs.nonEmpty) {
      if (lt.spjBucketCount != rt.spjBucketCount) {
        def relBucket(rel: DataSourceV2Relation) =
          (rel.output ++ rel.metadataOutput)
            .find(a => conf.resolver(a.name, "_bucket")).map(_.exprId)
        val (lb, rb) = (relBucket(lRel), relBucket(rRel))
        val proven = handPairs.exists { case (a, b) =>
          (lb.contains(a.exprId) && rb.contains(b.exprId)) ||
            (lb.contains(b.exprId) && rb.contains(a.exprId)) }
        val msg = s"join condition equates _bucket between " +
          s"'${lt.name()}' (${lt.spjBucketCount} buckets) and " +
          s"'${rt.name()}' (${rt.spjBucketCount} buckets): bucket ids " +
          "are NOT comparable across different bucket counts — this " +
          "predicate silently drops matching rows. Remove it; the " +
          "layouts cannot storage-partition-join."
        val allow = conf.getConfString(
          "graft.spj.allowMismatchedBucketTerm", "false").toBoolean
        if (proven && !allow)
          throw new org.apache.spark.sql.AnalysisException(
            "USER_RAISED_EXCEPTION", Map("errorMessage" -> (msg +
              " (set graft.spj.allowMismatchedBucketTerm=true to " +
              "run it anyway)")))
        logWarning(msg)
      }
      return None // already present (or explicitly wrong): nothing to add
    }

    val lCols = lt.spjBucketCols
    val rCols = rt.spjBucketCols
    if (lCols.size <= 1 || lCols.size != rCols.size) return None
    if (lt.spjBucketCount != rt.spjBucketCount) return None

    // full positional coverage: bucket = hash folded over the columns
    // IN ORDER, so left col i must be equated with right col i
    val covered = lCols.indices.forall { i =>
      (attrOf(lRel, lCols(i)), attrOf(rRel, rCols(i))) match {
        case (Some(la), Some(ra)) => pairs.exists { case (a, b) =>
          (a.exprId == la.exprId && b.exprId == ra.exprId) ||
            (a.exprId == ra.exprId && b.exprId == la.exprId) }
        case _ => false
      }
    }
    if (!covered) return None

    for {
      lb <- bucketAttr(j.left, lRel)
      rb <- bucketAttr(j.right, rRel)
    } yield j.copy(condition = Some(And(cond, EqualTo(lb, rb))))
  }
}
