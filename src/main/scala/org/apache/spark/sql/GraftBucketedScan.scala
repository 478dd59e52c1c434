package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow,
  Murmur3HashFunction}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions,
  NamedReference}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey,
  InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics,
  SupportsPushDownRequiredColumns, SupportsReportOrdering,
  SupportsReportPartitioning, SupportsReportStatistics,
  SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{
  KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** Storage-partitioned joins for graft catalog tables (the public
  * Spark 3.3+ SPJ mechanism, SPARK-37375, the one Iceberg uses): the
  * scan reports `KeyGroupedPartitioning(bucket(n, keys))` with one
  * input partition per live bucket, and the catalog exposes the bucket
  * function, so a join of two graft tables bucketed the same way on the
  * join keys plans with NO shuffle on either side — at 100 TB the
  * exchange this removes IS the join cost (both inputs re-materialized
  * across the cluster). Requires
  * `spark.sql.sources.v2.bucketing.enabled=true`; with
  * `...pushPartValues.enabled` (default true) one side may even hold
  * empty buckets.
  *
  * The wrapper regroups the delegate parquet scan's planned file splits
  * by the `_bucket=N` directory component — the same physical layout
  * the GraftTable writer produces — so the report is true by
  * construction: every row of partition k hashes to bucket k under
  * `bucket(n, keys)` = `pmod(hash(keys), n)`, exactly
  * [[GraftBucketFunction]]. Pushdown, column pruning, runtime group
  * filtering and the vectorized readers all pass through untouched.
  *
  * Known Spark limitation (pinned by a spec): V2ExpressionUtils
  * resolves only SINGLE-reference bucket transforms, so the
  * `bucket(n, keys)` report is exploited for one-column bucket keys;
  * multi-column keys cannot resolve it until Spark lifts the
  * restriction. COMPOSITE-KEY WORKAROUND: multi-key tables instead
  * report `identity(_bucket)` — the bucket id the writer already
  * materializes as the `_bucket=N` partition directory, surfaced by the
  * catalog as a metadata column. A join that ADDS `a._bucket =
  * b._bucket` to its (full composite key) equi-condition resolves the
  * single-reference identity claim on both sides and plans shuffle-free
  * today (additionally needs
  * `spark.sql.requireAllClusterKeysForCoPartition=false` — the
  * partition key is a strict subset of the join keys, the same session
  * conf Iceberg's SPJ guide prescribes). The added predicate is implied (the bucket id is a pure
  * function of the keys) PROVIDED both tables share one bucket count —
  * across different counts it would wrongly drop matches, the same
  * precondition SPJ itself has; queries that never reference `_bucket`
  * are untouched (the claim fails to resolve and planning falls back to
  * the ordinary shuffle).
  */
object GraftBucketedScan {
  /** Wrap `inner` so its scan reports bucket(n, keyCols) key-grouped
    * partitioning. `inner` may be the raw parquet builder, the renamed-
    * column bridge, or the file-skipping builder — the wrapper only
    * touches partition planning. Non-empty `sortCols` = every scanned
    * bucket holds at most ONE base file (the state maintenance
    * compaction restores), so each bucket partition streams out sorted
    * by the writer's sort columns (the table keys) end-to-end and the
    * scan additionally reports that ordering
    * ([[SupportsReportOrdering]]) — with
    * `spark.sql.sources.v2.bucketing.sorting.enabled` the SPJ
    * sort-merge join then drops its per-partition sorts too. */
  def builder(inner: ScanBuilder, nBuckets: Int, keyCols: Seq[String],
      sortCols: Seq[String] = Nil): ScanBuilder =
    new BucketedBuilder(inner, nBuckets, keyCols, sortCols)

  /** The partitioning expression the scan claims: bucket(n, key) for
    * single-key tables (joins on the key SPJ with no query change);
    * identity(_bucket) for composite keys (the documented workaround —
    * Spark cannot resolve multi-reference bucket transforms). */
  private def claimOf(nBuckets: Int, keyCols: Seq[String])
      : connector.expressions.Expression =
    if (keyCols.size == 1) Expressions.bucket(nBuckets, keyCols: _*)
    else Expressions.identity("_bucket")

  private final class BucketedBuilder(inner: ScanBuilder, nBuckets: Int,
      keyCols: Seq[String], sortCols: Seq[String]) extends ScanBuilder
      with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters
      with connector.read.SupportsPushDownAggregates {
    // aggregate pushdown (COUNT/MIN/MAX answered from parquet footers,
    // spark.sql.parquet.aggregatePushDown): forward to the delegate —
    // but a pushed aggregation changes the scan's rows to per-file
    // aggregates that carry NO key columns, so the bucket partitioning
    // and ordering claims no longer describe them; build() then returns
    // the delegate scan unwrapped.
    private var aggPushed = false
    override def supportCompletePushDown(
        agg: connector.expressions.aggregate.Aggregation): Boolean =
      inner match {
        case s: connector.read.SupportsPushDownAggregates =>
          s.supportCompletePushDown(agg)
        case _ => false
      }
    override def pushAggregation(
        agg: connector.expressions.aggregate.Aggregation): Boolean =
      inner match {
        case s: connector.read.SupportsPushDownAggregates =>
          aggPushed = s.pushAggregation(agg); aggPushed
        case _ => false
      }
    override def pruneColumns(requiredSchema: StructType): Unit =
      inner match {
        case s: SupportsPushDownRequiredColumns =>
          s.pruneColumns(requiredSchema)
        case _ => ()
      }
    override def pushFilters(
        filters: Seq[catalyst.expressions.Expression])
        : Seq[catalyst.expressions.Expression] = inner match {
      case s: SupportsPushDownCatalystFilters => s.pushFilters(filters)
      case _ => filters
    }
    override def pushedFilters
        : Array[connector.expressions.filter.Predicate] = inner match {
      case s: SupportsPushDownCatalystFilters => s.pushedFilters
      case _ => Array.empty
    }
    override def build(): Scan =
      if (aggPushed) inner.build()
      else new BucketedScan(inner.build(), nBuckets, keyCols, sortCols)
  }

  private val BucketDir = ".*[/\\\\]_bucket=(\\d+)[/\\\\].*".r

  /** One key-grouped partition: all of one bucket's file splits, keyed
    * by the bucket id. The delegate's reader factory consumes the
    * unwrapped [[FilePartition]]. Public so plan-inspection (specs,
    * debugging) can reach the underlying file list. */
  final case class BucketPartition(fp: FilePartition,
      bucket: Int) extends InputPartition with HasPartitionKey {
    override def partitionKey(): InternalRow =
      new GenericInternalRow(Array[Any](bucket))
    override def preferredLocations(): Array[String] =
      fp.preferredLocations()
  }

  private final class UnwrappingReaderFactory(
      inner: PartitionReaderFactory) extends PartitionReaderFactory {
    private def unwrap(p: InputPartition): InputPartition = p match {
      case b: BucketPartition => b.fp
      case other => other
    }
    override def createReader(p: InputPartition) =
      inner.createReader(unwrap(p))
    override def createColumnarReader(p: InputPartition) =
      inner.createColumnarReader(unwrap(p))
    override def supportColumnarReads(p: InputPartition): Boolean =
      inner.supportColumnarReads(unwrap(p))
  }

  /** The bucket count a built graft scan CAPTURED at planning (the
    * layout of the exact file list it will read), or None for non-graft
    * scans — the physical SPJ guard compares the two join sides' counts
    * right before execution, closing the analysis-to-planning window
    * where a rebucket could invalidate a `_bucket = _bucket` term. */
  def bucketCountOf(scan: Scan): Option[Int] = scan match {
    case b: BucketedScan => Some(b.nBuckets)
    case _ => None
  }

  private final class BucketedScan(inner: Scan, val nBuckets: Int,
      keyCols: Seq[String], sortCols: Seq[String]) extends Scan
      with Batch with SupportsReportPartitioning
      with SupportsReportOrdering with SupportsReportStatistics
      with SupportsRuntimeFiltering {
    override def readSchema(): StructType = inner.readSchema()
    override def description(): String =
      s"${inner.description()} (bucket($nBuckets, ${keyCols.mkString(",")}))"
    override def toBatch: Batch = this

    // planned fresh on every call: runtime filtering mutates the inner
    // scan's file set between planning and execution. Splits within a
    // bucket order by (path, offset) so a partition reads its (single,
    // key-sorted) file's row groups in order — the ordering report
    // depends on it.
    override def planInputPartitions(): Array[InputPartition] = {
      val raw = inner.toBatch.planInputPartitions()
      val splits = raw.flatMap {
        case fp: FilePartition => fp.files.map(f => f -> bucketOf(f))
        case _ => return raw // non-file delegate: no regrouping
      }
      if (splits.exists(_._2.isEmpty)) return raw
      splits.groupBy(_._2.get).toSeq.sortBy(_._1).zipWithIndex.map {
        case ((b, fs), i) =>
          val ordered = fs.map(_._1)
            .sortBy(f => (f.filePath.toString, f.start))
          BucketPartition(FilePartition(i, ordered), b)
      }.toArray[InputPartition]
    }

    private def bucketOf(
        f: org.apache.spark.sql.execution.datasources.PartitionedFile)
        : Option[Int] = f.filePath.toString match {
      case BucketDir(b) => Some(b.toInt)
      case _ => None
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new UnwrappingReaderFactory(inner.toBatch.createReaderFactory())

    // partition COUNT for the partitioning claim is cached: planning
    // runs O(files) driver work and outputPartitioning() is consulted
    // more than once per query. toBatch keeps planning fresh (the
    // runtime-filtering contract mutates the file set between planning
    // and execution); only this count is memoized — it describes the
    // pre-runtime-filter layout, which is what the claim is about.
    private lazy val claimedPartitionCount = planInputPartitions().length

    override def outputPartitioning(): Partitioning =
      new KeyGroupedPartitioning(
        Array(claimOf(nBuckets, keyCols)), claimedPartitionCount)

    /** Within one bucket partition the single base file is key-sorted
      * by the writer (`sortWithinPartitions(_bucket, keys)` — `_bucket`
      * constant inside a partition), so rows stream out ordered by the
      * keys: ASC NULLS FIRST, the writer sort's defaults. Reported only
      * when the manifest shows ≤1 file per scanned bucket (the
      * compacted steady state); multi-file buckets concatenate sorted
      * runs, which is NOT sorted. */
    override def outputOrdering()
        : Array[connector.expressions.SortOrder] =
      sortCols.map(k => Expressions.sort(Expressions.column(k),
        connector.expressions.SortDirection.ASCENDING)).toArray

    /** Pass the delegate's size/row estimates through — hiding them
      * would blind broadcast planning for every catalog scan. */
    override def estimateStatistics(): Statistics = inner match {
      case s: SupportsReportStatistics => s.estimateStatistics()
      case _ => new Statistics {
        override def sizeInBytes() = java.util.OptionalLong.empty()
        override def numRows() = java.util.OptionalLong.empty()
      }
    }

    // runtime group filtering (row-level ops filter on `_bucket`)
    override def filterAttributes(): Array[NamedReference] = inner match {
      case s: SupportsRuntimeFiltering => s.filterAttributes()
      case _ => Array.empty
    }
    override def filter(filters: Array[sources.Filter]): Unit =
      inner match {
        case s: SupportsRuntimeFiltering => s.filter(filters)
        case _ => ()
      }
  }
}

/** The catalog-exposed `bucket` function backing the SPJ transform:
  * `bucket(n, keys...)` = `pmod(hash(keys...), n)` — bit-identical to
  * the GraftTable writer's bucket assignment (`functions.hash` =
  * Murmur3 folded across columns from seed 42), pinned by a property
  * spec. Spark resolves it through the catalog when matching the two
  * sides' partition transforms, and evaluates it only if it must
  * shuffle a non-aligned side to match
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`). */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, cols...): pmod(murmur3_hash(cols...), n) — graft bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket(n, cols...) needs at least 2 args, got $inputType")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket(n, ...): n must be INT, got ${inputType.fields.head}")
    new Bound(StructType(inputType.fields.drop(1)))
  }

  private final class Bound(args: StructType)
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] =
      IntegerType +: args.fields.map(_.dataType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    /** Both join sides must canonicalize to the SAME function for the
      * key-grouped specs to match. */
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      var h = 42L
      var i = 0
      while (i < args.length) {
        h = Murmur3HashFunction.hash(
          input.get(i + 1, args(i).dataType), args(i).dataType, h)
        i += 1
      }
      Integer.valueOf(((h.toInt % n) + n) % n)
    }
  }
}
