package graft.sources

import org.apache.spark.scheduler.{SparkListener,
  SparkListenerBlockManagerAdded, SparkListenerExecutorMetricsUpdate,
  SparkListenerExecutorRemoved, SparkListenerStageExecutorMetrics}

import scala.collection.concurrent.TrieMap

/** Cluster-side memory signal for ST7 admission (reference
  * `etl/src/memory/memory_monitor.rs` polls the PROCESS that applies
  * batches; on Spark that process is every executor, not the driver).
  *
  * The default [[CdcLogSource.memoryUsage]] probes the driver JVM —
  * correct in `local[n]` where executor == driver, but on a real
  * cluster the heap that fills during an apply is an EXECUTOR's, and
  * the driver's own usage says nothing about it. This listener tracks
  * each executor's JVM heap from the scheduler's metrics events
  * (`SparkListenerExecutorMetricsUpdate` at heartbeat cadence, plus the
  * per-stage peaks in `SparkListenerStageExecutorMetrics`) and reports
  * the WORST live executor's usage fraction, floored by the driver's
  * own (the driver still brokers every manifest commit, so its
  * pressure stays part of the signal).
  *
  * DENOMINATORS are per-executor and come from the executor's OWN
  * runtime, not a config string: each executor's
  * `SparkListenerBlockManagerAdded` reports the on-heap unified-memory
  * region Spark computed from that JVM's actual `Runtime.maxMemory`
  * — `(heap - reserved) × spark.memory.fraction` — which this listener
  * INVERTS back to the real max heap. `spark.executor.memory` is only
  * the fallback for executors whose registration predates the listener:
  * a cluster sized via `--executor-memory`, heterogeneous resource
  * profiles, or memory-fraction tuning would make the config-string
  * denominator wrong in either direction, and an over-provisioned
  * reading UNDER-reports pressure — the non-conservative direction for
  * an admission signal (round-13 verdict #3).
  *
  * A hung executor keeps its last reported fraction until the
  * scheduler removes it — stale-high is the conservative side for an
  * admission signal. Removal drops the entry so a replaced executor
  * cannot pin admission down forever.
  */
final class ExecutorMemorySignal(fallbackHeapBytes: Long,
    memoryFraction: Double = 0.6,
    reservedBytes: Long = ExecutorMemorySignal.ReservedSystemBytes,
    /** Configured `spark.memory.offHeap.size` when
      * `spark.memory.offHeap.enabled` — an off-heap-tuned cluster runs
      * its execution/storage memory OUTSIDE the GC heap, so a
      * heap-only watch under-reports exactly the region that fills
      * during an apply. 0 = off-heap disabled (heap-only watch). */
    offHeapBytes: Long = 0L)
    extends SparkListener {
  require(fallbackHeapBytes > 0, "executor max heap must be positive")
  require(memoryFraction > 0 && memoryFraction <= 1,
    s"spark.memory.fraction out of range: $memoryFraction")
  require(offHeapBytes >= 0, "off-heap size must be non-negative")

  /** execId → last observed heap-usage fraction. */
  private val fractions = TrieMap.empty[String, Double]

  /** execId → last observed Spark-managed OFF-HEAP usage fraction
    * (`OffHeapUnifiedMemory` — execution + storage in the off-heap
    * region — over the configured region size; the Spark-managed
    * region, not raw `JVMOffHeapMemory`, which also counts metaspace
    * and code cache that no admission decision can shed). */
  private val offHeapFractions = TrieMap.empty[String, Double]

  /** execId → ACTUAL max heap bytes, inverted from the executor's
    * registered on-heap unified region (see class doc). */
  private val heapBytes = TrieMap.empty[String, Long]

  /** Ingest one observation (the listener seam — tests drive this
    * directly; Spark's ExecutorMetrics carries the same bytes). The
    * driver's denominator is its own `Runtime.maxMemory`; executors
    * use their registered real heap, falling back to the configured
    * executor heap until registration is seen. */
  private[sources] def record(execId: String, usedHeapBytes: Long): Unit = {
    val denom =
      if (execId == ExecutorMemorySignal.DriverId)
        Runtime.getRuntime.maxMemory()
      else heapBytes.getOrElse(execId, fallbackHeapBytes)
    fractions(execId) = usedHeapBytes.toDouble / denom
  }

  /** Ingest one off-heap observation (no-op while off-heap is
    * disabled — the region size is the only sane denominator). */
  private[sources] def recordOffHeap(execId: String,
      usedOffHeapBytes: Long): Unit =
    if (offHeapBytes > 0L)
      offHeapFractions(execId) = usedOffHeapBytes.toDouble / offHeapBytes

  override def onBlockManagerAdded(
      e: SparkListenerBlockManagerAdded): Unit = {
    val execId = e.blockManagerId.executorId
    if (execId != ExecutorMemorySignal.DriverId)
      e.maxOnHeapMem.filter(_ > 0L).foreach { unified =>
        heapBytes(execId) =
          math.round(unified / memoryFraction) + reservedBytes
      }
  }

  override def onExecutorMetricsUpdate(
      u: SparkListenerExecutorMetricsUpdate): Unit = {
    val heap = u.executorUpdates.values
      .map(_.getMetricValue("JVMHeapMemory")).maxOption.getOrElse(0L)
    if (heap > 0L) record(u.execId, heap)
    val off = u.executorUpdates.values
      .map(_.getMetricValue("OffHeapUnifiedMemory")).maxOption
      .getOrElse(0L)
    if (off > 0L) recordOffHeap(u.execId, off)
  }

  override def onStageExecutorMetrics(
      s: SparkListenerStageExecutorMetrics): Unit = {
    val heap = s.executorMetrics.getMetricValue("JVMHeapMemory")
    if (heap > 0L) record(s.execId, heap)
    val off = s.executorMetrics.getMetricValue("OffHeapUnifiedMemory")
    if (off > 0L) recordOffHeap(s.execId, off)
  }

  override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
    fractions.remove(e.executorId)
    offHeapFractions.remove(e.executorId)
    heapBytes.remove(e.executorId); ()
  }

  /** Worst live executor fraction, floored by the driver's own live
    * heap probe (metrics events lag at heartbeat cadence; the local
    * probe is always current for the JVM that plans admission). */
  def usage(): Double = {
    val rt = Runtime.getRuntime
    val driverNow = (rt.totalMemory() - rt.freeMemory()).toDouble /
      rt.maxMemory()
    val worst = (fractions.values ++ offHeapFractions.values)
      .maxOption.getOrElse(0.0)
    math.max(driverNow, worst)
  }

  /** Executors currently contributing to the signal (driver included
    * once it has reported). */
  def trackedExecutors: Set[String] = fractions.keySet.toSet

  /** The executor component of [[usage]] without the driver floor. */
  private[sources] def worstExecutorFraction: Double =
    (fractions.values ++ offHeapFractions.values).maxOption.getOrElse(0.0)

  /** Last off-heap fraction for an executor (test observability). */
  private[sources] def offHeapFraction(execId: String): Option[Double] =
    offHeapFractions.get(execId)

  /** Registered real heap for an executor (test observability). */
  private[sources] def registeredHeapBytes(execId: String): Option[Long] =
    heapBytes.get(execId)

  /** All registered executor heaps (test observability). */
  private[sources] def registeredHeaps: Map[String, Long] = heapBytes.toMap
}

object ExecutorMemorySignal {
  /** Spark's executor id for the driver (`SparkContext
    * .DRIVER_IDENTIFIER`, which is `private[spark]`). */
  val DriverId = "driver"

  /** Spark's RESERVED_SYSTEM_MEMORY_BYTES (UnifiedMemoryManager): the
    * slice excluded from the unified region before the fraction is
    * applied — needed to invert the region size back to the JVM heap. */
  val ReservedSystemBytes: Long = 300L * 1024 * 1024

  /** Install on a session: registers the listener and points
    * [[CdcLogSource.memoryUsage]] at it. Returns the signal (callers
    * keep it to [[uninstall]] in tests). Per-executor heap bounds come
    * from each executor's registration event (its real runtime heap);
    * `spark.executor.memory` only seeds the pre-registration fallback.
    * When `spark.memory.offHeap.enabled`, the Spark-managed off-heap
    * region (`OffHeapUnifiedMemory` vs the configured
    * `spark.memory.offHeap.size`) joins the watch — on an
    * off-heap-tuned cluster THAT is the region an apply fills, and a
    * heap-only watch under-reports it. Executor-overhead/metaspace
    * stay excluded: no admission decision can shed them. */
  def install(spark: org.apache.spark.sql.SparkSession)
      : ExecutorMemorySignal = {
    val conf = spark.sparkContext.getConf
    val maxHeap = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(conf.get("spark.executor.memory", "1g"))
    val offHeap =
      if (conf.getBoolean("spark.memory.offHeap.enabled", false))
        org.apache.spark.network.util.JavaUtils
          .byteStringAsBytes(conf.get("spark.memory.offHeap.size", "0"))
      else 0L
    val signal = new ExecutorMemorySignal(maxHeap,
      memoryFraction = conf.getDouble("spark.memory.fraction", 0.6),
      offHeapBytes = offHeap)
    spark.sparkContext.addSparkListener(signal)
    CdcLogSource.memoryUsage = () => signal.usage()
    signal
  }

  /** Remove the listener and restore the driver-JVM default probe. */
  def uninstall(spark: org.apache.spark.sql.SparkSession,
      signal: ExecutorMemorySignal): Unit = {
    spark.sparkContext.removeSparkListener(signal)
    CdcLogSource.memoryUsage = CdcLogSource.defaultMemoryUsage
  }
}
