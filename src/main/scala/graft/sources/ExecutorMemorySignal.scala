package graft.sources

import org.apache.spark.scheduler.{SparkListener,
  SparkListenerExecutorMetricsUpdate, SparkListenerExecutorRemoved,
  SparkListenerStageExecutorMetrics}

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
  * A hung executor keeps its last reported fraction until the
  * scheduler removes it — stale-high is the conservative side for an
  * admission signal. Removal drops the entry so a replaced executor
  * cannot pin admission down forever.
  */
final class ExecutorMemorySignal(executorMaxHeapBytes: Long)
    extends SparkListener {
  require(executorMaxHeapBytes > 0, "executor max heap must be positive")

  /** execId → last observed heap-usage fraction. */
  private val fractions = TrieMap.empty[String, Double]

  /** Ingest one observation (the listener seam — tests drive this
    * directly; Spark's ExecutorMetrics carries the same bytes). The
    * driver's denominator is its own `Runtime.maxMemory`; executors
    * use the configured executor heap. */
  private[sources] def record(execId: String, usedHeapBytes: Long): Unit = {
    val denom =
      if (execId == ExecutorMemorySignal.DriverId)
        Runtime.getRuntime.maxMemory()
      else executorMaxHeapBytes
    fractions(execId) = usedHeapBytes.toDouble / denom
  }

  override def onExecutorMetricsUpdate(
      u: SparkListenerExecutorMetricsUpdate): Unit = {
    val heap = u.executorUpdates.values
      .map(_.getMetricValue("JVMHeapMemory")).maxOption.getOrElse(0L)
    if (heap > 0L) record(u.execId, heap)
  }

  override def onStageExecutorMetrics(
      s: SparkListenerStageExecutorMetrics): Unit = {
    val heap = s.executorMetrics.getMetricValue("JVMHeapMemory")
    if (heap > 0L) record(s.execId, heap)
  }

  override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
    fractions.remove(e.executorId); ()
  }

  /** Worst live executor fraction, floored by the driver's own live
    * heap probe (metrics events lag at heartbeat cadence; the local
    * probe is always current for the JVM that plans admission). */
  def usage(): Double = {
    val rt = Runtime.getRuntime
    val driverNow = (rt.totalMemory() - rt.freeMemory()).toDouble /
      rt.maxMemory()
    val worst = fractions.values.maxOption.getOrElse(0.0)
    math.max(driverNow, worst)
  }

  /** Executors currently contributing to the signal (driver included
    * once it has reported). */
  def trackedExecutors: Set[String] = fractions.keySet.toSet

  /** The executor component of [[usage]] without the driver floor. */
  private[sources] def worstExecutorFraction: Double =
    fractions.values.maxOption.getOrElse(0.0)
}

object ExecutorMemorySignal {
  /** Spark's executor id for the driver (`SparkContext
    * .DRIVER_IDENTIFIER`, which is `private[spark]`). */
  val DriverId = "driver"

  /** Install on a session: registers the listener and points
    * [[CdcLogSource.memoryUsage]] at it. Returns the signal (callers
    * keep it to [[uninstall]] in tests). The executor heap bound comes
    * from `spark.executor.memory` (the JVM -Xmx Spark passes each
    * executor); off-heap/overhead regions are deliberately excluded —
    * the watermarks guard the GC-managed heap the apply path
    * allocates in. */
  def install(spark: org.apache.spark.sql.SparkSession)
      : ExecutorMemorySignal = {
    val conf = spark.sparkContext.getConf
    val maxHeap = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(conf.get("spark.executor.memory", "1g"))
    val signal = new ExecutorMemorySignal(maxHeap)
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
