package graft.sources

import org.apache.spark.scheduler.{SparkListenerExecutorMetricsUpdate,
  SparkListenerExecutorRemoved, SparkListenerStageExecutorMetrics}
import org.scalatest.funsuite.AnyFunSuite

/** ST7's cluster-side pressure signal: worst live executor, driver
  * floor, removal cleanup (reference memory_monitor.rs polls the
  * applying process; on Spark that process is every executor). */
final class ExecutorMemorySignalSpec extends AnyFunSuite {

  test("worst executor wins; removal drops its contribution") {
    val s = new ExecutorMemorySignal(fallbackHeapBytes = 1000L)
    s.record("1", 900L)
    s.record("2", 100L)
    assert(s.worstExecutorFraction === 0.9)
    assert(s.usage() >= 0.9, "usage must include the worst executor")
    s.onExecutorRemoved(
      SparkListenerExecutorRemoved(0L, "1", "decommissioned"))
    assert(s.trackedExecutors == Set("2"))
    assert(s.worstExecutorFraction === 0.1,
      "a removed executor must stop pinning the signal")
  }

  test("denominators come from each executor's REGISTERED real heap " +
      "(BlockManagerAdded unified-region inversion), not the config " +
      "string; removal forgets it (round-13 verdict #3)") {
    // config says 1 GiB, but executor 1 actually runs with a 4 GiB heap
    // (e.g. --executor-memory at submit, or a heterogeneous profile):
    // Spark registers its on-heap unified region as
    // (heap - 300MiB) * fraction
    val gib = 1024L * 1024 * 1024
    val s = new ExecutorMemorySignal(fallbackHeapBytes = gib,
      memoryFraction = 0.6)
    val realHeap = 4 * gib
    val unified = ((realHeap - ExecutorMemorySignal.ReservedSystemBytes)
      * 0.6).toLong
    s.onBlockManagerAdded(
      org.apache.spark.GraftTestBus.blockManagerAdded("1", unified))
    assert(s.registeredHeapBytes("1").exists(h =>
      math.abs(h - realHeap) < gib / 100),
      s"inverted heap ${s.registeredHeapBytes("1")} should be ~4 GiB")
    // 2 GiB used on a 4 GiB executor = 0.5 — the config-string
    // denominator (1 GiB) would have reported an absurd 2.0; the other
    // wrong direction (config 8 GiB vs real 4) would UNDER-report
    s.record("1", 2 * gib)
    assert(s.worstExecutorFraction > 0.45 && s.worstExecutorFraction < 0.55,
      s"fraction ${s.worstExecutorFraction} must use the real heap")
    // an unregistered executor falls back to the configured bound
    s.record("2", gib / 2)
    assert(s.registeredHeapBytes("2").isEmpty)
    assert(s.trackedExecutors.contains("2"))
    // removal forgets the registration too
    s.onExecutorRemoved(
      SparkListenerExecutorRemoved(0L, "1", "decommissioned"))
    assert(s.registeredHeapBytes("1").isEmpty)
    // the driver's registration is never used as an executor bound
    s.onBlockManagerAdded(org.apache.spark.GraftTestBus
      .blockManagerAdded(ExecutorMemorySignal.DriverId, unified))
    assert(s.registeredHeapBytes(ExecutorMemorySignal.DriverId).isEmpty)
  }

  test("driver observations use the driver JVM's own max heap as " +
      "denominator, not the executor bound") {
    val s = new ExecutorMemorySignal(fallbackHeapBytes = 1L)
    val used = Runtime.getRuntime.maxMemory() / 4
    s.record(ExecutorMemorySignal.DriverId, used)
    // with the executor bound (1 byte) this would be astronomic;
    // against the driver's real max heap it is ~0.25
    assert(s.worstExecutorFraction > 0.2 && s.worstExecutorFraction < 0.3)
  }

  test("scheduler metrics events feed the signal: heartbeat updates " +
      "and per-stage peaks") {
    val s = new ExecutorMemorySignal(fallbackHeapBytes = 1000L)
    s.onExecutorMetricsUpdate(SparkListenerExecutorMetricsUpdate(
      "3", Seq.empty,
      Map((0, 0) -> org.apache.spark.GraftTestBus.executorMetrics(Map("JVMHeapMemory" -> 600L)),
          (1, 0) -> org.apache.spark.GraftTestBus.executorMetrics(Map("JVMHeapMemory" -> 800L)))))
    assert(s.worstExecutorFraction === 0.8,
      "the max across a heartbeat's stage entries must win")
    s.onStageExecutorMetrics(SparkListenerStageExecutorMetrics(
      "4", 7, 0, org.apache.spark.GraftTestBus.executorMetrics(Map("JVMHeapMemory" -> 950L))))
    assert(s.worstExecutorFraction === 0.95)
    // an empty update must not register a zero that hides pressure
    s.onExecutorMetricsUpdate(
      SparkListenerExecutorMetricsUpdate("5", Seq.empty, Map.empty))
    assert(!s.trackedExecutors.contains("5"))
  }

  test("off-heap awareness: with spark.memory.offHeap enabled, " +
      "OffHeapUnifiedMemory folds into the per-executor fraction — an " +
      "off-heap-tuned cluster's real pressure is OUTSIDE the GC heap " +
      "(round-14 verdict #7); disabled off-heap ignores observations; " +
      "removal forgets both regions") {
    val s = new ExecutorMemorySignal(fallbackHeapBytes = 1000L,
      offHeapBytes = 2000L)
    s.record("1", 100L) // GC heap: a calm 10%
    // scheduler events carry the off-heap region usage: 90% — the
    // region an off-heap apply actually fills
    s.onStageExecutorMetrics(SparkListenerStageExecutorMetrics(
      "1", 7, 0, org.apache.spark.GraftTestBus.executorMetrics(
        Map("JVMHeapMemory" -> 100L, "OffHeapUnifiedMemory" -> 1800L))))
    assert(s.worstExecutorFraction === 0.9,
      "a heap-only watch would report 0.1 here and admit into OOM")
    s.onExecutorMetricsUpdate(SparkListenerExecutorMetricsUpdate(
      "2", Seq.empty,
      Map((0, 0) -> org.apache.spark.GraftTestBus.executorMetrics(
        Map("OffHeapUnifiedMemory" -> 1000L)))))
    assert(s.offHeapFraction("2").contains(0.5))
    // off-heap disabled (size 0): no sane denominator, observations
    // are ignored rather than divided by zero
    val s2 = new ExecutorMemorySignal(fallbackHeapBytes = 1000L)
    s2.recordOffHeap("9", 999999L)
    assert(s2.worstExecutorFraction === 0.0)
    // removal drops BOTH regions' contributions
    s.onExecutorRemoved(SparkListenerExecutorRemoved(0L, "1", "gone"))
    assert(s.worstExecutorFraction === 0.5,
      "executor 1's off-heap reading must not outlive it")
  }

  test("usage() never reports below the driver's live heap (the " +
      "manifest-commit broker stays part of the signal)") {
    val s = new ExecutorMemorySignal(fallbackHeapBytes = 1000L)
    val rt = Runtime.getRuntime
    val driverNow = (rt.totalMemory() - rt.freeMemory()).toDouble /
      rt.maxMemory()
    assert(s.usage() >= driverNow * 0.5,
      "an idle signal still reflects the driver JVM")
  }

  test("install points CdcLogSource.memoryUsage at the signal; " +
      "uninstall restores the driver default") {
    val spark = graft.SparkSpec.session
    val saved = CdcLogSource.memoryUsage
    try {
      val sig = ExecutorMemorySignal.install(spark)
      sig.record("9", 999L)
      assert(CdcLogSource.memoryUsage() >= 0.0)
      assert(sig.trackedExecutors.contains("9"))
      ExecutorMemorySignal.uninstall(spark, sig)
      assert(CdcLogSource.memoryUsage eq CdcLogSource.defaultMemoryUsage)
    } finally CdcLogSource.memoryUsage = saved
  }
}
