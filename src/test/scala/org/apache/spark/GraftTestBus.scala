package org.apache.spark

/** Test-only bridge into the private[spark] listener bus: lets specs
  * drain pending listener events so job-count assertions are
  * deterministic. */
object GraftTestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** `ExecutorMetrics`' constructors are `private[spark]`; specs build
    * synthetic heartbeat/stage metrics through this factory. */
  def executorMetrics(metrics: Map[String, Long])
      : executor.ExecutorMetrics = new executor.ExecutorMetrics(metrics)

  /** `BlockManagerId.apply` is `private[spark]`; specs build synthetic
    * executor-registration events through this factory. */
  def blockManagerAdded(execId: String, maxOnHeapMem: Long)
      : scheduler.SparkListenerBlockManagerAdded =
    scheduler.SparkListenerBlockManagerAdded(0L,
      storage.BlockManagerId(execId, "localhost", 7077),
      maxMem = maxOnHeapMem, maxOnHeapMem = Some(maxOnHeapMem),
      maxOffHeapMem = Some(0L))
}
