package org.apache.spark

/** Test-only bridge into the private[spark] listener bus: lets specs
  * drain pending listener events so job-count assertions are
  * deterministic. */
object GraftTestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
