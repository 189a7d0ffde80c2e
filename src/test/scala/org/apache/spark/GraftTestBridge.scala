package org.apache.spark

/** Test-only bridge to `private[spark]` internals: lets specs flush the
  * async listener bus so "no Spark job was launched" assertions are
  * deterministic instead of sleep-based. */
object GraftTestBridge {
  def waitForListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
