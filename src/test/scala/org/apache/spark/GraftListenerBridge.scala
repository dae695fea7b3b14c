package org.apache.spark

/** Test-only bridge to `SparkContext.listenerBus` (`private[spark]`):
  * lets a spec drain the async listener bus so its `SparkListener` has
  * seen every event from the jobs it just ran before asserting on the
  * collected metrics. Same isolation idea as
  * `org.apache.spark.sql.GraftColumnBridge` — one internal call,
  * nothing else. */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
