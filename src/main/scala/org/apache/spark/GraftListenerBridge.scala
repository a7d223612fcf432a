package org.apache.spark

/** Bridge to the `private[spark]` listener-bus drain. `observe()`
  * metrics are delivered to QueryExecutionListeners asynchronously on
  * the shared listener bus, so a harness that reads per-query
  * observations right after an action must drain the bus first or it
  * races the delivery. Same extension-library technique as
  * [[org.apache.spark.sql.GraftBridge]].
  */
object GraftListenerBridge {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs) catch { case _: Throwable => () }
}
