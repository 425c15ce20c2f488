package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]`; the bench harness
  * needs to drain it so per-query task-metric tallies (shuffle bytes)
  * are complete before reading them. One-method bridge, same pattern as
  * the sql-package plan bridge — nothing in Spark is modified.
  */
object GraftSparkBridge {
  def flushListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
