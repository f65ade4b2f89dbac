package org.apache.spark

/** Test-only bridge into the listener bus: QueryExecutionListener events
  * are delivered asynchronously, so a plan-audit spec must drain the bus
  * before reading what it captured. `listenerBus` is private[spark];
  * this shim is the narrowest access path (mirrors the
  * `org.apache.spark.sql.GraftColumnBridge` pattern in main). */
object GraftTestBus {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
