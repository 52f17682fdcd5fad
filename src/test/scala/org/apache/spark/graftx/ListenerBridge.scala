package org.apache.spark.graftx

import org.apache.spark.SparkContext

/** Test-only visibility shim (same pattern as sql.graftx.ColumnBridge):
  * `SparkContext.listenerBus` is `private[spark]`, and metric-assertion
  * tests must drain it before reading accumulated task metrics or they
  * race the async bus. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
