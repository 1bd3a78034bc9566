package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Listener events are posted asynchronously; a metrics snapshot taken
  * right after a query can miss its final stages. `listenerBus` and
  * `waitUntilEmpty()` are `private[spark]`, so this one-line bridge
  * lives under the org.apache.spark package — the standard pattern test
  * harnesses use to flush the bus deterministically instead of
  * sleeping. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
