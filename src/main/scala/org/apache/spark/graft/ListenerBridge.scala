package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into the `private[spark]` listener bus so measurement tools
  * ([[graft.ScaleProbe]]'s shuffle-byte probe) can drain queued
  * listener events before reading their accumulated metrics — without
  * the drain, async delivery under-counts whatever the bus hasn't
  * dispatched yet. Lives in the `org.apache.spark` namespace purely for
  * access; no Spark internals are modified.
  */
object ListenerBridge {
  def waitUntilListenersProcessed(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
