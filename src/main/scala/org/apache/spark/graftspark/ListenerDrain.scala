package org.apache.spark.graftspark

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; this shim exposes the
  * one call the audit tooling needs — a deterministic drain of queued
  * listener events — without reflection. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
