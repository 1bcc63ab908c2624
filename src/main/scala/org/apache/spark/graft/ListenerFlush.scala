package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener-bus drain. The bench's
  * per-query TaskMetrics deltas are only exact if every task-end event
  * for query N is consumed before query N+1's snapshot — listener
  * delivery is async, so each timed region is bracketed by this drain.
  * Same package-bridge pattern as sql.graft.ColumnBridge.
  */
object ListenerFlush {
  /** Block until all queued listener events are delivered (or timeout). */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
