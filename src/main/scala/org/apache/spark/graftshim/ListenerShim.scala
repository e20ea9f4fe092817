package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Package-access shim for deterministic metrics collection.
  *
  * [[graft.ShuffleAudit]] attributes task metrics (shuffle bytes, input
  * bytes, spill) to the query that ran between two points in time. Task
  *-end events are delivered on the listener bus ASYNCHRONOUSLY, so
  * "query finished" does not mean "its events arrived" — without a
  * drain barrier the last tasks' bytes would be misattributed to the
  * NEXT query. Spark's own test utilities solve this with
  * `listenerBus.waitUntilEmpty()`, which is `private[spark]`; this
  * object lives in `org.apache.spark` purely to reach it. No Spark
  * internals are reimplemented.
  */
object ListenerShim {
  /** Block until every queued listener event has been delivered. */
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
