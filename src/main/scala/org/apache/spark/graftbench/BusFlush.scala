package org.apache.spark.graftbench

import org.apache.spark.SparkContext

/** Bench-only shim. `SparkListener` events are delivered asynchronously on
  * the listener bus, so a metrics snapshot taken right after an action can
  * miss task-end events from that very action (ADVICE r6: the same async
  * window mis-attributed micro-batch counts across bench reps).
  * `LiveListenerBus.waitUntilEmpty` is `private[spark]`; this package-scoped
  * accessor is the standard test-utility pattern (Spark's own tests drain the
  * bus the same way) for making listener-accumulated metrics read-after-write
  * consistent. Used only by bench/spec telemetry — never by a query plan.
  */
object BusFlush {
  /** Block until every queued listener event has been dispatched (bounded by
    * the bus's internal 10s default); swallow a timeout rather than fail the
    * bench — a late event then shows up in the NEXT snapshot, which the
    * per-rep deltas tolerate far better than a crashed run.
    */
  def flush(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case scala.util.control.NonFatal(_) => () }
}
