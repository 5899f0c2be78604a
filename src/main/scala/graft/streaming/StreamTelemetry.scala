package graft.streaming

import java.util.concurrent.atomic.AtomicLong

/** Synchronous micro-batch accounting for bench telemetry.
  *
  * ADVICE r6: the previous count came from a `StreamingQueryListener`, whose
  * progress events are delivered asynchronously on the listener bus — a
  * rep's last events could land after the rep's delta was read and get
  * attributed to the next rep or next query. This counter is bumped by
  * [[EventsStream.runAvailableNow]] ITSELF, from the terminated query's own
  * `recentProgress` history, before the call returns — so a caller that
  * takes a delta around a synchronous query run sees exactly that run's
  * batches, with no async window. (`recentProgress` retains the last 100
  * progress updates by default; AvailableNow snapshot runs commit 2–5
  * micro-batches, far under the cap.)
  */
object StreamTelemetry {
  /** Total micro-batches committed by completed [[EventsStream.runAvailableNow]]
    * invocations in this JVM; read-delta around a query run for its count.
    */
  val microBatchesCompleted = new AtomicLong(0L)
}
