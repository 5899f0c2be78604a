package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key EWMA via `flatMapGroupsWithState` — the escape hatch
  * [[graft.operators.TimeSeriesOps.ewmaPerKey]] documents for UNBOUNDED
  * series: the batch operator collects each key's full history into one
  * array (fine for bounded histories, impossible for an always-on stream),
  * while this keeps O(1) state per key — the running accumulator plus only
  * the events still inside the watermark delay.
  *
  * Fold semantics are identical to the batch operator (spec-asserted):
  * acc ← acc·(1−α) + v·α from acc₀ = 0.0 in total (ts, tie) order. The
  * stream can deliver events out of order ACROSS micro-batches, so arrivals
  * are buffered in state and folded only once the watermark passes them —
  * no later in-watermark event can precede a folded one, which is what
  * makes the float result equal to the batch fold. (Events later than the
  * watermark are the stream's correctness boundary, exactly as for every
  * watermarked operator.)
  *
  * A key idle past `idleTtl` (event time) finalizes: remaining buffered
  * events fold, one (key, n_events, ewma) row is emitted (append mode, the
  * e04 sessionize pattern), and the key's state is REMOVED — state stays
  * O(recently-active keys); a key returning after finalization restarts
  * from the 0.0 seed.
  */
object EwmaStream {

  /** Default event-time idle gap after which a key's EWMA finalizes —
    * overridable per call (AnomalyStream parity): a consumer needing
    * batch-equal folds over feeds with long per-key gaps passes a large
    * `idleTtlMillis` to opt out of burst finalization. */
  val IdleTtlMillis: Long = 60L * 60 * 1000

  /** Input point — the shared [[KeyedFeed]] shape (aliased so callers and
    * specs keep addressing it as `EwmaStream.Pt`). */
  type Pt = KeyedFeed.Pt
  val Pt = KeyedFeed.Pt
  /** (folded accumulator, folded count, last event seen µs, in-flight
    * events (ts_us, tie, v) not yet past the watermark).
    */
  final case class EwmaState(acc: Double, n: Long, lastTsUs: Long,
                             pending: List[(Long, Long, Double)])
  final case class KeyEwma(key: Long, n_events: Long, ewma: Double)

  private def foldSorted(acc0: Double, n0: Long, alpha: Double,
                         evs: Seq[(Long, Long, Double)]): (Double, Long) = {
    var acc = acc0
    var n = n0
    evs.sorted.foreach { case (_, _, v) => acc = acc * (1 - alpha) + v * alpha; n += 1 }
    (acc, n)
  }

  /** Per-key incremental EWMA step. */
  def step(alpha: Double, idleTtlMillis: Long = IdleTtlMillis)
          (key: Long, events: Iterator[Pt],
           state: GroupState[EwmaState]): Iterator[KeyEwma] = {
    if (state.hasTimedOut) {
      // watermark passed lastTs + TTL, so everything still pending is ripe:
      // fold it, emit the finalized value, forget the key
      val s = state.get
      val (acc, n) = foldSorted(s.acc, s.n, alpha, s.pending)
      state.remove()
      return if (n > 0) Iterator.single(KeyEwma(key, n, acc)) else Iterator.empty
    }
    val s0 = state.getOption.getOrElse(EwmaState(0.0, 0L, Long.MinValue, Nil))
    val arrived = events.map(e => (e.ts_us, e.tie, e.v)).toList
    val wmUs = state.getCurrentWatermarkMs() * 1000
    // fold only events STRICTLY below the watermark — an event AT the
    // watermark could still be joined by an equal-ts, smaller-tie late
    // arrival, and folding it early would break (ts, tie) order parity
    val (ripe, pending) = (s0.pending ++ arrived).partition(_._1 < wmUs)
    val (acc, n) = foldSorted(s0.acc, s0.n, alpha, ripe)
    val lastTs = (s0.lastTsUs :: arrived.map(_._1)).max
    state.update(EwmaState(acc, n, lastTs, pending))
    // must be strictly beyond the current watermark or Spark rejects it
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1, lastTs / 1000 + idleTtlMillis))
    Iterator.empty
  }

  /** Wire the EWMA over a STREAMING frame (the event-time timeout state
    * calls in [[step]] require streaming execution — see
    * [[KeyedFeed.points]]) carrying `keyCol: long`, `ts: timestamp`,
    * `tieCol: long`, `valCol: numeric` — append-mode finalized
    * (key, n_events, ewma) rows, one per key per activity burst.
    */
  def ewma(events: DataFrame, keyCol: String, tieCol: String, valCol: String,
           alpha: Double, delay: String = "1 minute",
           idleTtlMillis: Long = IdleTtlMillis): Dataset[KeyEwma] = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val spark = events.sparkSession
    import spark.implicits._
    KeyedFeed.points(events, keyCol, tieCol, valCol, delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step(alpha, idleTtlMillis))
  }
}
