package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY §2.10 extension surface):
  * `flatMapGroupsWithState` keyed by user, 30-minute inactivity gap — the
  * streaming twin of the batch `e01_sessionize` query. Closed sessions are
  * emitted as soon as the gap that closes them is observed; the open tail
  * session lives in the state store (bounded: one small record per active
  * user) and is emitted on event-time timeout once the watermark passes it.
  */
object SessionizeStream {

  val GapMicros: Long = 30L * 60 * 1000000

  /** How long (event time) a closed-marker survives before the user's session
    * counter is forgotten — bounds state to recently-active users.
    */
  val MarkerTtlMillis: Long = 7L * 24 * 3600 * 1000

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long, event_id: Long)
  final case class OpenSession(sessionNo: Long, lastTs: Long, nEvents: Long, firstEvent: Long)
  final case class Session(user_id: Long, session_no: Long, n_events: Long, first_event: Long)

  /** Per-user incremental sessionizer. Events within a batch are sorted here;
    * cross-batch continuity comes from the retained OpenSession state.
    */
  def sessionize(userId: Long, events: Iterator[Ev],
                 state: GroupState[OpenSession]): Iterator[Session] = {
    if (!state.exists && !events.hasNext) return Iterator.empty
    if (state.hasTimedOut) {
      val s = state.get
      if (s.nEvents == 0) {
        // marker TTL expired: forget the user entirely (numbering restarts
        // at 1 if they ever return — the bounded-state tradeoff)
        state.remove()
        return Iterator.empty
      }
      // Watermark passed the open session: finalize it. Keep a closed-marker
      // (nEvents = 0) holding the session counter so a near-future event for
      // this user continues the numbering instead of restarting at 1 — parity
      // with the batch cumsum numbering. The marker itself carries a TTL
      // timeout so state stays O(recently-active users), not O(ever-seen).
      state.update(OpenSession(s.sessionNo, s.lastTs, 0, 0))
      // must be strictly beyond the current watermark or Spark rejects it
      state.setTimeoutTimestamp(
        math.max(state.getCurrentWatermarkMs() + 1, s.lastTs / 1000 + MarkerTtlMillis))
      return Iterator.single(Session(userId, s.sessionNo, s.nEvents, s.firstEvent))
    }
    val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    val closed = Vector.newBuilder[Session]
    var open = state.getOption
    sorted.foreach { e =>
      open = open match {
        case Some(s) if s.nEvents > 0 && e.ts_us - s.lastTs <= GapMicros =>
          // max(): a late-but-within-watermark event must not regress the
          // session's end, or the next gap would be measured from the wrong
          // point and split the session (batch semantics sort globally).
          Some(s.copy(lastTs = math.max(s.lastTs, e.ts_us), nEvents = s.nEvents + 1,
            firstEvent = math.min(s.firstEvent, e.event_id)))
        case Some(s) =>
          // gap exceeded, or s is a closed-marker from a timeout
          if (s.nEvents > 0) closed += Session(userId, s.sessionNo, s.nEvents, s.firstEvent)
          Some(OpenSession(s.sessionNo + 1, e.ts_us, 1, e.event_id))
        case None =>
          Some(OpenSession(1, e.ts_us, 1, e.event_id))
      }
    }
    open.foreach { s =>
      state.update(s)
      // finalize when event time passes lastTs + gap (only live sessions).
      // The wm+1 floor matches every other arm site: Spark rejects a
      // timeout at-or-below the watermark, and while sub-watermark events
      // are filtered upstream today, safety should not rest on that
      // non-local invariant.
      if (s.nEvents > 0) state.setTimeoutTimestamp(
        math.max(state.getCurrentWatermarkMs() + 1, s.lastTs / 1000 + GapMicros / 1000))
    }
    closed.result().iterator
  }

  /** Wire the sessionizer over a STREAMING events frame with
    * `ts: timestamp` — append-mode closed sessions. (Streaming only for
    * the same reason as [[KeyedFeed.points]]' consumers: the event-time
    * timeout state calls throw when no watermark is present, i.e. under
    * batch execution.)
    */
  def sessions(events: DataFrame): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    // the watermarked `ts` column must survive into the stateful operator's
    // input for EventTimeTimeout to bind
    events
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionize)
  }
}
