package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-session conversion funnel (SURVEY §2.10 extension surface):
  * the live twin of the batch `e13_funnel` stage fold, scoped per 30-minute
  * session — `flatMapGroupsWithState` keyed by user tracks the furthest
  * view→click→purchase stage reached inside the CURRENT session and emits
  * one (user, session, stage) row the moment the session closes (gap
  * observed) or finalizes (event-time timeout). The product use is a live
  * conversion dashboard: stage counts per emitting micro-batch ARE the
  * funnel drop-off, without re-folding any user's history.
  *
  * Session boundaries, numbering continuity (closed-markers with a TTL),
  * timeout arming, and the bounded-state story are exactly
  * [[SessionizeStream]]'s — one small record per recently-active user —
  * with the fold state extended by the funnel stage. Like the batch twin,
  * the stage fold is order-sensitive ((ts, event_id) within the session);
  * events are sorted within each micro-batch, so cross-batch parity holds
  * when the feed respects event-time order across batches up to the
  * watermark (the same caveat family as [[SessionizeStream.sessionize]]'s
  * lastTs max() note — late-but-within-watermark stragglers fold in
  * arrival order).
  */
object FunnelStream {

  val GapMicros: Long = SessionizeStream.GapMicros
  val MarkerTtlMillis: Long = SessionizeStream.MarkerTtlMillis

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                      event_id: Long, code: Int)
  final case class OpenFunnel(sessionNo: Long, lastTs: Long, nEvents: Long,
                              stage: Int)
  final case class FunnelRow(user_id: Long, session_no: Long, stage: Int,
                             n_events: Long)

  /** The e13 transition rule: advance only on the exact next funnel step. */
  def advance(stage: Int, code: Int): Int =
    if (stage == 0 && code == 1) 1
    else if (stage == 1 && code == 2) 2
    else if (stage == 2 && code == 3) 3
    else stage

  /** Per-user incremental session-funnel fold (the [[SessionizeStream]]
    * state machine carrying `stage` through the session).
    */
  def funnel(userId: Long, events: Iterator[Ev],
             state: GroupState[OpenFunnel]): Iterator[FunnelRow] = {
    if (!state.exists && !events.hasNext) return Iterator.empty
    if (state.hasTimedOut) {
      val s = state.get
      if (s.nEvents == 0) { state.remove(); return Iterator.empty }
      state.update(OpenFunnel(s.sessionNo, s.lastTs, 0, 0))
      state.setTimeoutTimestamp(
        math.max(state.getCurrentWatermarkMs() + 1, s.lastTs / 1000 + MarkerTtlMillis))
      return Iterator.single(FunnelRow(userId, s.sessionNo, s.stage, s.nEvents))
    }
    val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    val closed = Vector.newBuilder[FunnelRow]
    var open = state.getOption
    sorted.foreach { e =>
      open = open match {
        case Some(s) if s.nEvents > 0 && e.ts_us - s.lastTs <= GapMicros =>
          Some(s.copy(lastTs = math.max(s.lastTs, e.ts_us),
            nEvents = s.nEvents + 1, stage = advance(s.stage, e.code)))
        case Some(s) =>
          if (s.nEvents > 0) closed += FunnelRow(userId, s.sessionNo, s.stage, s.nEvents)
          Some(OpenFunnel(s.sessionNo + 1, e.ts_us, 1, advance(0, e.code)))
        case None =>
          Some(OpenFunnel(1, e.ts_us, 1, advance(0, e.code)))
      }
    }
    open.foreach { s =>
      state.update(s)
      if (s.nEvents > 0) state.setTimeoutTimestamp(
        math.max(state.getCurrentWatermarkMs() + 1, s.lastTs / 1000 + GapMicros / 1000))
    }
    closed.result().iterator
  }

  /** Wire the funnel fold over a STREAMING events frame with
    * `ts: timestamp` + `event_type` — append-mode closed/finalized
    * session-funnel rows.
    */
  def funnels(events: DataFrame): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "purchase", 3).otherwise(0).as("code"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(funnel)
  }
}
