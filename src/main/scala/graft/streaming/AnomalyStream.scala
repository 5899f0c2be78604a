package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeriesOps.anomalyZScores]] — the
  * live monitoring shape: each event is scored against the trailing
  * `lookback` events of its key and emitted as soon as the watermark
  * guarantees no earlier event can still arrive. State per key is O(lookback
  * + in-watermark buffer): the scored frame (a bounded deque) plus arrivals
  * the watermark has not yet passed — never the key's history.
  *
  * Score parity with the batch operator is bit-exact and spec-asserted: the
  * frame moments are the same DECIMAL(18,2)-exact sums (reproduced here with
  * `java.math.BigDecimal` through the same shortest-repr cast image the
  * k-means partials use), the float finish is the same pinned expression
  * tree evaluated by the same JVM arithmetic, and the emitted z is rounded
  * half-up to 6 decimals exactly like the batch `round`.
  *
  * Emission timing (the e04/e10 watermark discipline): an event is scored
  * only once STRICTLY below the watermark — an event at the watermark could
  * still be joined by an equal-ts smaller-tie late arrival, which would
  * change its frame. Buffered events flush on the watermark-advance batch
  * via an armed event-time timeout; a key idle past `IdleTtlMillis` of
  * event time is evicted entirely (a returning key restarts with an empty
  * frame — the same restart boundary EwmaStream documents).
  */
object AnomalyStream {

  /** Event-time idle gap after which a key's state (including its frame)
    * is evicted. */
  val IdleTtlMillis: Long = 60L * 60 * 1000

  /** Input point — the shared [[KeyedFeed]] shape (aliased so callers and
    * specs keep addressing it as `AnomalyStream.Pt`). */
  type Pt = KeyedFeed.Pt
  val Pt = KeyedFeed.Pt
  /** (scored trailing frame — ascending (ts, tie), ≤ lookback entries;
    * in-flight events not yet past the watermark; last event seen µs).
    */
  final case class AnomalyState(frame: List[(Long, Long, Double)],
                                pending: List[(Long, Long, Double)],
                                lastTsUs: Long)
  final case class ScoredPt(key: Long, tie: Long, value: Double, n_prev: Long,
                            z6: Option[Double], is_anomaly: Boolean)

  /** Exact image of Spark's cast(DOUBLE AS DECIMAL(18,2)): shortest-repr
    * string, then scale-2 HALF_UP (the toDec18 pattern at scale 2).
    */
  private def dec2(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(2, java.math.RoundingMode.HALF_UP)

  /** One event against its frame — the batch operator's exact arithmetic:
    * decimal moments, double finish, z rounded half-up to 6, flag on the
    * ROUNDED z. Zero variance or a short frame yields (n, None, false).
    */
  private[streaming] def score(frame: Seq[(Long, Long, Double)], v: Double,
                               minPrev: Int, zThreshold: Double)
      : (Long, Option[Double], Boolean) = {
    val n = frame.size
    if (n < minPrev) return (n.toLong, None, false)
    var sx = java.math.BigDecimal.ZERO
    var sxx = java.math.BigDecimal.ZERO
    frame.foreach { case (_, _, fv) =>
      val d = dec2(fv)
      sx = sx.add(d)
      sxx = sxx.add(d.multiply(d))
    }
    val nD = n.toDouble
    val sxd = sx.doubleValue()
    val sxxd = sxx.doubleValue()
    val varPrev = (nD * sxxd - sxd * sxd) / (nD * (nD - 1))
    if (!(varPrev > 0)) return (n.toLong, None, false)
    val z6 = BigDecimal((v - sxd / nD) / math.sqrt(varPrev))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (n.toLong, Some(z6), math.abs(z6) > zThreshold)
  }

  /** Per-key incremental scoring step. */
  def step(lookback: Int, minPrev: Int, zThreshold: Double,
           idleTtlMillis: Long = IdleTtlMillis)
          (key: Long, events: Iterator[Pt], state: GroupState[AnomalyState])
      : Iterator[ScoredPt] = {
    val s0 = state.getOption.getOrElse(AnomalyState(Nil, Nil, Long.MinValue))
    val arrived = events.map(e => (e.ts_us, e.tie, e.v)).toList
    val wmMs = state.getCurrentWatermarkMs()
    val (ripe, pending) = (s0.pending ++ arrived).partition(_._1 < wmMs * 1000)
    var frame = s0.frame
    val out = ripe.sorted.map { case (ts, tie, v) =>
      val (n, z6, flag) = score(frame, v, minPrev, zThreshold)
      frame = (frame :+ ((ts, tie, v))).takeRight(lookback)
      ScoredPt(key, tie, v, n, z6, flag)
    }
    val lastTs = (s0.lastTsUs :: arrived.map(_._1)).max
    // eviction ONLY at true event-time idleness — a flush timeout must not
    // drop the frame of a key that is merely between batches
    if (state.hasTimedOut && pending.isEmpty &&
        wmMs >= lastTs / 1000 + idleTtlMillis) {
      state.remove()
    } else {
      state.update(AnomalyState(frame, pending, lastTs))
      // pending events need the NEXT watermark advance (wm+1 fires on the
      // zero-row advance batch); an all-flushed key waits for its idle TTL
      val target =
        if (pending.nonEmpty) wmMs + 1
        else lastTs / 1000 + idleTtlMillis
      state.setTimeoutTimestamp(math.max(wmMs + 1, target))
    }
    out.iterator
  }

  /** Wire the scorer over a STREAMING frame (the event-time timeout state
    * calls in [[step]] require streaming execution — see
    * [[KeyedFeed.points]]) carrying `keyCol: long`, `ts: timestamp`,
    * `tieCol: long`, `valCol: numeric` — append-mode per-event rows,
    * emitted as the watermark finalizes them.
    */
  def scores(events: DataFrame, keyCol: String, tieCol: String,
             valCol: String, lookback: Int = 20, minPrev: Int = 5,
             zThreshold: Double = 3.0, delay: String = "1 minute",
             idleTtlMillis: Long = IdleTtlMillis): Dataset[ScoredPt] = {
    require(lookback >= minPrev && minPrev >= 2,
      s"need lookback >= minPrev >= 2: $lookback, $minPrev")
    val spark = events.sparkSession
    import spark.implicits._
    KeyedFeed.points(events, keyCol, tieCol, valCol, delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        step(lookback, minPrev, zThreshold, idleTtlMillis))
  }
}
