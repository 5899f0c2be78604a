package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Shared input shape for the per-key stateful scorers ([[EwmaStream]],
  * [[AnomalyStream]]): one watermarked, microsecond-stamped keyed point
  * stream, so the wiring (and the (ts, tie) total-order contract it
  * carries) lives in one place.
  */
private[streaming] object KeyedFeed {

  final case class Pt(key: Long, ts: java.sql.Timestamp, ts_us: Long,
                      tie: Long, v: Double)

  /** Watermarked (key, ts, ts_us, tie, v) dataset over a STREAMING frame
    * carrying `keyCol: long`, `ts: timestamp`, `tieCol: long`,
    * `valCol: numeric`. The projection itself would run on a batch frame
    * (withWatermark is a no-op there), but the stateful consumers this
    * feeds require streaming execution: with no watermark present,
    * `GroupState.getCurrentWatermarkMs`/`setTimeoutTimestamp` throw —
    * batch parity is checked by running the SAME feed through
    * AvailableNow, not by executing the scorer as a batch plan.
    */
  def points(events: DataFrame, keyCol: String, tieCol: String,
             valCol: String, delay: String): Dataset[Pt] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(col(keyCol).as("key"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col(tieCol).as("tie"),
        col(valCol).cast("double").as("v"))
      .as[Pt]
  }
}
