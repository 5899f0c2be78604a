package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Q.dsum

/** Time-series shaping (SURVEY §2.11 adjunct to the as-of join): regularize
  * an event stream onto a dense time spine. The spine is tiny (hours × keys)
  * and generated declaratively (`sequence` + `explode`), the observations
  * aggregate with one key shuffle, and the fill is a single carry-forward
  * window per key — the standard resample-and-ffill shape, all Catalyst
  * built-ins.
  */
object TimeSeriesOps {

  /** Hourly regularization of `events(keyCol, tsCol, valueCol)`: one row per
    * (hour, key) for EVERY hour between the global min and max — `n` counts
    * observations (0 on gap hours) and `carried_total` forward-fills the
    * last observed hourly total (0.0 before a key's first observation).
    * Totals go through the exact-decimal sum so the fill source is
    * partition-order independent.
    */
  def gapFillHourly(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"), col(keyCol))
      .agg(count(lit(1)).as("n"), dsum(col(valueCol)).as("total"))
    val spine = events
      .agg(date_trunc("hour", min(col(tsCol))).as("lo"),
        date_trunc("hour", max(col(tsCol))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("hour"))
      .crossJoin(events.select(col(keyCol)).distinct())
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("hour", keyCol), "left")
      .select(col("hour"), col(keyCol),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(last(col("total"), ignoreNulls = true).over(w), lit(0.0))
          .as("carried_total"))
  }
}
