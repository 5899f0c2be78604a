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

  /** Per-key exponentially-weighted moving average over the key's
    * time-ordered series — the classic sequential fold that looks like it
    * needs a UDF but doesn't: collect the key's series as a sorted array
    * (ts + a unique tiebreak give a TOTAL order, so the fold order — and
    * therefore the float result — is reproducible) and fold it with an
    * `aggregate` HOF: acc ← acc·(1−α) + x·α from acc₀ = 0.
    *
    * Scale shape: one shuffle on the key; per-key state is that key's
    * series (fine for bounded histories — sessions, per-user activity; an
    * unbounded series belongs in the streaming path —
    * [[graft.streaming.EwmaStream]], which folds the identical arithmetic
    * with O(1) state per key). That bound is ENFORCED, not documented
    * (the CrossCheckGuard contract made in-plan): a key whose collected
    * history exceeds `maxKeyHistory` (default 2²⁰ ≈ 1M rows — ~40 MB of
    * buffered structs, loud well before an executor dies) aborts the job
    * with the key in the message, so a hot key surfaces as a clear error
    * instead of an opaque aggregation OOM. The guard rides the n_events
    * output column, so column pruning can never elide it.
    * Returns (key, n_events, ewma).
    */
  def ewmaPerKey(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valCol: String, alpha: Double,
                 maxKeyHistory: Int = 1 << 20): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(maxKeyHistory > 0, "maxKeyHistory must be positive")
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(tieCol), col(valCol).as("v")))).as("seq"))
      .select(col(keyCol),
        when(size(col("seq")) <= maxKeyHistory, size(col("seq")))
          .otherwise(raise_error(concat(
            lit(s"ewmaPerKey: per-key history exceeded maxKeyHistory=$maxKeyHistory rows for key "),
            col(keyCol).cast("string"),
            lit(" - an unbounded series belongs in the streaming path (EwmaStream, O(1) state per key), or raise maxKeyHistory deliberately"))))
          .cast("long").as("n_events"),
        aggregate(col("seq"), lit(0.0),
          (acc, x) => acc * (1 - alpha) + x.getField("v") * alpha).as("ewma"))
  }

  /** Per-event trailing-window z-score anomaly flags — the monitoring
    * primitive over a metric stream: each event is scored against the
    * moments of its own PRECEDING `lookback` events (never itself, so a
    * spike cannot mask its own detection), flagged when |z| exceeds
    * `zThreshold` and at least `minPrev` observations back the estimate.
    *
    * Reproducibility: the frame's mean/variance derive from EXACT
    * DECIMAL(18,2) window sums (Σx, Σx² — the q40 moment pattern applied
    * over a frame), so partitioning cannot perturb them; the final float
    * division/sqrt is one pinned expression tree and the emitted z is
    * rounded to 6 decimals — the same 1-ulp cross-engine margin q40
    * documents for a·b−c·d under FMA contraction. The flag tests the
    * ROUNDED z so it cannot disagree wherever z6 agrees.
    *
    * Scale shape: ONE shuffle on the key, one sort, one window pass
    * computing all three frame aggregates; state per row is the
    * `lookback`-bounded frame. Returns one row per input event:
    * (key, tie, value, n_prev, z6, is_anomaly).
    */
  def anomalyZScores(df: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, valCol: String, lookback: Int = 20,
                     minPrev: Int = 5, zThreshold: Double = 3.0): DataFrame = {
    require(lookback >= minPrev && minPrev >= 2,
      s"need lookback >= minPrev >= 2: $lookback, $minPrev")
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    val vd = col(valCol).cast(DecimalType(18, 2))
    val nD = col("n_prev").cast(DoubleType)
    val varPrev = (nD * col("__sxx") - col("__sx") * col("__sx")) /
      (nD * (nD - 1))
    val z6 = round((col(valCol) - col("__sx") / nD) / sqrt(varPrev), 6)
    df.select(col(keyCol), col(tsCol), col(tieCol), col(valCol),
        count(lit(1)).over(w).as("n_prev"),
        sum(vd).over(w).cast(DoubleType).as("__sx"),
        sum(vd * vd).over(w).cast(DoubleType).as("__sxx"))
      .withColumn("z6",
        when(col("n_prev") >= minPrev && varPrev > 0, z6))
      .withColumn("is_anomaly",
        coalesce(col("n_prev") >= minPrev && varPrev > 0 &&
          abs(col("z6")) > zThreshold, lit(false)))
      .drop("__sx", "__sxx")
  }

  /** Containment (range) join via time-bucket equi-join — the scale pattern
    * for "points inside intervals" where a direct non-equi join would plan
    * as a nested loop over the full pair space. Every interval explodes to
    * its covering hour buckets (cost: interval length / bucket, small for
    * bounded intervals); every point lives in exactly ONE bucket, so a
    * (point, interval) pair meets in exactly one bucket and needs no dedup.
    * The equi-join shuffles on the bucket key; the exact containment
    * predicate filters residually.
    *
    * Returns one row per point: `(pointId, ts, n_containing)` — intervals
    * from `intervals(lo, hi)` (inclusive bounds) containing the point's ts;
    * 0 when none do.
    */
  def intervalContainCount(points: DataFrame, pointId: String, tsCol: String,
                           intervals: DataFrame): DataFrame = {
    val buckets = intervals.select(col("lo"), col("hi"),
      explode(sequence(date_trunc("hour", col("lo")), date_trunc("hour", col("hi")),
        expr("interval 1 hour"))).as("bucket"))
    // one OUTPUT row per distinct point: duplicate (id, ts) input rows would
    // otherwise each join the buckets and the per-point sums would add up
    // (a point in 3 intervals reporting n_containing = 6)
    val p = points.select(col(pointId), col(tsCol).as("ts"),
      date_trunc("hour", col(tsCol)).as("bucket")).distinct()
    p.join(buckets, Seq("bucket"), "left")
      .withColumn("hit",
        when(col("ts") >= col("lo") && col("ts") <= col("hi"), 1L).otherwise(0L))
      .groupBy(col(pointId), col("ts"))
      .agg(sum(col("hit")).as("n_containing"))
  }

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
