package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Upsert/merge semantics vanilla Spark lacks (no `MERGE INTO` without a
  * lakehouse format), expressed as plain joins — the slowly-changing-
  * dimension type-2 shape every warehouse migration needs.
  */
object Merges {

  /** Snapshot reconciliation: classify every key across two snapshots of
    * the same table as added / removed / changed / unchanged — the audit
    * behind incremental-load verification and CDC backfills. One full
    * outer join on the key; both the key match and the value comparison
    * are null-safe (`<=>`), so a null key present in both snapshots
    * compares as the same row instead of splitting into removed+added.
    * Values compare as a struct — one row-local equality regardless of
    * column count.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCol: String,
                   valueCols: Seq[String]): DataFrame = {
    val sa = a.select(col(keyCol).as("__ka"),
      struct(valueCols.map(col): _*).as("__va"), lit(true).as("__ina"))
    val sb = b.select(col(keyCol).as("__kb"),
      struct(valueCols.map(col): _*).as("__vb"), lit(true).as("__inb"))
    sa.join(sb, col("__ka") <=> col("__kb"), "full_outer")
      .select(coalesce(col("__ka"), col("__kb")).as(keyCol),
        when(col("__inb").isNull, "removed")
          .when(col("__ina").isNull, "added")
          .when(not(col("__va") <=> col("__vb")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** SCD2 merge: apply a batch of `updates` to the OPEN rows of `current`,
    * producing the full version history —
    *  - a current row whose key is updated closes (`valid_to` = update ts);
    *  - the update row opens (`valid_from` = update ts, `valid_to` null);
    *  - untouched rows pass through open.
    *
    * `current` carries the value columns + `valid_from` (no `valid_to`
    * column — all rows open); `updates` carries the same value columns +
    * `tsCol`, at most one update per key per batch (the standard
    * dedup-the-batch contract). The contract is ENFORCED, not just
    * documented: a violating batch would silently emit duplicate
    * closed/opened rows, so a per-key count guard (`assert_true`, the
    * simhash-envelope pattern) aborts it loudly instead — its window
    * shuffles on the same key the joins shuffle on anyway. Plan shape: two
    * key-shuffle joins of current against the (typically small,
    * broadcastable) batch + one union — no driver-side state. Output:
    * value columns + `valid_from` + `valid_to` (null = open).
    */
  /** Partial aggregation state for incremental view maintenance: per key,
    * (cnt, tot) with the sum carried as DECIMAL(18,2)→DECIMAL(28,2) so
    * states merge EXACTLY — `state(A) ⊕ state(B) = state(A ∪ B)` holds
    * bit-for-bit, which double sums (order-dependent rounding) cannot
    * promise. Callers cast `tot` to double only at the final read edge.
    */
  def aggState(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valCol).cast(DecimalType(18, 2))).as("tot"))

  /** Merge two [[aggState]] frames: the standing state absorbs a delta
    * batch in one key join — per-ingest cost ∝ |delta state|, never a
    * rescan of the data behind the standing side (the d17 signature-index
    * contract, applied to aggregates). Full-outer + null-safe key equality:
    * keys present on either side survive, null group keys merge as one
    * group (the snapshotDiff contract).
    */
  def mergeAggStates(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    val zero = lit(0).cast(DecimalType(28, 2))
    val an = a.select(keyCols.map(c => col(c).as(s"__a_$c")) :+
      col("cnt").as("__a_cnt") :+ col("tot").cast(DecimalType(28, 2)).as("__a_tot"): _*)
    val bn = b.select(keyCols.map(c => col(c).as(s"__b_$c")) :+
      col("cnt").as("__b_cnt") :+ col("tot").cast(DecimalType(28, 2)).as("__b_tot"): _*)
    val cond = keyCols.map(c => col(s"__a_$c") <=> col(s"__b_$c")).reduce(_ && _)
    an.join(bn, cond, "full_outer").select(
      keyCols.map(c => coalesce(col(s"__a_$c"), col(s"__b_$c")).as(c)) ++ Seq(
        (coalesce(col("__a_cnt"), lit(0L)) + coalesce(col("__b_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("__a_tot"), zero) + coalesce(col("__b_tot"), zero)).as("tot")): _*)
  }

  /** Incremental JOIN view maintenance — the join half of the IVM story
    * ([[aggState]]/[[mergeAggStates]] cover aggregates, sketch-state
    * merges cover summaries): with V = A ⋈ B materialized as standing
    * state, an ingest of (ΔA, ΔB) contributes exactly
    *
    *   ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * and V_new = V ∪ ΔV — the standard delta algebra for inner equi-joins
    * (each new pair has a delta row on at least one side; the three terms
    * partition the new pairs by WHICH side is new, so the union is
    * disjoint and duplicate-free without a dedup pass). Per-ingest join
    * work is ∝ the delta sides (each term shuffles a delta plus its
    * matches — small deltas broadcast), never a recompute of A ⋈ B.
    * `baseA`/`baseB` must exclude the deltas (the ingest split contract).
    */
  def incrementalJoinDelta(baseA: DataFrame, deltaA: DataFrame,
                           baseB: DataFrame, deltaB: DataFrame,
                           keys: Seq[String]): DataFrame =
    deltaA.join(baseB, keys)
      .unionByName(baseA.join(deltaB, keys))
      .unionByName(deltaA.join(deltaB, keys))

  /** Point-in-time lookup against an SCD2 history ([[scd2]]'s output
    * shape: key cols + `valid_from` + nullable `valid_to`, half-open
    * intervals): each fact row joins the dimension VERSION valid at its
    * own timestamp. The validity test runs as a FILTER after a plain
    * equi-join on the key — versions per key are few by construction, so
    * this never needs a range join; non-overlapping intervals guarantee
    * at most one match per fact, and facts predating every version drop
    * (inner semantics — the as-of-with-history contract).
    */
  def pointInTimeLookup(facts: DataFrame, history: DataFrame,
                        keys: Seq[String], ts: Column): DataFrame =
    facts.join(history, keys)
      .filter(col("valid_from") <= ts &&
        (col("valid_to").isNull || ts < col("valid_to")))

  /** CDC apply: fold an ordered changelog of upserts and deletes into a
    * base table — the MERGE a lakehouse sink runs per micro-batch,
    * expressed as plain operators. `changes` carries the key, an `op`
    * column ('U' upsert with the row's new values, 'D' delete) and
    * `tsCol`; only the LATEST change per key applies (earlier ones are
    * superseded — ties break on op, 'U' over 'D', making the fold total
    * and deterministic). Result: base rows with no change survive
    * untouched, latest-'U' keys take the change row's values (insert or
    * overwrite), latest-'D' keys drop.
    *
    * Plan shape: one per-key window over the CHANGES (changelogs are
    * delta-sized), one anti join + one union against the base — the base
    * table is never rewritten beyond the touched keys' rows, and nothing
    * is driver-side.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, keyCol: String,
               tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col("op").desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val untouched = base.join(latest.select(keyCol), Seq(keyCol), "left_anti")
    val upserts = latest.filter(col("op") === "U")
      .select(base.columns.toIndexedSeq.map(col): _*)
    untouched.unionByName(upserts)
  }

  def scd2(current: DataFrame, updates: DataFrame, keyCol: String,
           tsCol: String): DataFrame = {
    val valueCols = current.columns.filterNot(_ == "valid_from").toSeq
    val perKey = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val guarded = updates
      .withColumn("__kn", count(lit(1)).over(perKey))
      .filter(assert_true(col("__kn") <= 1,
        lit(s"scd2: batch carries multiple updates for one $keyCol — " +
          "dedup the batch upstream")).isNull)
      .drop("__kn")
    val upKeys = guarded.select(col(keyCol), col(tsCol).as("__uts"))
    val closed = current.join(upKeys, Seq(keyCol))
      .select(valueCols.map(col) :+ col("valid_from") :+ col("__uts").as("valid_to"): _*)
    val stillOpen = current.join(upKeys.select(keyCol), Seq(keyCol), "left_anti")
      .select(valueCols.map(col) :+ col("valid_from") :+
        lit(null).cast(closed.schema("valid_to").dataType).as("valid_to"): _*)
    val opened = guarded
      .select(valueCols.map(col) :+ col(tsCol).as("valid_from") :+
        lit(null).cast(closed.schema("valid_to").dataType).as("valid_to"): _*)
    closed.union(stillOpen).union(opened)
  }
}
