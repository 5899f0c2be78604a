package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upsert/merge semantics vanilla Spark lacks (no `MERGE INTO` without a
  * lakehouse format), expressed as plain joins — the slowly-changing-
  * dimension type-2 shape every warehouse migration needs.
  */
object Merges {

  /** SCD2 merge: apply a batch of `updates` to the OPEN rows of `current`,
    * producing the full version history —
    *  - a current row whose key is updated closes (`valid_to` = update ts);
    *  - the update row opens (`valid_from` = update ts, `valid_to` null);
    *  - untouched rows pass through open.
    *
    * `current` carries the value columns + `valid_from` (no `valid_to`
    * column — all rows open); `updates` carries the same value columns +
    * `tsCol`, at most one update per key per batch (enforce upstream — the
    * standard dedup-the-batch contract). Plan shape: two key-shuffle joins
    * of current against the (typically small, broadcastable) batch + one
    * union — no driver-side state. Output: value columns + `valid_from` +
    * `valid_to` (null = open).
    */
  def scd2(current: DataFrame, updates: DataFrame, keyCol: String,
           tsCol: String): DataFrame = {
    val valueCols = current.columns.filterNot(_ == "valid_from").toSeq
    val upKeys = updates.select(col(keyCol), col(tsCol).as("__uts"))
    val closed = current.join(upKeys, Seq(keyCol))
      .select(valueCols.map(col) :+ col("valid_from") :+ col("__uts").as("valid_to"): _*)
    val stillOpen = current.join(upKeys.select(keyCol), Seq(keyCol), "left_anti")
      .select(valueCols.map(col) :+ col("valid_from") :+
        lit(null).cast(closed.schema("valid_to").dataType).as("valid_to"): _*)
    val opened = updates
      .select(valueCols.map(col) :+ col(tsCol).as("valid_from") :+
        lit(null).cast(closed.schema("valid_to").dataType).as("valid_to"): _*)
    closed.union(stillOpen).union(opened)
  }
}
