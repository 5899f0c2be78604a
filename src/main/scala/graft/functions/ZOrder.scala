package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave key for multi-dimensional lake layout — the
  * technique behind `OPTIMIZE ZORDER BY`: sorting files by the interleaved
  * bits of two pruning columns gives min/max file statistics locality in
  * BOTH dimensions, so scans filtered on either column (or both) prune
  * files, where a plain compound sort only prunes on its leading column.
  * Vanilla Spark has no z-order; the key is plain integer bit math, so a
  * writer gets the layout with `sortWithinPartitions(zorderKey(x, y))`.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two NON-NEGATIVE integer columns:
    * bit j of `x` lands at position 2j, bit j of `y` at 2j+1. Statically
    * unrolled (shift distances are Scala literals) — pure codegen'd integer
    * ops, no UDF, no shuffle. `bits` ≤ 31 keeps the result in a positive
    * long. Callers bound the inputs (e.g. `pmod(col, lit(1 << bits))`).
    */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { j =>
      shiftleft(shiftright(x.cast("long"), j).bitwiseAND(1L), 2 * j)
        .bitwiseOR(
          shiftleft(shiftright(y.cast("long"), j).bitwiseAND(1L), 2 * j + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The DuckDB-SQL rendering of the same unrolled interleave, so oracles
    * state literally the same bit math.
    */
  def zorderSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { j =>
      s"((($x >> $j) & 1) << ${2 * j}) | ((($y >> $j) & 1) << ${2 * j + 1})"
    }.mkString(" | ")
}
