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

  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; read nanos as long and convert to a microsecond timestamp
    * (truncating, exactly like DuckDB's TIMESTAMP_NS → TIMESTAMP cast so the
    * oracle agrees).
    *
    * NB deliberate session-wide side effect: `nanosAsLong` must be in force
    * when the (lazy) scan executes, so it cannot be scoped-and-restored here.
    * The flag only changes behavior for TIMESTAMP(NANOS) columns, which the
    * session would otherwise refuse to read at all.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events").withColumn("ts", nanosToMicros(col("ts")))
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
