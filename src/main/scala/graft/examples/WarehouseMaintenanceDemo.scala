package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Merges, Sketches}

/** Runnable end-to-end warehouse maintenance loop: the incremental
  * operators composed the way a daily load actually chains them —
  *
  *   snapshot diff (what changed?) → CDC apply (fold the changelog in) →
  *   SCD2 merge (keep the history) → point-in-time enrichment (use it) →
  *   incremental agg + join + sketch state (keep the marts fresh without
  *   recomputing them)
  *
  * Every stage is the oracle-checked operator from `graft.queries` (q39,
  * q51, q37, q50, q45, q49, q46/q47); this main just shows they compose.
  * Usage: `runMain graft.examples.WarehouseMaintenanceDemo [sfDir]`
  */
object WarehouseMaintenanceDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("warehouse-maintenance-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") < 2000)
    val base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    println(s"=== base table: ${base.count()} orders from $dir")

    // 0. tonight's "arrived snapshot": 20% of keys re-priced, 5% gone
    val snapshot = orders
      .filter(pmod(col("o_orderkey"), lit(20)) =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(pmod(col("o_orderkey"), lit(5)) === 0,
          col("o_totalprice") * 1.02).otherwise(col("o_totalprice"))
          .as("o_totalprice"))

    // 1. what changed? (q39 snapshot reconciliation)
    val diff = Merges.snapshotDiff(base, snapshot, "o_orderkey",
      Seq("o_orderstatus", "o_totalprice"))
    diff.groupBy("status").count().orderBy("status").show()

    // 2. turn the diff into a changelog and CDC-apply it (q51)
    val ts0 = lit("2024-01-01 00:00:00").cast("timestamp")
    val changes = diff.filter(col("status") === "removed")
      .select(col("o_orderkey"), lit("D").as("op"),
        lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"), ts0.as("ts"))
      .unionByName(diff.filter(col("status") === "changed")
        .join(snapshot, "o_orderkey")
        .select(col("o_orderkey"), lit("U").as("op"), col("o_orderstatus"),
          col("o_totalprice"), ts0.as("ts")))
    val applied = Merges.applyCdc(base, changes, "o_orderkey", "ts")
    println(s"=== CDC applied: ${base.count()} -> ${applied.count()} rows " +
      s"(${changes.count()} change records)")

    // 3. keep the version history (q37 SCD2) and use it (q50 PIT)
    val cur = orders.select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderdate").cast("timestamp").as("valid_from"))
    val upd = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
      .select(col("o_orderkey"), (col("o_totalprice") * 1.1).as("o_totalprice"),
        (col("o_orderdate").cast("timestamp") + expr("INTERVAL 30 DAYS")).as("uts"))
    val hist = Merges.scd2(cur, upd, "o_orderkey", "uts")
    val facts = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") < 2000)
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("timestamp").as("sd"))
    val enriched = Merges.pointInTimeLookup(facts, hist, Seq("o_orderkey"), col("sd"))
    println(s"=== SCD2 history: ${hist.count()} versions; " +
      s"PIT-enriched ${enriched.count()} of ${facts.count()} facts " +
      "(the rest predate their dimension)")

    // 4. keep the marts fresh incrementally: agg state (q45), join view
    // (q49) and a sketch (q46) all absorb the delta without a base rescan
    val cutoff = lit("1997-01-01").cast("timestamp")
    val (oldO, newO) = (orders.filter(col("o_orderdate") < cutoff),
      orders.filter(col("o_orderdate") >= cutoff))
    val aggAll = Merges.mergeAggStates(
      Merges.aggState(oldO, Seq("o_orderstatus"), "o_totalprice"),
      Merges.aggState(newO, Seq("o_orderstatus"), "o_totalprice"),
      Seq("o_orderstatus"))
    println(s"=== incremental agg state: ${aggAll.count()} groups " +
      "(base state + delta merged, no rescan)")
    val regs = Sketches.hllMergeRegisters(
      Sketches.hllRegisters(oldO.select(lit("all").as("g"),
        col("o_custkey").as("k")), Seq("g"), col("k")),
      Sketches.hllRegisters(newO.select(lit("all").as("g"),
        col("o_custkey").as("k")), Seq("g"), col("k")), Seq("g"))
    val est = Sketches.hllEstimate(regs, Seq("g")).select("est").head().getDouble(0)
    val exact = orders.select("o_custkey").distinct().count()
    println(f"=== incremental HLL: ~$est%.0f distinct customers (exact $exact)")

    spark.stop()
  }
}
