package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deequ/dbt-style data-quality audit: each rule names a DataFrame of its
  * VIOLATING rows; the audit emits one (rule, violations) row per rule.
  * Declaring rules as violation queries keeps them composable (any filter,
  * anti-join, or aggregate works) and keeps the audit itself a union of
  * counts — each rule's cost is its own plan, nothing materializes wide.
  */
object QualityChecks {

  def audit(rules: Seq[(String, DataFrame)]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    rules.map { case (name, violating) =>
      violating.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("rule"), col("violations"))
    }.reduce(_ union _)
  }

  /** Join/shuffle-key skew report: the `topN` heaviest values of `keyCol`
    * with their row counts, each key's share of the table, and its ratio
    * to the MEAN key load — the number that says whether a planned shuffle
    * on this key needs salting or AQE skew handling (a ratio of r means
    * the hottest task runs ~r× the average; Spark's skew-join threshold
    * thinks in the same multiple). One partial-aggregated key count + a
    * broadcastable two-row global aggregate; the top-N is
    * TakeOrderedAndProject, so nothing wide ever reaches the driver.
    */
  def keySkewReport(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("__total"), count(lit(1)).as("__keys"))
    counts.crossJoin(broadcast(totals))
      .select(col(keyCol), col("n"),
        (col("n") / col("__total")).as("share"),
        // n×keys stays in DOUBLE: the long product would overflow (ANSI
        // throw) once n·keys tops 2^63 — reachable at 100 TB row counts
        (col("n").cast("double") * col("__keys") / col("__total"))
          .as("mean_ratio"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(topN)
  }
}
