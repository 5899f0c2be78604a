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
}
