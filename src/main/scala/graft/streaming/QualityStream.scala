package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** The t21 composite quality gate run against a LIVE document ingest — the
  * curation-yield dashboard: per (source, keep) document and token counts,
  * updating as batches arrive. Because the gate itself is a stateless
  * single-pass projection (PlanSpec-pinned), it drops into a streaming plan
  * unchanged; the only stateful operator is the final counts groupBy, whose
  * state is O(sources × 2) — trivially bounded at any corpus scale.
  *
  * With an AvailableNow one-shot run in complete mode the emission equals
  * the batch gate + aggregation on the same documents, which is what lets
  * the e16 oracle grade the streaming plan with the batch SQL verbatim.
  */
object QualityStream {

  /** Per-(source, keep) yield counts over a (streaming or batch) document
    * frame: how many documents and tokens the gate keeps/drops per source.
    */
  def gateCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    CorpusOps.qualityGate(docs, idCol, textCol, carryCols = Seq("source"))
      .groupBy(col("source"), col("keep"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
}
