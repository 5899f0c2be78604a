package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.operators.CorpusOps

/** The t43 temperature mixture gate run against a LIVE document ingest —
  * the mixture-yield dashboard: per-stratum kept document and token
  * counts, updating as batches arrive, gated at the STANDING corpus's
  * acceptance rates. The rate table is computed once from the standing
  * corpus (strata-sized, broadcast — the e39 static-LM pattern) and the
  * gate itself is the batch resampler's stateless predicate verbatim
  * ([[CorpusOps.temperatureGate]]), so the only stateful operator is the
  * final per-stratum counts groupBy — state O(strata) at any scale.
  *
  * With an AvailableNow one-shot run in complete mode the emission equals
  * the batch resample + aggregation on the same documents, which is what
  * lets the t43 oracle grade the streaming plan verbatim (e41).
  */
object MixStream {

  /** Per-stratum kept doc/token yields of the temperature gate over a
    * (streaming or batch) document frame. `rates` is the static
    * [[CorpusOps.temperatureRates]] table for the stratum column.
    */
  def gatedYields(docs: DataFrame, rates: DataFrame, idCol: String,
                  srcCol: String, textCol: String): DataFrame =
    docs
      .join(broadcast(rates.select(col(srcCol), col("accept_rate"))),
        Seq(srcCol))
      .filter(CorpusOps.temperatureGate(col(idCol), col("accept_rate")))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_kept"),
        sum(size(tokens(col(textCol))).cast("long")).as("n_tokens_kept"))
}
