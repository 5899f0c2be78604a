package graft.operators

import org.apache.spark.sql.DataFrame

/** Enforced smallness gate for the two deliberately-quadratic cross-check
  * operators ([[Dedup.embeddingCosinePairs]], [[Similarity.cosineTopKWindow]]).
  *
  * Those operators exist only to verify their bucketed production twins on
  * inputs small enough to enumerate; until round 6 the "do not point this
  * at a real corpus" contract was documentation. This guard makes it
  * structural (VERDICT r6 #3): the input is counted once and the call
  * aborts loudly above the cap, so an all-pairs plan can never be launched
  * against corpus-scale data by accident. The count costs one
  * narrow-projection scan of the input — negligible at the scales the cap
  * permits, and the cross-check path is never a production hot path.
  */
object CrossCheckGuard {
  /** ≤ 100k rows ⇒ ≤ ~5·10⁹ candidate pairs — the most a deliberate
    * verification run should ever enumerate.
    */
  val DefaultCap = 100000L

  /** Count `df` (callers pass a single-column projection so the scan is
    * narrow) and abort if it exceeds `cap`. Returns the count so callers
    * that need it can reuse it instead of recounting.
    */
  def requireSmall(df: DataFrame, what: String, scalePath: String,
                   cap: Long = DefaultCap): Long = {
    val n = df.count()
    require(n <= cap,
      s"$what is a small-scale all-pairs CROSS-CHECK, capped at $cap rows; " +
        s"input has $n. Use $scalePath (the bucketed production variant) " +
        "for real corpora, or raise crossCheckCap explicitly for a " +
        "deliberate oversized verification run.")
    n
  }
}
