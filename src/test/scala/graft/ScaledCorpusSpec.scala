package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Pins [[ScaledCorpus]]'s shape-preservation claims — the scaled corpus is
  * only a valid scaling MEASUREMENT input if it is "factor independent
  * shards of the same workload", not "factor mutual duplicates":
  *
  *  1. token-disjointness: no n-gram Jaccard pair crosses replicas, and the
  *     scaled pair count is EXACTLY factor × the base pair count;
  *  2. replica 0 is the base corpus verbatim (ids remapped) — its pairs and
  *     cosines are bit-identical to the base run;
  *  3. every replica reproduces the base pair STRUCTURE: the embedding
  *     cosine pairs of replica r, mapped back to base ids, equal the base
  *     pairs (shift permutes coordinates, so dot terms are equal up to
  *     float summation order; the spec data keeps cosines away from the
  *     threshold so reorder noise cannot flip a pair).
  */
class ScaledCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // two dup clusters + two singletons, enough shingle mass to pair
    (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"),
    (2L, "alpha beta gamma delta epsilon zeta eta iota", "en", "web"),
    (3L, "one two three four five six seven eight", "en", "news"),
    (4L, "one two three four five six seven nine", "en", "news"),
    (5L, "lone document with entirely distinct words here", "en", "web"),
    (6L, "another singleton sharing no vocabulary at all", "en", "news")
  ).toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")).cast("long"))

  test("documents: scaled Jaccard pairs = factor × base pairs, none cross replicas") {
    val factor = 3
    val base = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base.nonEmpty, "spec data must produce base pairs")

    val scaled = ScaledCorpus.scaleDocuments(docs, factor)
    assert(scaled.count() === docs.count() * factor)
    val pairs = Dedup.ngramJaccardPairs(scaled, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // no pair crosses replicas (token disjointness)
    assert(pairs.forall { case (a, b) => a % factor === b % factor })
    // exact per-replica replication of the base pair set
    val byRep = pairs.groupBy(_._1 % factor).view
      .mapValues(_.map { case (a, b) => (a / factor, b / factor) }.toSet).toMap
    assert(byRep.keySet === (0L until factor.toLong).toSet)
    (0L until factor.toLong).foreach(r => assert(byRep(r) === base,
      s"replica $r pair structure diverged from base"))
  }

  test("embeddings: every replica reproduces the base cosine pairs; replica 0 bit-identical") {
    val factor = 3
    // cosines far from the 0.4 threshold: near-dup pair (1,2), rest near-orthogonal
    val embs = Seq(
      (1L, Array(1.0f, 0.02f, 0.01f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.05f, 0.0f, 0.01f, 0.0f, 0.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.03f, 0.0f, 0.02f, 0.0f, 0.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.01f, 0.0f, 1.0f, 0.0f, 0.03f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")

    def cosinePairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      Dedup.embeddingCosinePairs(df, "vec_id", "embedding", 0.4)
        .select("id_a", "id_b", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val base = cosinePairs(embs)
    assert(base.keySet === Set((1L, 2L)))

    val scaled = ScaledCorpus.scaleEmbeddings(embs, factor)
    assert(scaled.count() === embs.count() * factor)
    val pairs = cosinePairs(scaled)
    // intra-replica structure: each replica contributes exactly the base
    // pairs; the spec data has no cross-replica cosine above threshold
    val expectedKeys = (0L until factor.toLong).flatMap(r =>
      base.keySet.map { case (a, b) => (a * factor + r, b * factor + r) }).toSet
    assert(pairs.keySet === expectedKeys)
    // replica 0 is unshifted → bit-identical cosines
    base.foreach { case ((a, b), c) =>
      assert(pairs((a * factor, b * factor)) === c,
        s"replica-0 cosine for ($a,$b) not bit-identical") }
    // shifted replicas: same terms, reordered summation → tight tolerance
    (1L until factor.toLong).foreach { r =>
      base.foreach { case ((a, b), c) =>
        assert(math.abs(pairs((a * factor + r, b * factor + r)) - c) < 1e-12) }
    }
  }
}
