package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Pins [[ScaledCorpus]]'s shape-preservation claims — the scaled corpus is
  * only a valid scaling MEASUREMENT input if it is "factor independent
  * shards of the same workload", not "factor mutual duplicates":
  *
  *  1. token-disjointness: no n-gram Jaccard pair crosses replicas, and the
  *     scaled pair count is EXACTLY factor × the base pair count;
  *  2. replica 0 is the base corpus verbatim (ids remapped);
  *  3. EVERY replica's embedding-cosine pairs, mapped back to base ids,
  *     are bit-identical to the base pairs — the ±1 sign diagonal cancels
  *     term-by-term inside intra-replica dot products ((s·x)(s·y) = x·y
  *     exactly in IEEE, same terms, same order), which is STRONGER than
  *     the old cyclic shift gave (that only reordered summation);
  *  4. no cross-replica pair clears the threshold: sign flips turn
  *     cross-replica dots into Rademacher sums with std ≈ 1/√(effective
  *     dim), so spread-mass fixture vectors (like the real corpus,
  *     effective dim ≈ 22) land far below it. This is exactly the property
  *     the cyclic shift LACKED — it mapped one near-one-hot vector's
  *     dominant axis onto another's (observed cross-replica pairs in r8).
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

  test("embeddings: every replica's cosine pairs bit-identical to base; no cross-replica pair") {
    val factor = 3
    // Spread-mass unit vectors (64-dim, seeded) mirroring the real corpus's
    // effective dimensionality — near-one-hot fixtures would defeat the
    // decorrelation property under ANY coordinate-wise transform (a sign
    // flip leaves |cosine| of same-axis vectors unchanged). One near-dup
    // pair (1,2) at cosine ≈ 0.995; the rest at |cosine| ≲ 0.25, far from
    // the 0.4 threshold on both sides.
    val rnd = new scala.util.Random(42)
    def unit(raw: Array[Double]): Array[Float] = {
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    def randUnit(): Array[Float] = unit(Array.fill(64)(rnd.nextGaussian()))
    val v1 = randUnit()
    val v2 = unit(v1.zip(randUnit()).map { case (a, b) => a + 0.1 * b })
    val v3 = randUnit()
    val v4 = randUnit()
    val embs = Seq(
      (1L, v1, 0), (2L, v2, 0), (3L, v3, 1), (4L, v4, 1)
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
    // EVERY replica bit-identical to base: the sign diagonal cancels
    // term-by-term inside intra-replica dots ((±x)(±y) = xy exactly)
    (0L until factor.toLong).foreach { r =>
      base.foreach { case ((a, b), c) =>
        assert(pairs((a * factor + r, b * factor + r)) === c,
          s"replica-$r cosine for ($a,$b) not bit-identical to base") }
    }
  }
}
