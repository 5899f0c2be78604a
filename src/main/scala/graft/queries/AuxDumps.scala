package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.queries.Q.t

/** Auxiliary oracle inputs for the hash-defined operators (simhash, LSH ANN,
  * fingerprints): DuckDB cannot compute Spark's xxhash64, so `Verify` dumps
  * the Spark-computed hash PRIMITIVES (string→hash mappings, hyperplane sign
  * vectors) to parquet next to the query outputs, and the oracle SQL
  * recomputes everything downstream of the hash — tokenization, sign-sums,
  * signature packing, banding, hamming, bucket ranking, min-shingle
  * selection — from scratch in SQL. That oracles ~95% of each operator's
  * logic instead of 0% (the remaining 5% being xxhash64 itself, which has
  * its own spec coverage).
  *
  * Oracle SQL references these via `{{AUX}}`, which Verify substitutes with
  * the absolute dump directory.
  */
object AuxDumps {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // d04: distinct token → xxhash64 mapping over the whole corpus. The
    // oracle re-tokenizes in SQL and joins on the token STRING, so Spark's
    // tokenization is itself under test (a divergent split shows up as a
    // dropped/null hash and a value mismatch).
    "d04_tok_hashes" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(tokens(col("text"))).as("tok")).distinct()
        .select(col("tok"), xxhash64(col("tok")).as("h"))),

    // t04: distinct string → xxhash64 mapping for BOTH fingerprint inputs —
    // normalized whole-doc texts and 5-word shingles of the normalized token
    // stream. The oracle recomputes normalize() and the shingling in SQL.
    "t04_hashes" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val norm = docs.select(normalize(col("text")).as("s"))
      val sh = docs.select(
        explode(graft.functions.NativeFunctions.wordShinglesFused(
          s, tokens(normalize(col("text"))), 5)).as("s"))
      norm.union(sh).distinct().select(col("s"), xxhash64(col("s")).as("h"))
    }),

    // t05/q31: xxhash64 over the document id — the split/quota primitive.
    // Keyed by doc_id; the oracle recomputes bucketing, cut-points and
    // per-source hash-order ranking from it in SQL.
    "doc_hashes" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), xxhash64(col("doc_id")).as("h"))),

    // q55/e52: xxhash64 over the event id — the rank-sketch level/sample
    // primitive. The oracle recomputes the levels (smear/popcount), the
    // adaptive cutoff, and the sample's rank walk from the hash alone.
    "event_hashes" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), xxhash64(col("event_id")).as("h"))),

    // s11: xxhash64 over the vector id — the within-cluster sampling order.
    // Same contract as doc_hashes: the oracle recomputes assignment and
    // ranking in SQL and takes only the hash value from the dump.
    "vec_hashes" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"), xxhash64(col("vec_id")).as("h"))),

    // t08: df → idf = ln(N/df) mapping. Spark's Log expression evaluates via
    // StrictMath.log (fdlibm), which differs from DuckDB's libm ln by 1 ulp
    // on some ratios — so the transcendental is treated as a primitive and
    // materialized (like the hashes), and the oracle recomputes everything
    // around it: tf, df, the join, the product, the ranking.
    "t08_idf" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.CorpusOps.termFrequencies(docs, "doc_id", "text")
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .select("df").distinct()
        .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
        .select(col("df"),
          log(col("n_docs").cast("double") / col("df")).as("idf"))
    }),

    // t15: the unigram LM table (tok, count, ln(count/total)). The ln is the
    // materialized primitive (StrictMath vs libm, as t08); the oracle
    // revalidates the COUNTS by joining on (tok, n) after recounting in SQL,
    // so only the transcendental itself is taken on trust.
    "t15_lp" -> ((s, d) =>
      graft.operators.CorpusOps.unigramLm(t(s, d, "documents"), "doc_id", "text")),

    // t19: the TARGET-domain unigram LM (src0 subcorpus) for the DSIR
    // importance ratio; the raw-corpus side reuses t15_lp. Same validation
    // contract as t15: the oracle re-derives every count in SQL and joins
    // on (tok, n), so only the ln itself is trusted from the dump.
    "t19_lp_target" -> ((s, d) =>
      graft.operators.CorpusOps.unigramLm(
        t(s, d, "documents").filter(col("source") === "src0"),
        "doc_id", "text")),

    // t22: the bigram LM table (bg, n, ctx, ln(n/ctx)). Same contract as
    // t15: the oracle recounts the bigrams AND the context sums in SQL and
    // joins on (bg, n, ctx), so only the ln itself is taken on trust.
    "t22_lp" -> ((s, d) =>
      graft.operators.CorpusOps.bigramLm(t(s, d, "documents"), "doc_id", "text")),

    // s04: the trained IVF coarse quantizer. Training is bit-reproducible
    // (decimal sums, driver-side division — see Similarity.kmeansCentroids),
    // so this second training inside Verify emits exactly the centroids the
    // s04 query plan used; the oracle consumes them and recomputes
    // assignment, probing and ranking in SQL.
    "s04_centroids" -> ((s, d) =>
      graft.operators.Similarity.centroidsDf(s,
        graft.operators.Similarity.kmeansCentroids(
          t(s, d, "embeddings"), "vec_id", "embedding"))),

    // s09: the per-subspace PQ codebooks (sub, cid, cvec). Training is the
    // same bit-reproducible k-means as s04, run per vector slice, so this
    // second training inside Verify emits exactly the codebooks the s09
    // plan used; the oracle recomputes codes, ADC tables, the
    // subspace-ordered score folds and both rankings in SQL.
    "s09_codebooks" -> ((s, d) =>
      graft.operators.Similarity.pqCodebooksDf(s,
        graft.operators.Similarity.pqCodebooks(
          t(s, d, "embeddings"), "vec_id", "embedding"))),

    // s10/s19/s14: the RESIDUAL product codebooks — trained on
    // v − centroid(cell) under the s04 coarse quantizer, the serving
    // configuration's code source. Same bit-reproducible training chain
    // (deterministic assignment, one zip_with subtraction, exact-decimal
    // k-means), so this second training emits exactly the codebooks the
    // s10 plan used; the oracle rebuilds residuals, codes, ADC shifts and
    // folds from it in SQL.
    "s09r_codebooks" -> ((s, d) =>
      graft.operators.Similarity.pqCodebooksDf(s,
        graft.operators.Similarity.residualPqCodebooks(
          t(s, d, "embeddings"), "vec_id", "embedding"))),

    // m12: the 256-entry gear table (b, g) — the rolling-hash primitive of
    // content-defined chunking. The oracle recomputes every boundary from
    // it in SQL (the cut decision is local to the last maskBits bytes, so
    // a windowed self-join sum reproduces the rolling hash exactly);
    // only the splitmix64 derivation of the table itself rides the dump.
    "gear_table" -> ((s, _) => graft.operators.Multimodal.gearTableDf(s)),

    // m13: the BOUNDED gear chunk spans (doc_id, chunk_no, st, en) over
    // the shared shifted corpus. Bounds make cut eligibility sequential
    // (not windowed-SQL-expressible), so the spans are the dumped
    // primitive and the oracle re-derives slices/digests/Jaccard from
    // them; the boundary algorithm itself is spec-pinned against a
    // plain-Scala replica.
    "m13_bounds" -> ((s, d) =>
      graft.operators.Multimodal.gearChunkSpans(
        ExtensionQueries.shiftedMediaCorpus(s, d),
        maskBits = 6, minSize = 16, maxSize = 128)),

    // s18: the FROZEN initial-half quantizer the appended IVF index serves
    // under — trained on `vec_id % 4 ≠ 0` with the same bit-reproducible
    // k-means the index build ran, so this second training inside Verify
    // emits exactly the centroids every appended-corpus assignment froze.
    "s18_centroids" -> ((s, d) =>
      graft.operators.Similarity.centroidsDf(s,
        graft.operators.Similarity.kmeansCentroids(
          t(s, d, "embeddings").filter(pmod(col("vec_id"), lit(4)) =!= 0),
          "vec_id", "embedding"))),

    // s21: the drift monitor's quantizer — trained on the STANDING corpus
    // only (vec_id % 8 ≠ 0, the d15/d16 split), because a drift alarm's
    // reference frame must not be contaminated by the batch it screens.
    // Same bit-reproducible retraining contract as s04/s18.
    "s21_centroids" -> ((s, d) =>
      graft.operators.Similarity.centroidsDf(s,
        graft.operators.Similarity.kmeansCentroids(
          t(s, d, "embeddings").filter(pmod(col("vec_id"), lit(8)) =!= 0),
          "vec_id", "embedding"))),

    // Hyperplane-LSH consumers — s03 (one 8-plane table, p 0..7) and d06
    // (8 tables × 4 planes, p 0..31): the ±1 sign vector of each
    // deterministic hyperplane, materialized through the OPERATOR's own
    // derivation (Similarity.hyperplaneSigns), so the dump can never drift
    // out of lockstep with what the LSH plans hash.
    "hyperplanes32" -> ((s, d) => {
      import graft.operators.Similarity
      val dim = Similarity.vectorDim(t(s, d, "embeddings"), "embedding")
      import s.implicits._
      Similarity.hyperplaneSigns(s, 32, 0, dim).zipWithIndex
        .map { case (sv, p) => (p, sv.toSeq) }.toSeq
        .toDF("p", "signs")
    }),

    // t40: the interpolated Kneser–Ney bigram table (bg, n, ctx, n1f,
    // n1b, nbg, lp). Same contract as t22: the oracle recounts ALL FIVE
    // integer statistics in SQL (bigram count, context total, distinct
    // continuations, distinct left contexts, type total) and joins on
    // them, so only the final ln rides the dump.
    // As of r17 the KN lp dumps READ the standing LM tables (the same
    // rows every scorer serves from), so the oracles grade the standing
    // path end-to-end: a stale table would fail the recounted-statistics
    // joins, and table-vs-direct bit-identity is separately spec-pinned.
    "t40_lp" -> ((s, d) => s.table(StandingLm.ensure(s, d, 2))),

    // t41: the interpolated KN TRIGRAM table (tg, n, ctx, n1f, cont,
    // mid_ctx, mid_n1f, n1b, nbg, lp). The oracle recounts all EIGHT
    // integer statistics in SQL and joins on them — only the ln rides.
    "t41_lp" -> ((s, d) => s.table(StandingLm.ensure(s, d, 3))),

    // t44: the ORDER-GENERIC interpolated KN table at order 4 (g, n, ctx,
    // n1f, cont3, mid_ctx3, mid_n1f3, cont2, mid_ctx2, mid_n1f2, n1b,
    // nbg, lp). The oracle recounts all ELEVEN integer statistics in SQL
    // and joins on them — only the ln rides.
    "t44_lp" -> ((s, d) => s.table(StandingLm.ensure(s, d, 4))),

    // t52: the cadence-served order-2 head (base + epoch-1 batch only —
    // the bounded staleness the refresh cadence buys). Shares the query's
    // own idempotent scenario, so the dump IS what scorers served.
    "t52_lp" -> ((s, d) => ExtensionQueries.cadenceServedHead(s, d)),

    // t45: the KN bigram table at THREE discounts (discount, bg, n, ctx,
    // n1f, n1b, nbg, lp) — the production sweep of the 0.75 constant
    // (VERDICT r14 #7). The integer statistics are discount-INDEPENDENT,
    // so the oracle recounts them once and joins per discount; only the
    // ln rides, exactly the t40 contract ×3.
    "t45_lp" -> ((s, d) =>
      Seq(0.4, 0.75, 0.9).map { disc =>
        s.table(StandingLm.ensure(s, d, 2, disc))
          .withColumn("discount", lit(disc))
      }.reduce(_.unionByName(_))),

    // s22: the 32 ±1 sign vectors of the MIH code family (planes 100–131 —
    // a dedicated offset so the family is independent of the 0–31 LSH
    // planes). p is the LOCAL index 0..31; the oracle derives band = p//8
    // and bit position p%8 and repacks the four 8-bit band values itself.
    "mih_planes" -> ((s, d) => {
      import graft.operators.Similarity
      val dim = Similarity.vectorDim(t(s, d, "embeddings"), "embedding")
      import s.implicits._
      Similarity.hyperplaneSigns(s, 32, 100, dim).zipWithIndex
        .map { case (sv, p) => (p, sv.toSeq) }.toSeq
        .toDF("p", "signs")
    }),

    // s27: the hyperplane signs AT THE ADAPTIVE LSH KNOBS for this sf's
    // planted-near-dup universe (base embeddings + one perturbed copy per
    // vec_id < 50) — b·l planes through the operator's own derivation,
    // with b riding as a column so the oracle can replay table slicing
    // (p // b) and bit position (b−1 − p % b) at whatever knob step the
    // corpus size resolves to. The knobs change with sf, the dump follows.
    "adaptive_planes" -> ((s, d) => {
      import graft.operators.{Dedup, Similarity}
      val e = t(s, d, "embeddings")
      val dim = Similarity.vectorDim(e, "embedding")
      // same memo key as s27: the dump replays the gate's frozen knob
      val n = graft.operators.KnobMemo.corpusN(s, d + "#adaptive_lsh_n")(
        e.count() + e.filter(col("vec_id") < 50).count())
      val (b, l) = Dedup.adaptiveLshKnobs(n)
      import s.implicits._
      Similarity.hyperplaneSigns(s, b * l, 0, dim).zipWithIndex
        .map { case (sv, p) => (p, sv.toSeq, b) }.toSeq
        .toDF("p", "signs", "b")
    }),

    // s28: the MIH sign family (offset 100) at the ADAPTIVE bandBits for
    // this sf's corpus size — 4·bits planes, bits riding as a column
    // (the adaptive_planes contract for the code family).
    "adaptive_mih_planes" -> ((s, d) => {
      import graft.operators.Similarity
      val e = t(s, d, "embeddings")
      val dim = Similarity.vectorDim(e, "embedding")
      val bits = Similarity.adaptiveMihBandBits(
        graft.operators.KnobMemo.corpusN(s, d + "#emb_n")(e.count()))
      import s.implicits._
      Similarity.hyperplaneSigns(s, 4 * bits, 100, dim).zipWithIndex
        .map { case (sv, p) => (p, sv.toSeq, bits) }.toSeq
        .toDF("p", "signs", "bits")
    }),

    // q43/t30: xxhash64 over the user id — the HLL/KMV key primitive for
    // the events grouping. Keyed by user_id; the oracle recomputes
    // bucketing, rho, registers, bottom-k ranking and every estimate from
    // it in SQL (doc_hashes already covers the documents grouping).
    "user_hashes" -> ((s, d) =>
      Q.events(s, d).select(col("user_id")).distinct()
        .select(col("user_id"), xxhash64(col("user_id")).as("h"))),

    // q43: the linear-counting ln(m/zeros) table for zeros = 1..m —
    // materialized through the OPERATOR's own derivation (Sketches.lcLn),
    // the lockstep contract hyperplanes32 uses, because Spark's log is
    // StrictMath-based and DuckDB's ln may differ by 1 ulp.
    "hll_ln" -> ((s, d) =>
      s.range(1, graft.operators.Sketches.HllM + 1)
        .select(col("id").cast("int").as("z"),
          graft.operators.Sketches.lcLn(col("id")).as("lnv"))),

    // q44: distinct token × CMS row → row-seeded xxhash64 — materialized
    // through the operator's own cmsHash, joined back on the token STRING
    // so Spark's tokenization stays under oracle test (the d04 contract).
    "cms_hashes" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(tokens(col("text"))).as("tok")).distinct()
        .select(col("tok"),
          explode(sequence(lit(0), lit(graft.operators.Sketches.CmsDepth - 1))).as("r"))
        .select(col("tok"), col("r"),
          graft.operators.Sketches.cmsHash(col("r"), col("tok")).as("h"))),

    // e25: distinct user id × CMS row → row-seeded xxhash64 — the q44
    // cms_hashes contract for the EVENTS key domain (user_id is a long, so
    // the hash differs from any string token's), materialized through the
    // operator's own cmsHash; the oracle recomputes bucketing, the grid
    // and min-estimation from it in SQL.
    "user_cms_hashes" -> ((s, d) =>
      Q.events(s, d).select(col("user_id")).distinct()
        .select(col("user_id"),
          explode(sequence(lit(0), lit(graft.operators.Sketches.CmsDepth - 1))).as("r"))
        .select(col("user_id"), col("r"),
          graft.operators.Sketches.cmsHash(col("r"), col("user_id")).as("h"))),

    // q48: distinct profiled string image → xxhash64 — the HLL key
    // primitive for the column profiler. The oracle re-derives every
    // column's string image in SQL and joins on it (the d04 contract: a
    // divergent cast shows up as a dropped hash and a value mismatch),
    // then rebuilds registers and estimates from the hash.
    "profile_hashes" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.select(explode(array(
          col("o_orderstatus").cast("string"),
          col("o_custkey").cast("string"),
          col("o_orderpriority").cast("string"),
          col("o_totalprice").cast("decimal(18,2)").cast("string"))).as("v"))
        .filter(col("v").isNotNull).distinct()
        .select(col("v"), xxhash64(col("v")).as("h"))
    }),

    // t31: ln of the per-doc deterministic uniform — materialized through
    // the operator's own derivation (CorpusOps.wrsLogU); the oracle
    // recomputes the weighted keys and the ranking from it in SQL.
    "wrs_logu" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        graft.operators.CorpusOps.wrsLogU(col("doc_id")).as("lnu"))),

    // s07: the random-projection sign family (offset 1000, disjoint from
    // the LSH planes above) — same shared derivation, same lockstep
    // guarantee.
    "rp_signs16" -> ((s, d) => {
      import graft.operators.Similarity
      val dim = Similarity.vectorDim(t(s, d, "embeddings"), "embedding")
      import s.implicits._
      Similarity.hyperplaneSigns(s, 16, 1000, dim).zipWithIndex
        .map { case (sv, p) => (p, sv.toSeq) }.toSeq
        .toDF("p", "signs")
    }))
}
