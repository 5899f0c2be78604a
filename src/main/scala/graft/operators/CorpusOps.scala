package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{maxDupCount, maxRunLength, tokens, wordShingles}

/** Corpus-assembly operators for training-data pipelines (SURVEY §2.11):
  * reproducible splits, per-source quotas, vocabulary building. Everything is
  * hash-deterministic — re-running any of these on the same corpus yields
  * the same assignment on any cluster, which is what makes a 100 TB corpus
  * build auditable (no RNG state, no partition-order dependence).
  */
object CorpusOps {

  /** [[graft.functions.TextFunctions.wordShingles]] via the fused native
    * loop (optimization r20) — per-row cost only; the emitted shingle set
    * is bit-identical (spec-pinned at NativeFunctionsSpec).
    */
  private def shinglesFused(df: DataFrame, toks: Column, k: Int): Column =
    graft.functions.NativeFunctions.wordShinglesFused(df.sparkSession, toks, k)

  /** Deterministic bucket in [0, 100) for an id — the basis for splits and
    * quota ordering. xxhash64 decorrelates the bucket from any id structure
    * (sequential ids, sharded ranges); `pmod` keeps it non-negative.
    */
  def hashBucket(id: Column): Column = pmod(xxhash64(id), lit(100L))

  /** Reproducible train/val/test (or any) split: `weights` are cumulative
    * percentage cut-points over the hash bucket, e.g.
    * `Seq("train" -> 90, "val" -> 95, "test" -> 100)` → 90/5/5. A row's split
    * follows its id alone — stable under corpus growth, re-partitioning and
    * re-runs; adding documents never moves an existing one between splits
    * (the leakage guarantee contamination audits rely on).
    */
  def hashSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Int)]): DataFrame =
    df.withColumn("split", splitExpr(hashBucket(col(idCol)), weights))

  /** The cut-point fold shared by [[hashSplit]] and [[leakageSafeSplit]]:
    * bucket < cut₁ → name₁, else < cut₂ → name₂, …, else last name.
    */
  private def splitExpr(b: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.last._2 == 100,
      "weights must be cumulative cut-points ending at 100")
    weights.init.reverse.foldLeft(lit(weights.last._1)) {
      case (acc, (name, cut)) => when(b < cut, lit(name)).otherwise(acc)
    }
  }

  /** Leakage-safe (cluster-aware) corpus split — [[hashSplit]] with the
    * near-dup structure closed over: every document takes the split of
    * its DUP-CLUSTER representative's hash bucket, so a chain of near
    * duplicates can never straddle train/test — the eval-leakage mode a
    * doc-hash split is structurally blind to (the GPT-3-era
    * decontamination lesson applied AT SPLIT TIME instead of patched
    * with a screen afterwards; t34's contamination screen then audits
    * what remains, not what the split itself created). `moved` marks
    * docs whose own-hash split differs from their cluster's — the
    * attributable audit of what leakage-closing actually changed.
    * Singleton docs (no pair) are their own cluster, so on a dup-free
    * corpus this degenerates to [[hashSplit]] exactly. Cluster labels are
    * member ids (the closure's min-id representative), so they are cast
    * to `idCol`'s own type before hashing — xxhash64 is TYPE-sensitive,
    * and without the cast an int-id corpus joined to long labels would
    * hash singletons through an implicit widening and silently break the
    * degenerate-to-[[hashSplit]] contract (ADVICE r16).
    *
    * Scale shape: `clusters` is the (id, cluster) labeling the dedup
    * pipeline already maintains — d08 batch closure, d21 incremental
    * maintenance or the e36 streaming labels at 100 TB; the split never
    * recomputes it. The assignment itself is one id-keyed left join
    * plus two hash projections — no new shuffle class.
    */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame, idCol: String,
                       weights: Seq[(String, Int)]): DataFrame = {
    val idType = docs.schema(idCol).dataType
    docs // all input columns ride through, exactly like hashSplit's
      .join(clusters.select(col("id").cast(idType).as(idCol),
        col("cluster").cast(idType).as("cluster")),
        Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .withColumn("split", splitExpr(hashBucket(col("cluster")), weights))
      .withColumn("moved",
        splitExpr(hashBucket(col(idCol)), weights) =!= col("split"))
  }

  /** Per-group quota sampling (source mixing): keep at most `quota` rows per
    * `groupCol`, chosen by hash order (unbiased w.r.t. id ordering) with the
    * id as the deterministic tiebreak. One shuffle on the group key; the
    * per-group ranking never materializes more than the group's rows.
    */
  def quotaPerGroup(df: DataFrame, groupCol: String, idCol: String,
                    quota: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("__qrn", row_number().over(w))
      .filter(col("__qrn") <= quota)
      .drop("__qrn")
  }

  /** Corpus length profile: exact token-count percentiles alongside the
    * sketch the 100 TB path would use. Exact `percentile` is a full sort —
    * affordable for a profile pass, and the value the oracle can check;
    * `percentile_approx` (GK sketch, mergeable, one pass) rides along with a
    * closeness-contract column instead of a value check, because no two
    * engines sketch identically (same pattern as the q23 HLL contract).
    */
  def tokenPercentiles(docs: DataFrame, textCol: String,
                       ps: Seq[Double]): DataFrame = {
    val nTok = docs.select(size(tokens(col(textCol))).as("n_tokens"))
    nTok.agg(
      percentile(col("n_tokens"), array(ps.map(lit): _*)).as("qs"),
      percentile_approx(col("n_tokens"), array(ps.map(lit): _*), lit(10000)).as("qa"))
      .select(posexplode(arrays_zip(col("qs"), col("qa"))).as(Seq("idx", "z")))
      .select(col("idx"), col("z.qs").as("q"),
        when(abs(col("z.qa") - col("z.qs")) <= lit(0.02) * col("z.qs") + lit(1.0), 1)
          .otherwise(0).as("approx_within_contract"))
  }

  /** Vocabulary growth curve (Heaps-law audit): cumulative distinct-token
    * count at each 1/buckets corpus prefix, prefixes taken in
    * xxhash64(id) order — the growth-stable ordering every sampler here
    * uses, so the curve is a property of the corpus, not of ingestion
    * order, and re-running after appends extends rather than reshuffles
    * it. A flattening curve signals diversity exhaustion (new data re-uses
    * the existing vocabulary); scaling-law work reads exactly this shape.
    * Returns (q, n_docs, n_tokens, vocab) cumulative per prefix.
    *
    * Scale shape (VERDICT r15 #2 — the global NTILE implemented away):
    * prefix assignment needs the global (hash, id) RANK, but never a
    * single-partition window. The sign-bit-flipped hash's top bits cut
    * the hash space into `rangeBuckets` fixed equal-width RANGES —
    * deterministic, no sampling, monotone in (h, id) order, and uniform
    * because xxhash64 is — so the global rank decomposes into
    * (range offset) + (within-range row_number): per-range counts are
    * one `rangeBuckets`-row aggregate, their prefix-sum offsets a
    * window over `rangeBuckets` rows (bounded by the KNOB, not the
    * corpus — the t33 rank-window class), and the within-range
    * row_number is a window PARTITIONED by range. NTILE's bucket
    * function is then replayed arithmetically from (rank, N) — the
    * first N mod buckets buckets take ⌈N/buckets⌉ rows — so the result
    * is bit-identical to the global NTILE at any n (spec-pinned), and
    * at 100 TB no task ever sees more than ~N/rangeBuckets rows; grow
    * `rangeBuckets` with the corpus to hold per-task volume constant.
    */
  def vocabularyGrowth(docs: DataFrame, idCol: String, textCol: String,
                       buckets: Int = 4, rangeBuckets: Int = 1024): DataFrame = {
    val qd = vocabularyGrowthPrefixes(
      docs.select(col(idCol), col(textCol).as("text")), idCol,
      buckets, rangeBuckets)
      .select(col(idCol), col("text"), col("q"))
    val tok = qd.select(col("q"), explode(tokens(col("text"))).as("tok"))
    val perQ = tok.groupBy("q").agg(count(lit(1)).as("toks"))
    val docsQ = qd.groupBy("q").agg(count(lit(1)).as("docs"))
    val newV = tok.groupBy("tok").agg(min("q").as("q"))
      .groupBy("q").agg(count(lit(1)).as("new_vocab"))
    val cum = Window.orderBy("q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docsQ.join(perQ, "q").join(newV, Seq("q"), "left")
      .na.fill(0L, Seq("new_vocab"))
      .select(col("q"),
        sum("docs").over(cum).as("n_docs"),
        sum("toks").over(cum).as("n_tokens"),
        sum("new_vocab").over(cum).as("vocab"))
  }

  /** [[vocabularyGrowth]]'s prefix assignment — all input columns plus
    * `q`, the 1-based corpus-prefix bucket in global (xxhash64(id), id)
    * order, computed WITHOUT a single-partition window (see the
    * vocabularyGrowth scaladoc) and bit-identical to
    * `ntile(buckets) OVER (ORDER BY h, id)` (spec-pinned at every
    * n mod buckets residue).
    */
  private[graft] def vocabularyGrowthPrefixes(docs: DataFrame, idCol: String,
                                              buckets: Int,
                                              rangeBuckets: Int): DataFrame = {
    require(rangeBuckets > 1 && (rangeBuckets & (rangeBuckets - 1)) == 0,
      s"rangeBuckets must be a power of two > 1: $rangeBuckets")
    val shift = 64 - java.lang.Long.numberOfTrailingZeros(rangeBuckets.toLong)
    val ranged = docs
      .withColumn("h", xxhash64(col(idCol)))
      // flip the sign bit so unsigned top-bit order == signed h order
      .withColumn("fb", shiftrightunsigned(
        col("h").bitwiseXOR(lit(Long.MinValue)), shift))
    val perFb = ranged.groupBy("fb").agg(count(lit(1)).as("n_fb"))
    val wOff = Window.orderBy("fb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = perFb
      .withColumn("off", coalesce(sum("n_fb").over(wOff), lit(0L)))
      .select(col("fb"), col("off"))
    val totals = perFb.agg(sum("n_fb").as("n_tot"))
    val wIn = Window.partitionBy(col("fb")).orderBy(col("h"), col(idCol))
    ranged
      .withColumn("rin", row_number().over(wIn))
      .join(broadcast(offs), "fb")
      .crossJoin(broadcast(totals))
      .withColumn("rank", col("off") + col("rin"))
      .withColumn("base_sz", expr(s"n_tot DIV $buckets"))
      .withColumn("n_rem", col("n_tot") % buckets)
      .withColumn("big_cut", col("n_rem") * (col("base_sz") + 1))
      .withColumn("q",
        when(col("rank") <= col("big_cut"),
          expr("(rank - 1) DIV (base_sz + 1) + 1"))
          .otherwise(expr("n_rem + (rank - big_cut - 1) DIV base_sz + 1"))
          .cast("int"))
      .drop("h", "fb", "rin", "off", "n_tot", "rank", "base_sz", "n_rem",
        "big_cut")
  }

  /** Token-distribution DRIFT between a fresh batch and the standing
    * corpus — the ingest-anomaly alarm a production pipeline fires before
    * bad data lands: over the corpus's top-K tokens (deterministic
    * (count, token) cut), the χ² statistic of the batch's counts against
    * the corpus-proportional expectation, reported per token so the
    * alarm is attributable (WHICH tokens drifted, not just "something
    * did"). χ² is deliberate: pure rational arithmetic — exact integer
    * counts and one fixed double tree per row, no transcendentals —
    * so it is oracle-able without materialized primitives (KL would
    * need ln). Returns (rank, tok, corpus_n, fresh_n, expected,
    * contrib) with expected = F·cᵢ/C and contrib = (fᵢ-expected)²/expected,
    * C/F the within-top-K totals. Plan: two token-count aggregates
    * (map-side combined), a top-K cut, broadcast-sized joins after it.
    */
  def tokenDriftChi2(corpus: DataFrame, fresh: DataFrame, idCol: String,
                     textCol: String, topK: Int = 50): DataFrame =
    tokenDriftChi2FromCounts(corpus,
      fresh.select(explode(tokens(col(textCol))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("fresh_n")),
      textCol, topK)

  /** [[tokenDriftChi2]] against PRE-AGGREGATED fresh counts (tok,
    * fresh_n) — the serve tail the streaming drift monitor reads off its
    * materialized count state (e32), and the batch path's own core.
    */
  def tokenDriftChi2FromCounts(corpus: DataFrame, freshCounts: DataFrame,
                               textCol: String, topK: Int = 50): DataFrame = {
    // Unpartitioned rank window — DECIDED, not overlooked (VERDICT r15
    // #8): it ranks the aggregated per-token counts, whose cardinality
    // is the corpus VOCABULARY (bounded by language, ~10⁵–10⁷ rows at
    // any corpus size), not the corpus. A single task sorting the
    // vocabulary is cheaper than the t32-style range decomposition
    // would cost in extra stages; if a profile ever shows it hot, t32's
    // hash-range rank path applies verbatim. Same class as g-family
    // label rollups.
    val w = Window.orderBy(col("corpus_n").desc, col("tok"))
    val top = corpus.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("corpus_n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
    val joined = top.join(freshCounts, Seq("tok"), "left")
      .na.fill(0L, Seq("fresh_n"))
    val totals = joined.agg(sum("corpus_n").as("c_tot"), sum("fresh_n").as("f_tot"))
    joined.crossJoin(broadcast(totals))
      .withColumn("expected",
        col("f_tot").cast("double") * col("corpus_n").cast("double") /
          col("c_tot").cast("double"))
      .withColumn("contrib",
        (col("fresh_n").cast("double") - col("expected")) *
          (col("fresh_n").cast("double") - col("expected")) / col("expected"))
      .select("rank", "tok", "corpus_n", "fresh_n", "expected", "contrib")
  }

  /** Per-document top TF-IDF terms: tf(doc, t) · ln(N / df(t)). The corpus
    * size N travels as a broadcast 1-row aggregate (never a driver collect);
    * the doc-frequency table joins on the token key (O(vocab) — a shuffle
    * join, deliberately unhinted so AQE may broadcast it only when small).
    * One row_number per doc bounds the output.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    topPerDoc: Int): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("tok"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topPerDoc)
      .select(col(idCol), col("rank"), col("tok"), col("tfidf"))
  }

  /** Sequence packing: assign each document a (pack, offset) slot in a
    * stream of fixed `targetTokens` training sequences, one stream per
    * `shardCol` group (per-shard windows keep the cumsum parallel — a
    * single global ordering would serialize on one partition at corpus
    * scale). Documents are laid out in id order; a document starts at the
    * running-token offset of its shard, `pack = start div target`,
    * `offset = start mod target`. A document may straddle a pack boundary —
    * the consumer splits or pads at materialization time; this operator owns
    * the deterministic LAYOUT, which is what must be reproducible across
    * runs for resumable corpus builds. Integer div/mod (never the
    * double-routed `/`) so the layout stays exact at any cumsum magnitude.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, targetTokens: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(shardCol), col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(shardCol),
        call_function("div", col("start"), lit(targetTokens.toLong)).as("pack_no"),
        pmod(col("start"), lit(targetTokens.toLong)).as("offset"),
        col(idCol), col("n_tokens"))
  }

  /** Gopher-style repetition/boilerplate signals, all computed per-row with
    * HOFs — NO explode, NO shuffle: one projection over the corpus is the
    * whole plan, so the filter costs a scan at any scale.
    *  - `max_run`: longest run of the same token (.....aaaa.... spam);
    *  - `top_bigram_n` / `top_bigram_frac`: occurrences of the most frequent
    *    word bigram, absolute and as a fraction of all bigrams (boilerplate
    *    phrase repetition);
    *  - `dup_shingle_frac`: fraction of 5-gram shingles that are repeats of
    *    an earlier shingle (near-copy spans inside the document).
    */
  def repetitionSignals(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    val bg = shinglesFused(docs, tk, 2)
    val sh = shinglesFused(docs, tk, 5)
    docs.select(col(idCol),
      size(tk).cast("long").as("n_tokens"),
      maxRunLength(tk).as("max_run"),
      when(size(bg) > 0, maxDupCount(bg)).otherwise(0L).as("top_bigram_n"),
      when(size(bg) > 0, maxDupCount(bg).cast("double") / size(bg))
        .otherwise(0.0).as("top_bigram_frac"),
      when(size(sh) > 0,
        (size(sh) - size(array_distinct(sh))).cast("double") / size(sh))
        .otherwise(0.0).as("dup_shingle_frac"))
  }

  /** Within-document duplicate-BLOCK removal — the repetition family's
    * REWRITE rung (t12 measures repetition, this CLEANS it: the t11→t39
    * detect→rewrite pattern applied to boilerplate): the token stream
    * splits into consecutive `block`-token blocks, every repeat of an
    * earlier block drops (first occurrence wins, order preserved —
    * Spark's array_distinct contract), and the survivors rejoin. This
    * catches the copy-pasted paragraph / repeated boilerplate INSIDE one
    * document that whole-doc dedup structurally cannot (the within-doc
    * class of Lee et al. 2022, at block granularity — block-ALIGNED
    * repeats are removed exactly; unaligned repeats are left for the
    * shingle family, which detects but should not blindly rewrite them).
    * One shuffle-free HOF projection — a scan at any corpus size, like
    * the quality gate it composes with. The rewrite is in TOKEN space:
    * single-space rejoin, the engine-wide tokens() contract.
    */
  def dedupBlocks(docs: DataFrame, idCol: String, textCol: String,
                  block: Int = 5): DataFrame = {
    require(block > 0, s"block must be positive, got $block")
    // let-binding (the TextFunctions.bind trick): evaluate the token
    // array and the block array ONCE per row each, not per reference
    def bind(v: Column, f: Column => Column): Column =
      element_at(transform(array(v), f), 1)
    docs.select(col(idCol),
      bind(tokens(col(textCol)), tk =>
        bind(transform(
          sequence(lit(0),
            ceil(size(tk).cast("double") / block).cast("int") - 1),
          i => array_join(slice(tk, i * block + 1, lit(block)), " ")),
          bs => bind(array_distinct(bs), kept => struct(
            array_join(kept, " ").as("text_clean"),
            size(bs).cast("long").as("n_blocks"),
            (size(bs) - size(kept)).cast("long").as("n_removed")))))
        .as("r"))
      .select(col(idCol), col("r.text_clean"),
        col("r.n_blocks"), col("r.n_removed"))
  }

  /** Gopher/C4-style composite quality gate (Rae et al. 2021 §A1.1's rule
    * shape): per-document metrics, one boolean flag per rule, and the
    * conjunctive `keep` decision — the filter step of a training-data build,
    * kept as flags (not a filter) so downstream audits can count WHY
    * documents dropped, per rule, before committing to the cut.
    *
    * Rules (all bounds inclusive, tuned per corpus by the caller):
    *  - `r_len`:      minTokens ≤ n_tokens ≤ maxTokens
    *  - `r_mean_len`: minMeanLen ≤ mean token length ≤ maxMeanLen
    *  - `r_stop`:     stopword ratio ≥ minStopRatio (Gopher's "contains
    *                  required words" test, ratio form)
    *  - `r_rep`:      top bigram fraction ≤ maxTopBigramFrac (Gopher's
    *                  duplicate-n-gram cut at n=2)
    *  - `r_run`:      longest identical-token run ≤ maxRunTokens
    *
    * Every metric is a pure per-row projection (tokens/shingles/run HOFs from
    * [[graft.functions.TextFunctions]]) — shuffle-free, one corpus pass, no
    * UDF; ratios divide two exact integers so both engines see identical
    * doubles.
    *
    * Null-text rows are EXCLUDED (not scored): every metric would be null,
    * which would put the row in neither the keep nor the drop bucket —
    * invisible to the audit this operator exists for. Nullness screening
    * belongs to the upstream constraint audit ([[QualityChecks.audit]]
    * counts null violations loudly); this gate scores only scoreable text.
    */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
                  stopwords: Seq[String] = Seq("the", "a", "of", "and", "is"),
                  minTokens: Int = 20, maxTokens: Int = 90,
                  minMeanLen: Double = 4.0, maxMeanLen: Double = 5.0,
                  minStopRatio: Double = 0.03,
                  maxTopBigramFrac: Double = 0.1,
                  maxRunTokens: Int = 2,
                  carryCols: Seq[String] = Nil): DataFrame = {
    val tk = tokens(col(textCol))
    val n = size(tk)
    val meanLen = graft.functions.TextFunctions.meanTokenLen(col(textCol), tk)
    val stopR =
      graft.functions.TextFunctions.langScore(tk, stopwords).cast("double") / n
    val bg = shinglesFused(docs, tk, 2)
    val topBgFrac = when(size(bg) > 0,
      maxDupCount(bg).cast("double") / size(bg)).otherwise(0.0)
    val run = maxRunLength(tk)
    docs.filter(col(textCol).isNotNull)
      .select((col(idCol) +: carryCols.map(col)) ++ Seq(
        n.cast("long").as("n_tokens"),
        meanLen.as("mean_token_len"),
        stopR.as("stopword_ratio"),
        topBgFrac.as("top_bigram_frac"),
        run.as("max_run")): _*)
      .withColumn("r_len",
        col("n_tokens").between(minTokens, maxTokens))
      .withColumn("r_mean_len",
        col("mean_token_len").between(minMeanLen, maxMeanLen))
      .withColumn("r_stop", col("stopword_ratio") >= minStopRatio)
      .withColumn("r_rep", col("top_bigram_frac") <= maxTopBigramFrac)
      .withColumn("r_run", col("max_run") <= maxRunTokens)
      .withColumn("keep",
        col("r_len") && col("r_mean_len") && col("r_stop") &&
          col("r_rep") && col("r_run"))
  }

  /** Stratified deterministic sampling: keep a row iff its id's hash bucket
    * falls under the stratum's rate (`rateCol`, percent in [0,100]). The
    * selection follows the id alone — reproducible on any cluster, stable
    * under corpus growth, and shuffle-free (a filter over the scan).
    */
  def stratifiedSample(df: DataFrame, idCol: String, rateCol: Column): DataFrame =
    df.withColumn("hash_bucket", hashBucket(col(idCol)))
      .withColumn("rate", rateCol)
      .filter(col("hash_bucket") < col("rate"))

  /** ln(u) for the deterministic per-id uniform u = (h̄ + 0.5) / 2^64 with
    * h̄ the unsigned hash — u ∈ (0,1) strictly, so the log is finite. THE
    * shared derivation for [[weightedSample]] and the `wrs_logu` aux dump
    * (the lcLn/hyperplanes lockstep contract): the oracle takes the
    * transcendental from the dump and recomputes keys + ranking in SQL.
    */
  def wrsLogU(id: Column): Column = {
    val h = xxhash64(id)
    log((h.cast("double") +
      when(h < 0, lit(1.8446744073709552e19)).otherwise(lit(0.0)) +
      lit(0.5)) / lit(1.8446744073709552e19))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis 2006): each
    * row draws key = u^(1/w) from its id's deterministic uniform, and the k
    * largest keys are the sample — inclusion probability ∝ weight, in ONE
    * distributed pass with no sequential state. Ranked in log space
    * (ln(u)/w, monotone in the key) so no fractional pow enters the float
    * tree; ids break exact ties. Rows with non-positive weight are excluded
    * (the estimator is undefined there). Plan shape: a projection over the
    * scan + TakeOrderedAndProject — per-partition top-k, never a global
    * sort, the same 100 TB shape as q09.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int): DataFrame =
    df.filter(weight > 0)
      .withColumn("key", wrsLogU(col(idCol)) / weight.cast("double"))
      .orderBy(col("key").desc, col(idCol)).limit(k)

  /** Temperature-weighted source mixing (the multi-source sampling step of a
    * training-data build): source `s` gets a document budget proportional to
    * `tokens_s^0.5` — up-weighting small sources exactly like T=2
    * temperature sampling — and fills it with its hash-first documents.
    * sqrt is correctly rounded (IEEE), so the weights are bit-reproducible
    * across engines (which a fractional `pow` would NOT be); the weight
    * normalizer is folded in source order so double addition order cannot
    * perturb it. Plan shape: one agg on source (tiny), broadcast back, one
    * per-source window — scales as a corpus pass plus a bounded ranking.
    */
  def temperatureMix(docs: DataFrame, idCol: String, textCol: String,
                     srcCol: String, totalTarget: Long): DataFrame = {
    val perSource = docs.groupBy(col(srcCol))
      .agg(sum(size(tokens(col(textCol))).cast("long")).as("n_tokens"))
      .withColumn("w", sqrt(col("n_tokens").cast("double")))
    // Σw as a sequential fold over sources in name order: deterministic,
    // unlike a double SUM whose partial-agg order is engine/partition-chosen
    val norm = perSource
      .agg(aggregate(
        array_sort(collect_list(struct(col(srcCol), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("sum_w"))
    val targets = perSource.crossJoin(broadcast(norm))
      .withColumn("target_docs",
        floor(lit(totalTarget.toDouble) * col("w") / col("sum_w")).cast("long"))
      .select(col(srcCol), col("target_docs"))
    val w = Window.partitionBy(col(srcCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    docs.join(broadcast(targets), srcCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("target_docs"))
      .drop("__rn")
  }

  /** Per-source PERCENTILE quality gate: keep each source's best
    * `keepFrac` of rows by `scoreCol` — the adaptive-threshold variant of
    * a fixed-cutoff filter (CCNet keeps the head/middle perplexity
    * buckets PER SHARD for exactly this reason: one global cutoff
    * over-prunes clean sources and under-prunes noisy ones). Emits every
    * input row with its within-source `pct_rank` (PERCENT_RANK over
    * score-descending, id-tiebroken order — deterministic because ids are
    * unique) and `keep` = pct_rank <= keepFrac, so the drop reason stays
    * auditable like [[qualityGate]]'s flags.
    *
    * One source-key window pass; rank state per task is bounded by the
    * largest source's row count — the same skew profile as every
    * per-source window here (a pathological mega-source salts or
    * pre-splits upstream, which changes ITS percentile population
    * explicitly rather than silently).
    */
  def percentileGate(scored: DataFrame, idCol: String, srcCol: String,
                     scoreCol: String, keepFrac: Double): DataFrame = {
    require(keepFrac >= 0.0 && keepFrac <= 1.0,
      s"percentileGate: keepFrac must be in [0,1]: $keepFrac")
    val w = Window.partitionBy(col(srcCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    scored
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("keep", col("pct_rank") <= keepFrac)
  }

  /** TOKEN-budget mixture realization — the step after
    * [[temperatureMix]]'s weighting when the training recipe is budgeted
    * in tokens (as real mixtures are), not document counts: source `s`
    * gets `floor(totalTokenBudget · √tokens_s / Σ√tokens)` tokens and
    * fills it greedily with its hash-first documents' running token sum
    * (kept ⟺ the doc's CUMULATIVE count fits the budget — the fill
    * undershoots by at most one document, never splits one). The
    * cumulative sums are exact longs over the same deterministic
    * (xxhash64(id), id) order as every sampler here, so the realized
    * mixture is bit-stable on any partitioning and growth-stable under
    * corpus appends. Same plan shape as temperatureMix: one tiny source
    * agg, broadcast back, one per-source window pass.
    * Returns the KEPT rows with (n_tokens, cum_tokens, target_tokens).
    */
  def tokenBudgetMix(docs: DataFrame, idCol: String, textCol: String,
                     srcCol: String, totalTokenBudget: Long): DataFrame = {
    val withN = docs.withColumn("n_tokens",
      size(tokens(col(textCol))).cast("long"))
    val perSource = withN.groupBy(col(srcCol))
      .agg(sum(col("n_tokens")).as("__src_tokens"))
      .withColumn("w", sqrt(col("__src_tokens").cast("double")))
    // Σw as a sequential fold in source-name order (the temperatureMix
    // determinism argument: double addition order must not perturb it)
    val norm = perSource
      .agg(aggregate(
        array_sort(collect_list(struct(col(srcCol), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("sum_w"))
    val targets = perSource.crossJoin(broadcast(norm))
      .withColumn("target_tokens",
        floor(lit(totalTokenBudget.toDouble) * col("w") / col("sum_w")).cast("long"))
      .select(col(srcCol), col("target_tokens"))
    val w = Window.partitionBy(col(srcCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withN.join(broadcast(targets), srcCol)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= col("target_tokens"))
  }

  /** The corpus build's last mile: materialize the curated corpus as a
    * partitioned lake layout — one directory per (split, source), documents
    * sorted by id within each file. Readers prune partitions (training
    * touches `split=train` only; a source quarantine drops one directory),
    * and the sorted ids make per-file row order reproducible, so two builds
    * of the same curated corpus are byte-comparable file by file.
    */
  def writeCurated(docs: DataFrame, path: String, idCol: String = "doc_id",
                   splitCol: String = "split", srcCol: String = "source",
                   maxRecordsPerFile: Long = 0L): Unit = {
    val writer = docs.repartition(col(splitCol), col(srcCol))
      .sortWithinPartitions(col(splitCol), col(srcCol), col(idCol))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
    // hash-repartitioning on the partition columns yields ~one file per
    // (split, source) directory; at 100 TB a hot source would make that
    // file huge — cap records per file so the writer rolls files (the
    // sort above keeps every rolled file internally ordered). Only set
    // when requested: the per-write option OVERRIDES the session's
    // spark.sql.files.maxRecordsPerFile, and 0 would override it with
    // "unlimited".
    val capped =
      if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile)
      else writer
    capped.partitionBy(splitCol, srcCol).parquet(path)
  }

  /** Per-document term frequencies: one (id, tok, tf) row per distinct
    * (doc, token) — the shared first aggregation of TF-IDF, the vocabulary
    * head, and the t08 idf aux dump.
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))

  /** Unigram language-model corpus table: token → (count, log-prob) for the
    * `vocabCap` most frequent tokens. The LM side of a CCNet-style
    * perplexity filter, deterministic end to end: counts are exact, the
    * collect is bounded by the vocab cap (the real design — production LMs
    * ship a capped vocab), ties order by token.
    */
  def unigramLm(docs: DataFrame, idCol: String, textCol: String,
                vocabCap: Int = 65536): DataFrame = {
    val counts = docs
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val totalRow = counts.agg(sum(col("n")).cast("long")).head()
    // empty corpus → SUM is null → empty LM (degrade-not-throw, like
    // kmeansCentroids on an empty corpus)
    if (totalRow.isNullAt(0))
      return counts.select(col("tok"), col("n"), lit(0.0).as("lp")).limit(0)
    val total = totalRow.getLong(0)
    counts.orderBy(col("n").desc, col("tok")).limit(vocabCap)
      .select(col("tok"), col("n"),
        log(col("n").cast("double") / total.toDouble).as("lp"))
  }

  /** Per-document mean unigram log-probability — the quality signal a
    * CCNet-style perplexity filter thresholds on (low mean log-prob = the
    * LM finds the text surprising = tail bucket). Out-of-vocab tokens score
    * `oovLp`; the per-doc sum always folds in TOKEN ORDER from a 0.0 seed,
    * so the float result is reproducible (a per-doc double SUM after a join
    * would be partition-order-dependent) and BOTH plan shapes below are
    * bit-identical.
    *
    * Two shapes behind one contract, picked by vocab size:
    *  - ≤ `literalVocabMax` entries: the LM embeds as a constant-folded map
    *    LITERAL in the plan and the fold is one `aggregate` HOF over the
    *    token array — no explode, no shuffle, one projection over the scan.
    *  - larger: a literal that size would bloat every consumer's plan and
    *    codegen, so the LM stays distributed — `posexplode` the tokens,
    *    broadcast map-side join against the LM (one hash lookup per token,
    *    no corpus shuffle), then re-assemble each doc's (pos, lp) list and
    *    fold it SORTED BY POS: the identical addition sequence as the
    *    literal path, exactness spec-pinned. Per-doc state is the doc's own
    *    token list — the bounded-history envelope every per-doc HOF here
    *    already has.
    */
  def unigramLogprob(docs: DataFrame, idCol: String, textCol: String,
                     lm: DataFrame, oovLp: Double,
                     literalVocabMax: Int = 65536): DataFrame =
    unigramLogprobFrom(docs, idCol, textCol, lm,
      probeLm(lm, literalVocabMax), oovLp, literalVocabMax)

  /** Probe limit+1 rows: decides the literal-vs-broadcast path without
    * counting (or collecting) an over-threshold vocab on the driver. Shared
    * with [[dsirWeights]] so its fallback path does not probe each LM a
    * second time inside the composed [[unigramLogprob]] calls.
    */
  private def probeLm(lm: DataFrame, literalVocabMax: Int) =
    lm.select(col("tok"), col("lp")).limit(literalVocabMax + 1).collect()

  private def unigramLogprobFrom(docs: DataFrame, idCol: String,
                                 textCol: String, lm: DataFrame,
                                 entries: Array[org.apache.spark.sql.Row],
                                 oovLp: Double,
                                 literalVocabMax: Int): DataFrame = {
    val tk = tokens(col(textCol))
    if (entries.length <= literalVocabMax) {
      val lpMap = map_from_arrays(
        lit(entries.map(_.getString(0))), lit(entries.map(_.getDouble(1))))
      docs.select(col(idCol),
        size(tk).cast("long").as("n_tokens"),
        (aggregate(tk, lit(0.0),
          (acc, t) => acc + coalesce(element_at(lpMap, t), lit(oovLp)))
          / size(tk)).as("mean_logprob"))
    } else {
      val toks = docs
        .select(col(idCol), posexplode(tk).as(Seq("pos", "tok")))
        .join(broadcast(lm.select(col("tok"), col("lp"))), Seq("tok"), "left")
        .groupBy(col(idCol))
        .agg(aggregate(
          array_sort(collect_list(
            struct(col("pos"), coalesce(col("lp"), lit(oovLp)).as("lp")))),
          lit(0.0), (acc, x) => acc + x.getField("lp")).as("__sum_lp"))
      // zero-token docs emit no explode rows — restore them from the docs
      // side; 0.0/0 = NaN on both paths (double division, IEEE)
      docs.select(col(idCol), size(tk).cast("long").as("n_tokens"))
        .join(toks, Seq(idCol), "left")
        .select(col(idCol), col("n_tokens"),
          (coalesce(col("__sum_lp"), lit(0.0)) / col("n_tokens"))
            .as("mean_logprob"))
    }
  }

  /** Bigram language-model corpus table: space-joined bigram → (count,
    * context-count, log conditional probability ln(n/ctx)) for the
    * `vocabCap` most frequent bigrams — the n=2 step up from [[unigramLm]]
    * in a KenLM-style perplexity-filter ladder. `ctx` counts the first
    * token's appearances AS A BIGRAM CONTEXT (i.e. the sum of bigram counts
    * sharing its first token), so p(w2|w1) columns are exactly normalized:
    * Σ_w2 p(w2|w1) = 1. Counts are exact; the context aggregation runs over
    * the (small) bigram-count table, never the token stream; ties on the
    * cap order by bigram string.
    */
  def bigramLm(docs: DataFrame, idCol: String, textCol: String,
               vocabCap: Int = 262144): DataFrame = {
    val counts = docs
      .select(explode(shinglesFused(docs, tokens(col(textCol)), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("n"))
    val ctx = counts
      .groupBy(substring_index(col("bg"), " ", 1).as("__w1"))
      .agg(sum(col("n")).as("ctx"))
    counts
      .join(ctx, substring_index(col("bg"), " ", 1) === col("__w1"))
      .orderBy(col("n").desc, col("bg")).limit(vocabCap)
      .select(col("bg"), col("n"), col("ctx"),
        log(col("n").cast("double") / col("ctx")).as("lp"))
  }

  /** Interpolated Kneser–Ney bigram LM (Kneser & Ney 1995; the Chen &
    * Goodman 1998 interpolated form with a single absolute discount D) —
    * the standard smoothing rung above [[bigramLm]]'s MLE conditionals:
    *
    *   P(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·)
    *            + (D · N1+(w1 ·)/c(w1·)) · N1+(· w2)/N
    *
    * where N1+(w1 ·) = distinct continuations of w1, N1+(· w2) = distinct
    * left contexts of w2 (the continuation probability — "how novel are
    * the contexts this word appears in", the insight that makes KN beat
    * Good–Turing on fluency filtering), and N = distinct bigram types.
    * Every sufficient statistic is an exact integer count; D = 0.75 is
    * exactly representable, so the probability is one deterministic IEEE
    * expression over exact inputs and only the final ln is transcendental
    * — the same trust envelope as [[bigramLm]] (the t40 oracle revalidates
    * ALL five counts by joining on them and takes only `lp` on faith).
    *
    * Scale shape: one corpus-wide bigram aggregation, then everything is
    * vocabulary-sized — two reaggregations of the persisted count table
    * (by w1 and by w2), a one-row type total riding as a broadcast, and
    * the ranked `vocabCap` cut (TakeOrderedAndProject, the t06 shape).
    * Returns (bg, n, ctx, n1f, n1b, nbg, lp). Feed the (bg, lp) columns
    * to [[bigramLogprob]] for per-document scoring — the fold, OOV floor
    * and broadcast-join economics are identical by construction.
    */
  def kneserNeyLm(docs: DataFrame, idCol: String, textCol: String,
                  discount: Double = 0.75,
                  vocabCap: Int = 262144): DataFrame = {
    val counts = Caching.persisted(docs
      .select(explode(shinglesFused(docs, tokens(col(textCol)), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("n"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1)))
    val ctx = counts.groupBy(col("w1"))
      .agg(sum(col("n")).as("ctx"), count(lit(1)).as("n1f"))
    val cont = counts.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val tot = counts.agg(count(lit(1)).as("nbg"))
    val d = lit(discount)
    counts
      .join(ctx, "w1").join(cont, "w2").crossJoin(broadcast(tot))
      .orderBy(col("n").desc, col("bg")).limit(vocabCap)
      .select(col("bg"), col("n"), col("ctx"), col("n1f"), col("n1b"),
        col("nbg"),
        log(
          greatest(col("n").cast("double") - d, lit(0.0)) /
            col("ctx").cast("double") +
          (d * col("n1f").cast("double") / col("ctx").cast("double")) *
            (col("n1b").cast("double") / col("nbg").cast("double"))).as("lp"))
  }

  /** Interpolated Kneser–Ney TRIGRAM LM (t41) — the n=3 rung above
    * [[kneserNeyLm]], with the standard recursive backoff
    * (Chen & Goodman '98, eq. 16–18):
    *
    *   P(w3|w1w2) = max(c(w1w2w3) − D, 0)/c(w1w2·)
    *              + D·N1+(w1w2·)/c(w1w2·) · P_mid(w3|w2)
    *   P_mid(w3|w2) = max(N1+(·w2w3) − D, 0)/N1+(·w2·)
    *              + D·N1+(w2·)/N1+(·w2·) · P_uni(w3)
    *   P_uni(w3) = N1+(·w3)/N_bigram_types
    *
    * where the MIDDLE level counts trigram TYPES (the continuation-count
    * insight applied recursively — N1+(·w2w3) = distinct w1 preceding the
    * bigram, N1+(·w2·) = distinct (w1,w3) pairs around w2, N1+(w2·) =
    * distinct w3 after w2 in any trigram) and the unigram level counts
    * bigram types exactly as [[kneserNeyLm]]. All EIGHT sufficient
    * statistics are exact integer counts — the t41 oracle recounts every
    * one in SQL, joins on them, and takes only `lp` on faith (t40's trust
    * envelope, one order up).
    *
    * Scale shape: ONE corpus-wide trigram aggregation + one bigram
    * aggregation, then everything is vocabulary-sized — three
    * reaggregations of the persisted trigram type table (by (w1,w2), by
    * (w2,w3), by w2), one of the bigram table, a one-row type total
    * riding as a broadcast, and the ranked `vocabCap` cut. Returns
    * (tg, n, ctx, n1f, cont, mid_ctx, mid_n1f, n1b, nbg, lp); feed
    * (tg, lp) to [[trigramLogprob]].
    */
  def kneserNeyTrigramLm(docs: DataFrame, idCol: String, textCol: String,
                         discount: Double = 0.75,
                         vocabCap: Int = 262144): DataFrame = {
    val tgc = Caching.persisted(docs
      .select(explode(shinglesFused(docs, tokens(col(textCol)), 3)).as("tg"))
      .groupBy(col("tg")).agg(count(lit(1)).as("n"))
      .withColumn("w1", substring_index(col("tg"), " ", 1))
      .withColumn("w2",
        substring_index(substring_index(col("tg"), " ", 2), " ", -1))
      .withColumn("w3", substring_index(col("tg"), " ", -1)))
    val bgc = Caching.persisted(docs
      .select(explode(shinglesFused(docs, tokens(col(textCol)), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("bn"))
      .withColumn("b2", substring_index(col("bg"), " ", -1)))
    val ctx3 = tgc.groupBy(col("w1"), col("w2"))
      .agg(sum(col("n")).as("ctx"), count(lit(1)).as("n1f"))
    val cont3 = tgc.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("cont"))
    val mid = tgc.groupBy(col("w2"))
      .agg(count(lit(1)).as("mid_ctx"),
        count_distinct(col("w3")).as("mid_n1f"))
    val uni = bgc.groupBy(col("b2")).agg(count(lit(1)).as("n1b"))
      .withColumnRenamed("b2", "w3")
    val tot = bgc.agg(count(lit(1)).as("nbg"))
    val d = lit(discount)
    tgc
      .join(ctx3, Seq("w1", "w2")).join(cont3, Seq("w2", "w3"))
      .join(mid, Seq("w2")).join(uni, Seq("w3")).crossJoin(broadcast(tot))
      .orderBy(col("n").desc, col("tg")).limit(vocabCap)
      .select(col("tg"), col("n"), col("ctx"), col("n1f"), col("cont"),
        col("mid_ctx"), col("mid_n1f"), col("n1b"), col("nbg"),
        log(
          greatest(col("n").cast("double") - d, lit(0.0)) /
            col("ctx").cast("double") +
          (d * col("n1f").cast("double") / col("ctx").cast("double")) *
            (greatest(col("cont").cast("double") - d, lit(0.0)) /
               col("mid_ctx").cast("double") +
             (d * col("mid_n1f").cast("double") /
                col("mid_ctx").cast("double")) *
               (col("n1b").cast("double") / col("nbg").cast("double"))))
          .as("lp"))
  }

  /** Order-GENERIC interpolated Kneser–Ney LM (VERDICT r13 #7) — the
    * recursion [[kneserNeyLm]] (n=2) and [[kneserNeyTrigramLm]] (n=3)
    * hand-roll, written once for any `order` ≥ 2 (Chen & Goodman '98
    * eq. 16–18, the full recursive backoff):
    *
    *   P_k(w_k|w_{1..k-1}) = max(c_k − D, 0)/ctx_k
    *                       + D·N1+_k/ctx_k · P_{k-1}(w_k|w_{2..k-1})
    *
    * where the TOP level uses raw corpus counts (c = n-gram count,
    * ctx = context token count, N1+ = distinct continuations) and every
    * MIDDLE level k uses continuation TYPE counts from the (k+1)-gram
    * type table — cont_k = N1+(·w_{1..k}) (distinct left extensions),
    * mid_ctx_k = N1+(·w_{1..k-1}·) (distinct extension pairs around the
    * context), mid_n1f_k = N1+(w_{1..k-1}·) at type level — grounding in
    * P_1(w) = N1+(·w)/|bigram types|. Each per-level probability is built
    * with the IDENTICAL float expression sequence as the hand-rolled
    * builders, so order 2 and 3 are bit-exact fixed points of this
    * generalization (spec-pinned against [[kneserNeyLm]] /
    * [[kneserNeyTrigramLm]] — the t40/t41 oracles grade the recursion's
    * base cases).
    *
    * Scale shape: `order − 1` corpus n-gram aggregations (orders
    * 2..order — the lower-order TYPE tables cannot be sliced out of the
    * top table because short documents and gram tails fall outside it),
    * then everything is vocabulary-sized: per-level reaggregations of the
    * persisted type tables, suffix-keyed joins down the backoff chain, a
    * one-row type total riding as a broadcast, and the ranked `vocabCap`
    * cut. Returns (g, n, ctx, n1f, then per middle level k
    * (cont{k}, mid_ctx{k}, mid_n1f{k}) from k = order−1 down to 2,
    * n1b, nbg, lp) — every sufficient statistic flattened so an oracle
    * can recount and join on all of them, taking only `lp` on faith.
    */
  def kneserNeyLmOrder(docs: DataFrame, idCol: String, textCol: String,
                       order: Int, discount: Double = 0.75,
                       vocabCap: Int = 262144): DataFrame =
    kneserNeyHeadFromCounts(
      k => knGramCounts(docs, textCol, k), order, discount, vocabCap)

  /** The KN sufficient-statistics primitive: raw k-gram corpus counts
    * (g, n) — ONE exploded aggregation over the corpus, and the only
    * corpus-sized computation in any Kneser–Ney build (every statistic in
    * [[kneserNeyHeadFromCounts]] derives from these tables). Counts are
    * exact longs, so they fold ADDITIVELY under corpus append — the
    * property the standing gram-count lake ([[writeKnGramTable]] /
    * [[maintainKnGramTable]]) turns into the LM family's maintenance
    * rung.
    */
  def knGramCounts(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(shinglesFused(docs, tokens(col(textCol)), k)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))

  /** [[kneserNeyLmOrder]]'s head derivation split from its corpus passes:
    * builds the order-`order` KN head from a PROVIDER of k-gram count
    * tables (k = 2..order, each (g, n)) instead of the corpus itself —
    * the expression tree is the same object code as the docs-driven
    * builder, so a head derived from maintained standing gram tables is
    * bit-identical to a from-scratch retrain whenever the summed counts
    * match (exact integers in, the identical float tree out). The
    * provider is memoized AND persisted: each order's table computes once
    * however many levels consume it — gc(2) feeds both the type total and
    * the continuation-unigram grouping, gc(order) both the last middle
    * level's types and the raw top counts (the docs path previously
    * recomputed the top-order gram aggregation twice, and a table-backed
    * provider would otherwise re-run its epoch-sum merge per consumer).
    *
    * `spreadProviders` (VERDICT r17 #5): a TABLE-backed provider's
    * bucket-local epoch merge emits only bucket-count partitions (8), so
    * at ×30 gram volumes the eleven-statistic join fan-out ran ~1M-row
    * partitions on a 32-thread host — GC pressure that swung the ×30 head
    * derivation 16–59 s across identical inputs. `true` repartitions each
    * persisted provider by `g` to the session's shuffle parallelism
    * before the joins (values unchanged — exact integer counts; the float
    * tree is row-local past the joins). The direct corpus path stays
    * `false`: its providers already come out of a 32-way groupBy, and the
    * forced re-exchange would be pure overhead.
    */
  def kneserNeyHeadFromCounts(gramCounts: Int => DataFrame, order: Int,
                              discount: Double = 0.75,
                              vocabCap: Int = 262144,
                              spreadProviders: Boolean = false): DataFrame = {
    require(order >= 2, s"order must be >= 2, got $order")
    val d = lit(discount)
    val memo = scala.collection.mutable.Map.empty[Int, DataFrame]
    def gc(k: Int): DataFrame =
      memo.getOrElseUpdate(k, Caching.persisted(
        if (spreadProviders) gramCounts(k).repartition(col("g"))
        else gramCounts(k)))
    // level 1: continuation unigrams from bigram TYPES
    val bg = gc(2)
    val tot = bg.agg(count(lit(1)).as("nbg"))
    var stats: Seq[String] = Seq("n1b", "nbg")
    var p: DataFrame = bg
      .groupBy(substring_index(col("g"), " ", -1).as("sfx"))
      .agg(count(lit(1)).as("n1b"))
      .crossJoin(broadcast(tot))
      .select(Seq(col("sfx"), col("n1b"), col("nbg"),
        (col("n1b").cast("double") / col("nbg").cast("double")).as("p")): _*)
    // middle levels k = 2 .. order−1, each from the (k+1)-gram type table
    for (k <- 2 until order) {
      val types = gc(k + 1)
        .select(substring_index(col("g"), " ", -k).as("sfxk"),
          substring_index(substring_index(col("g"), " ", k), " ", -(k - 1))
            .as("midk"),
          substring_index(col("g"), " ", -1).as("lastw"))
      val contk = types.groupBy(col("sfxk"))
        .agg(count(lit(1)).as(s"cont$k"))
      val midk = types.groupBy(col("midk"))
        .agg(count(lit(1)).as(s"mid_ctx$k"),
          count_distinct(col("lastw")).as(s"mid_n1f$k"))
      val prevStats = stats
      p = contk
        .withColumn("midk", substring_index(col("sfxk"), " ", k - 1))
        .join(midk, "midk")
        .withColumn("psfx", substring_index(col("sfxk"), " ", -(k - 1)))
        .join(p.select(col("sfx").as("psfx") +: col("p").as("p_prev") +:
          prevStats.map(col): _*), "psfx")
        .select(col("sfxk").as("sfx") +:
          col(s"cont$k") +: col(s"mid_ctx$k") +: col(s"mid_n1f$k") +:
          (prevStats.map(col) :+
            (greatest(col(s"cont$k").cast("double") - d, lit(0.0)) /
              col(s"mid_ctx$k").cast("double") +
              (d * col(s"mid_n1f$k").cast("double") /
                col(s"mid_ctx$k").cast("double")) * col("p_prev")).as("p")): _*)
      stats = Seq(s"cont$k", s"mid_ctx$k", s"mid_n1f$k") ++ prevStats
    }
    // top level: raw corpus counts at `order`
    val topc = gc(order)
    val ctxF = topc
      .groupBy(substring_index(col("g"), " ", order - 1).as("ctxg"))
      .agg(sum(col("n")).as("ctx"), count(lit(1)).as("n1f"))
    topc
      .withColumn("ctxg", substring_index(col("g"), " ", order - 1))
      .join(ctxF, "ctxg")
      .withColumn("sfx", substring_index(col("g"), " ", -(order - 1)))
      .join(p.select(col("sfx") +: col("p").as("p_prev") +:
        stats.map(col): _*), "sfx")
      .orderBy(col("n").desc, col("g")).limit(vocabCap)
      .select(col("g") +: col("n") +: col("ctx") +: col("n1f") +:
        (stats.map(col) :+
          log(greatest(col("n").cast("double") - d, lit(0.0)) /
            col("ctx").cast("double") +
            (d * col("n1f").cast("double") / col("ctx").cast("double")) *
              col("p_prev")).as("lp")): _*)
  }

  // ---- standing KN gram-count lake (the LM family's maintenance rung) ----

  /** Persist a corpus's k-gram counts as a STANDING gram-count table —
    * the d26 label-lake pattern for the LM family's sufficient
    * statistics. Layout: (g, n, epoch) bucketed + sorted by g; the base
    * build writes every row at epoch 0 and [[maintainKnGramTable]]
    * APPENDS an ingest batch's batch-local counts at higher epochs —
    * merge-on-read by per-gram ADDITION ([[readKnGramCounts]]; counts
    * are exact longs, so sum-of-epochs ≡ a from-scratch recount of the
    * grown corpus), never a corpus-sized rewrite on the ingest path.
    * Unlike the label fold (a fixed point, value-idempotent on retry), a
    * count delta is NOT re-appendable — so maintenance is EPOCH-KEYED
    * and replaying an applied epoch is a no-op (exactly-once by table
    * inspection; a production lake would track applied epochs in the
    * catalog). The table is discount-independent (the t45 sweep
    * property): one gram family serves every smoothing point, and the
    * head re-derives gram-table-sized via [[kneserNeyHeadFromCounts]] —
    * no corpus pass ever runs at serve or maintenance time beyond the
    * batch's own counting.
    */
  def writeKnGramTable(spark: org.apache.spark.sql.SparkSession,
                       name: String, counts: DataFrame,
                       buckets: Int = 8): String = {
    val fresh = !spark.catalog.tableExists(name)
    graft.sources.BucketedLake.writeBucketedTable(spark, name,
      counts.select(col("g"), col("n")).withColumn("epoch", lit(0L)),
      "g", buckets)
    // base build = frontier 0 in the catalog — but only on a FRESH write
    // (writeBucketedTable no-ops on an existing table, and resetting the
    // property would un-apply every recorded fold)
    if (fresh) graft.sources.BucketedLake.setFrontier(spark, name, 0L)
    name
  }

  /** Fold an ingest batch's k-gram counts into a standing gram-count
    * table at `epoch` (a caller-assigned ingest identifier, > 0): the
    * delta rows append under the catalog-validated bucket spec and
    * merge-on-read addition does the rest. Returns true when the fold
    * applied, false when it no-opped as a replay.
    *
    * Epoch assignment is MONOTONIC and that is now ENFORCED, not assumed
    * (ADVICE r17): a fold applies iff `epoch` exceeds the table's
    * catalog-tracked frontier ([[graft.sources.BucketedLake.frontier]]),
    * so any epoch ≤ the frontier — a frontier replay, a delayed retry of
    * a pre-frontier epoch after [[compactKnGramTable]] collapsed its rows,
    * an out-of-order assignment — is a no-op instead of a silent
    * double-count (additive deltas are not re-appendable; the frontier IS
    * the exactly-once contract). The frontier advances on EVERY applied
    * fold, including an empty batch (the epoch is recorded in the
    * catalog, never inferred from appended rows — ADVICE r17's empty-
    * batch hole: zero appended rows used to leave the epoch replayable
    * with different content). No per-fold data scan (VERDICT r17 #6);
    * tables from before the property fall back to one max(epoch) read.
    * A retry of an epoch whose append landed but whose frontier write was
    * lost to a crash (ADVICE r18) is detected by row presence and
    * resolves as a property repair, never a second append — the call
    * still returns true because the fold IS applied on exit.
    */
  def maintainKnGramTable(spark: org.apache.spark.sql.SparkSession,
                          name: String, batchCounts: DataFrame,
                          epoch: Long, buckets: Int = 8): Boolean =
    // the whole exactly-once algorithm — frontier gate, row-presence
    // replay repair (ADVICE r18), residual empty-fold window (ADVICE
    // r19) — lives ONCE in the shared ledger helper; this family's only
    // specifics are its (g, n) shape and bucket key
    graft.sources.BucketedLake.appendBucketedTableOnce(spark, name,
      batchCounts.select(col("g"), col("n")), epoch, "g", buckets)

  /** The current k-gram counts from a standing gram-count table: per-gram
    * SUM across epochs (map-side combine IS the merge, and the table is
    * bucketed by g, so the fold is bucket-local — no exchange). Plugs
    * straight into [[kneserNeyHeadFromCounts]] as one order's provider.
    */
  def readKnGramCounts(spark: org.apache.spark.sql.SparkSession,
                       name: String): DataFrame =
    spark.table(name).groupBy(col("g")).agg(sum(col("n")).as("n"))

  /** Compact a standing gram-count table back to a single epoch — the
    * label lake's cadence rung ([[graft.operators.Dedup
    * .compactClusterLabels]]) for gram counts: the merged sums
    * materialize once, the table rewrites under the SAME bucket spec,
    * superseded delta rows drop, and reads are bit-identical before and
    * after ([[readKnGramCounts]] IS the merge the rewrite materializes).
    * Unlike the label compaction (which rewrites at epoch 0), the single
    * surviving epoch is the FRONTIER — max(epoch) — because here the
    * epoch column doubles as the exactly-once ledger: collapsing to 0
    * would let a replayed frontier fold re-apply and double-count.
    * Preserving the frontier keeps the row-level ledger legible, and the
    * catalog frontier property (which [[maintainKnGramTable]] enforces
    * monotonicity against — ADVICE r17) survives the rewrite, so a
    * delayed pre-frontier retry stays a no-op even after its rows
    * collapsed. Run compaction on a cadence, never concurrently with an
    * ingest.
    */
  def compactKnGramTable(spark: org.apache.spark.sql.SparkSession,
                         name: String, buckets: Int = 8): String = {
    val frontier = graft.sources.BucketedLake.frontier(spark, name)
      .getOrElse(spark.table(name)
        .agg(coalesce(max(col("epoch")), lit(0L))).head().getLong(0))
    // merged sums materialize BEFORE the overwrite through the shared
    // held-handle rewrite (the rewrite reads the table it replaces)
    graft.sources.BucketedLake.rewriteBucketedTable(spark, name,
      readKnGramCounts(spark, name).withColumn("epoch", lit(frontier)),
      "g", buckets)
    // the Overwrite drops table properties — restore the frontier so the
    // monotonic-fold ledger survives compaction
    graft.sources.BucketedLake.setFrontier(spark, name, frontier)
    name
  }

  /** Per-document mean bigram log-probability — [[unigramLogprob]]'s n=2
    * sibling (a sharper fluency/perplexity signal: token-ORDER violations
    * score low even when every unigram is common). Out-of-vocab bigrams
    * score `oovLp`; the per-doc sum folds in bigram-position order from a
    * 0.0 seed, so the float result is partition-order-independent.
    *
    * Always the broadcast-join shape (posexplode → map-side hash join →
    * sorted re-fold): a bigram vocabulary is quadratically richer than a
    * unigram one and routinely exceeds any sane plan-literal budget, so
    * the distributed LM is the only scale path ([[unigramLogprob]]'s
    * literal-vs-join bit-parity spec covers the fold equivalence this
    * relies on). Documents with fewer than 2 tokens yield no bigrams and
    * are absent from the output — the caller's contract.
    */
  def bigramLogprob(docs: DataFrame, idCol: String, textCol: String,
                    lm: DataFrame, oovLp: Double): DataFrame =
    gramLogprob(docs, idCol, textCol, lm, oovLp, 2, "bg", "n_bigrams")

  /** [[bigramLogprob]]'s n=3 sibling, scoring against a
    * [[kneserNeyTrigramLm]] (or any (tg, lp) table) — the production
    * fluency-filter rung (t41). Identical fold, contract and scale shape;
    * documents with fewer than 3 tokens yield no trigrams and are absent.
    */
  def trigramLogprob(docs: DataFrame, idCol: String, textCol: String,
                     lm: DataFrame, oovLp: Double): DataFrame =
    gramLogprob(docs, idCol, textCol, lm, oovLp, 3, "tg", "n_trigrams")

  /** The shared n-gram scoring fold: posexplode the k-gram array,
    * broadcast-join the LM, re-fold per doc SORTED BY POSITION from a 0.0
    * seed (partition-order-independent floats). The per-doc gram count is
    * the ROW COUNT, not size(gramArr) carried through the explode: the
    * left join preserves every exploded row, so the two are equal by
    * construction — and the size() variant was a measured O(doc_len²)
    * trap (r13): after ExtractGenerator splits the select, column pruning
    * re-inlines the whole tokenize+shingle HOF into the post-Generate
    * projection, re-evaluated per EXPLODED row, interpreted (HOFs don't
    * codegen) — 18s vs 2s on the e39 stream at sf0.1.
    */
  /** [[bigramLogprob]]/[[trigramLogprob]] at ANY order — the scoring
    * companion to [[kneserNeyLmOrder]] (the fold is k-generic: a k-gram
    * occurrence is one (pos, lp) row at any k). `lm` is any (`gramCol`,
    * lp) table; same contract as the fixed-order siblings — documents
    * with fewer than `order` tokens are absent.
    */
  def ngramLogprob(docs: DataFrame, idCol: String, textCol: String,
                   lm: DataFrame, oovLp: Double, order: Int,
                   gramCol: String = "g",
                   nCol: String = "n_grams"): DataFrame =
    gramLogprob(docs, idCol, textCol, lm, oovLp, order, gramCol, nCol)

  private def gramLogprob(docs: DataFrame, idCol: String, textCol: String,
                          lm: DataFrame, oovLp: Double, k: Int,
                          gramCol: String, nCol: String): DataFrame = {
    val gramArr = shinglesFused(docs, tokens(col(textCol)), k)
    docs
      .select(col(idCol), posexplode(gramArr).as(Seq("pos", gramCol)))
      .join(broadcast(lm.select(col(gramCol), col("lp"))), Seq(gramCol), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as(nCol),
        aggregate(
          array_sort(collect_list(
            struct(col("pos"), coalesce(col("lp"), lit(oovLp)).as("lp")))),
          lit(0.0), (acc, x) => acc + x.getField("lp")).as("__sum_lp"))
      .select(col(idCol), col(nCol),
        (col("__sum_lp") / col(nCol)).as("mean_logprob"))
  }

  /** BPE merge learning — the tokenizer-TRAINING step (Sennrich et al.
    * 2016's byte-pair encoding, word-weighted): each round counts adjacent
    * symbol pairs across the vocabulary weighted by word frequency, adopts
    * the most frequent pair as a merge (ties: lowest left, then right
    * symbol), and applies it to every word before the next count. Returns
    * the learned merge table (round, left, right, merged, weighted_count).
    *
    * Scale shape: the corpus is touched ONCE (the word-count aggregation);
    * every round thereafter works on the DISTINCT-WORD table — vocabulary-
    * sized, not corpus-sized — and costs exactly ONE action: the
    * single-row argmax collect (bounded driver action, like the k-means
    * centroid collect) doubles as the materialization of that round's
    * lazily-persisted symbol table (its plan is one cached-parent `replace`
    * projection, so the cache fills while the pair count runs; the parent's
    * cache is released one round later, once its child is materialized).
    * The final round's table is never materialized at all — nothing reads
    * it. That is exactly how production BPE trainers scale: corpus once,
    * then vocab-sized iterations.
    *
    * Merge application contract: words carry their symbols as a spaced
    * string and a merge applies via left-to-right non-overlapping string
    * `replace` — deterministic and identical across engines (both Spark's
    * `StringReplace` and the oracle's `replace` scan the original string
    * once, resuming after each replacement). On degenerate same-symbol runs
    * (length ≥ 4) this diverges from canonical greedy BPE's re-scan — a
    * documented simplification shared by several fast BPE variants.
    */
  def bpeMerges(docs: DataFrame, idCol: String, textCol: String,
                rounds: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    var sym = Caching.persisted(words.select(col("w"), col("n"),
      concat(lit(" "), array_join(split(col("w"), ""), " "), lit(" ")).as("s")))
    // the round-(r-1) table must outlive round r's argmax (which is what
    // materializes round r's lazily-persisted child); freed one round late
    var parent: Option[DataFrame] = None
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    import spark.implicits._
    def result() =
      learned.toSeq.toDF("round", "left", "right", "merged", "weighted_count")
    try {
      for (r <- 1 to rounds) {
        val sp = split(trim(col("s")), " ")
        // single-symbol words emit no pairs; Spark's `sequence` DESCENDS
        // when start > stop, so they must be excluded before the generator
        val best = sym
          .filter(size(sp) >= 2)
          .select(col("n"), explode(
            transform(sequence(lit(0), size(sp) - 2), i =>
              struct(element_at(sp, i + 1).as("l"),
                element_at(sp, i + 2).as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("n")).as("c"))
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1).collect()
        parent.foreach(_.unpersist()) // this round's table is now cached
        parent = Some(sym)
        if (best.isEmpty) return result() // single-char vocab: nothing to merge
        val (l, rr, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((r, l, rr, l + rr, c))
        sym = Caching.persisted(sym.withColumn("s",
          call_function("replace", col("s"), lit(s" $l $rr "), lit(s" $l$rr "))))
      }
      result()
    } finally {
      parent.foreach(_.unpersist())
      sym.unpersist()
    }
  }

  /** Tokenizer APPLICATION: encode the corpus vocabulary with a learned
    * merge table ([[bpeMerges]] output) and return each distinct word's
    * piece count. Merges apply in round order via the SAME spaced-string
    * `replace` the trainer used (see the contract on [[bpeMerges]]), so
    * encode(train(corpus)) reproduces the trainer's own final symbol state
    * word for word.
    *
    * Scale shape: the fold runs once per DISTINCT word — vocabulary-sized
    * work, not corpus-sized — and the merge table rides the plan as one
    * broadcast row (merge lists are tokenizer-sized: ≤ a few 10⁴ rows of
    * short strings). No shuffle at all: distinct-vocab aggregation aside,
    * the encode itself is a projection.
    */
  def bpeEncodedVocab(docs: DataFrame, textCol: String,
                      merges: DataFrame): DataFrame = {
    // collect_list order is partition-dependent — array_sort on the round
    // field (first struct field, so lexicographic struct order = round
    // order) makes the fold sequence deterministic
    val mArr = merges.agg(array_sort(collect_list(struct(
      col("round"), col("left").as("l"), col("right").as("r")))).as("__ms"))
    docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .crossJoin(broadcast(mArr))
      .withColumn("__s",
        concat(lit(" "), array_join(split(col("w"), ""), " "), lit(" ")))
      .withColumn("__enc", aggregate(col("__ms"), col("__s"),
        (acc, m) => call_function("replace", acc,
          concat(lit(" "), m.getField("l"), lit(" "), m.getField("r"), lit(" ")),
          concat(lit(" "), m.getField("l"), m.getField("r"), lit(" ")))))
      .select(col("w"), split(trim(col("__enc")), " ").as("pieces"))
  }

  /** Per-doc token counts under a learned BPE tokenizer: whitespace tokens
    * and the exact encoded piece count — the REAL token budget a training
    * pipeline packs sequences by, where t03's regex count is only an
    * estimate. One explode + one vocab-sized join (broadcastable: the
    * encoded-vocab side is distinct words, orders of magnitude smaller
    * than the token stream) + one partial-aggregated doc rollup.
    */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: DataFrame): DataFrame = {
    val enc = bpeEncodedVocab(docs, textCol, merges)
      .select(col("w"), size(col("pieces")).cast("long").as("__n_bpe"))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .join(enc, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ws_tokens"), sum(col("__n_bpe")).as("n_bpe_tokens"))
  }

  /** Vocabulary head: the `k` most document-frequent tokens with total
    * occurrence counts (the seed stats for tokenizer training / stopword
    * lists). Shape: explode → two-level aggregate — both aggregations
    * partial-combine map-side, so the shuffle carries one row per distinct
    * (doc, token) resp. token, never the token stream.
    */
  def vocabTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    termFrequencies(docs, idCol, textCol)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("tf")).as("occurrences"))
      .orderBy(col("doc_freq").desc, col("tok"))
      .limit(k)
  }

  /** Overlapping fixed-size token chunking — the RAG / context-window
    * preparation shape: each doc yields chunks of `chunkTokens` tokens
    * whose starts step by `chunkTokens - overlap`, with token-coordinate
    * bounds (`start_tok`/`end_tok` inclusive, 0-based) and the chunk text.
    * The last chunk starts at the smallest stride multiple that still
    * reaches the tail, so every token lands in ≥ 1 chunk and a short doc
    * yields exactly one. Pure generator projection over the scan —
    * `sequence` + `posexplode` + `slice`, no shuffle, no UDF; chunk rows
    * land partitioned exactly like their documents, which is what lets a
    * downstream embed/index stage run without a repartition.
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int = 128, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlap vs $chunkTokens")
    val stride = chunkTokens - overlap
    val tk = tokens(col(textCol))
    docs
      // a null text must yield NO chunks: its null token array would
      // otherwise slip through the when/least null handling as one
      // fabricated full-size chunk of empty text (the qualityGate
      // null-exclusion rule, applied at the generator)
      .filter(col(textCol).isNotNull)
      .select(col(idCol), tk.as("__tk"), size(tk).cast("long").as("__n"))
      // last start index (in stride units): 0 for short docs, else
      // ceil((n - chunkTokens) / stride) — integer arithmetic via floor on
      // exact small doubles
      .withColumn("__nc",
        when(col("__n") > chunkTokens,
          floor((col("__n") - chunkTokens + (stride - 1)) / lit(stride)))
          .otherwise(lit(0L)))
      .select(col(idCol), col("__tk"), col("__n"),
        posexplode(sequence(lit(0L), col("__nc") * stride, lit(stride.toLong)))
          .as(Seq("chunk_no", "start_tok")))
      .select(col(idCol), col("chunk_no"), col("start_tok"),
        (least(col("start_tok") + chunkTokens, col("__n")) - 1).as("end_tok"),
        least(lit(chunkTokens.toLong), col("__n") - col("start_tok"))
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__tk"),
          (col("start_tok") + 1).cast("int"), lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** DSIR-style importance weight ("Data Selection for Language Models via
    * Importance Resampling", Xie et al. 2023), unigram feature space: each
    * doc scores `weight = mean_tok lp_target(tok) − mean_tok lp_raw(tok)` —
    * the per-token log importance ratio between a TARGET-domain LM and the
    * RAW-corpus LM. High weight = the target model finds the doc much less
    * surprising than the raw model = the doc looks like the domain you
    * want more of; thresholding/ranking on it is the deterministic stand-in
    * for the paper's Gumbel-noise resampling.
    *
    * Both terms are [[unigramLogprob]]-contract folds: token-order
    * deterministic from a 0.0 seed, OOV floored at `oovLp`, so the weight
    * is engine-reproducible. When both vocabs fit the literal cap the two
    * folds FUSE into one projection over the scan — no join, no shuffle,
    * one corpus pass; oversized vocabs fall back to composing two
    * [[unigramLogprob]] passes joined on the id (each side then the
    * broadcast-join shape, still no corpus shuffle).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetLm: DataFrame, rawLm: DataFrame,
                  oovLp: Double = -20.0,
                  literalVocabMax: Int = 65536): DataFrame = {
    val tk = tokens(col(textCol))
    val tEntries = probeLm(targetLm, literalVocabMax)
    val rEntries = probeLm(rawLm, literalVocabMax)
    if (tEntries.length <= literalVocabMax && rEntries.length <= literalVocabMax) {
      def lpMap(entries: Array[org.apache.spark.sql.Row]) = map_from_arrays(
        lit(entries.map(_.getString(0))), lit(entries.map(_.getDouble(1))))
      def meanLp(m: Column) =
        aggregate(tk, lit(0.0),
          (acc, t) => acc + coalesce(element_at(m, t), lit(oovLp))) / size(tk)
      docs.select(col(idCol), size(tk).cast("long").as("n_tokens"),
          meanLp(lpMap(tEntries)).as("lp_target"),
          meanLp(lpMap(rEntries)).as("lp_raw"))
        .withColumn("weight", col("lp_target") - col("lp_raw"))
    } else {
      // reuse the probes above — no second bounded collect per LM
      val tgt = unigramLogprobFrom(docs, idCol, textCol, targetLm, tEntries,
          oovLp, literalVocabMax)
        .select(col(idCol), col("n_tokens"), col("mean_logprob").as("lp_target"))
      val raw = unigramLogprobFrom(docs, idCol, textCol, rawLm, rEntries,
          oovLp, literalVocabMax)
        .select(col(idCol), col("mean_logprob").as("lp_raw"))
      tgt.join(raw, Seq(idCol))
        .withColumn("weight", col("lp_target") - col("lp_raw"))
    }
  }

  /** Exact duplicated-substring spans — the exact-match dedup shape of
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al. 2021) re-expressed relationally: instead of a corpus-wide suffix
    * array, every k-token window is a positioned shingle, windows whose
    * text occurs in ≥ `minDocs` distinct docs survive, and per-doc runs of
    * surviving windows merge (gaps-and-islands) into maximal spans. Output:
    * one row per (doc, span) — `span_start`/`span_end` inclusive 0-based
    * token indices, `span_tokens` its length — the cut-list a curation
    * pass needs to excise boilerplate/licenses/copy-pasta from documents
    * rather than dropping them whole.
    *
    * Plan shape: scan-stage window projection (no shuffle) → one shuffle
    * on the window text for the distinct-doc count (both aggregation
    * phases partial-combine) → one shuffle join positions-vs-duplicated
    * windows → one doc-key window pass for the merge. At 100 TB the join
    * key should be `xxhash64(window)` rather than the window text (8-byte
    * shuffle keys; a 64-bit collision can only conjure a FALSE duplicate
    * window, never lose one) — kept as text here so the contract is
    * hash-free and engine-reproducible.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minDocs: Int = 2): DataFrame = {
    val win = positionedWindows(docs, idCol, textCol, k)
    val dup = win.groupBy("win")
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocs)
      .select("win")
    val hits = win.join(dup, Seq("win")).select(col(idCol), col("pos"))
    spansFromHits(hits, idCol, k)
  }

  /** The positioned k-token window set (id, pos, win) feeding BOTH the
    * doc-frequency aggregate and the hits join of the span operators —
    * persisted (guarded, spillable) so the corpus-wide tokenize+shingle
    * projection runs one scan pass, not two (the Dedup.shingleSet
    * convention; released by SessionSweep).
    */
  private def positionedWindows(docs: DataFrame, idCol: String,
                                textCol: String, k: Int): DataFrame =
    Caching.persisted(docs.select(col(idCol),
      posexplode(shinglesFused(docs, tokens(col(textCol)), k))
        .as(Seq("pos", "win"))))

  /** Gaps-and-islands merge of surviving window positions into maximal
    * spans: a window starting more than k past its predecessor opens a new
    * span (<= k overlaps or is contiguous with the previous window's
    * [pos, pos+k-1] coverage — merged spans are the EXACT union of window
    * coverage, no extra tokens); first row's null lag -> otherwise 0.
    */
  private def spansFromHits(hits: DataFrame, idCol: String, k: Int): DataFrame = {
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("new_span",
        when(col("pos") > lag(col("pos"), 1).over(byPos) + lit(k), 1).otherwise(0))
      .withColumn("span_no", sum(col("new_span")).over(byPos))
      .groupBy(col(idCol), col("span_no"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start") + 1)
      .select(col(idCol), col("span_start"), col("span_end"), col("span_tokens"))
  }

  /** KEEP-FIRST cut list — the excision step a Lee-et-al. pipeline runs
    * after [[duplicateSpans]]: every duplicated window designates its
    * MINIMUM-id containing doc as keeper, and only non-keeper occurrences
    * enter the cut list, so one copy of each duplicated substring survives
    * the cut (the t18 span list flags ALL occurrences — applying it
    * verbatim would erase the text from the corpus entirely). Overlap
    * caveat, documented not hidden: a keeper doc can still lose part of a
    * kept window when an OVERLAPPING window has a different keeper — the
    * greedy per-window rule guarantees no duplicated window survives in
    * two docs, not that every window survives in one.
    *
    * Same plan shape as [[duplicateSpans]] (the keeper min rides the
    * existing doc-frequency shuffle for free); output schema is identical,
    * so [[applyCutList]] consumes either list.
    */
  def duplicateSpansKeepFirst(docs: DataFrame, idCol: String, textCol: String,
                              k: Int = 8, minDocs: Int = 2): DataFrame = {
    val win = positionedWindows(docs, idCol, textCol, k)
    val dup = win.groupBy("win")
      .agg(countDistinct(col(idCol)).as("df"), min(col(idCol)).as("__keeper"))
      .filter(col("df") >= minDocs)
      .select("win", "__keeper")
    val hits = win.join(dup, Seq("win"))
      .filter(col(idCol) =!= col("__keeper"))
      .select(col(idCol), col("pos"))
    spansFromHits(hits, idCol, k)
  }

  /** Apply a cut list: excise every token whose 0-based index falls inside
    * one of the doc's spans and re-join the survivors — the step that turns
    * a [[duplicateSpansKeepFirst]] list into a cleaned corpus. Emits every
    * input doc (cut or not) as (id, text_clean, n_cut).
    *
    * One shuffle total: spans collapse to a per-doc array (small — spans
    * per doc are bounded by duplicated-region count, not text length) and
    * join the docs on the id key; the excision itself is a single
    * codegen'd projection — indexed `filter` over the token array with an
    * `exists` containment lambda, no UDF, no explode of the token stream.
    * Docs without spans take the null-array fast path untouched.
    */
  /** Benchmark-contamination screen — the decontamination step every
    * LLM training pipeline runs before a corpus ships (the GPT-3/PaLM
    * recipe: exact k-gram collision against the eval sets): for every
    * corpus doc, the fraction of its k-word shingles that appear ANYWHERE
    * in the benchmark set, and how many distinct benchmark docs it
    * collides with. `frac` near 1 is a leaked eval doc (drop it);
    * mid-range frac flags shared boilerplate worth a look; 0 is clean.
    * Every corpus doc is emitted (zeros when clean) so the screen's
    * output is a complete per-doc audit, join-able back onto any gate.
    *
    * Scale shape: the benchmark side is eval-set-sized (thousands of
    * docs, not the corpus), so its distinct shingle set BROADCASTS and
    * the corpus-side cost is one scan-stage shingle projection + a
    * broadcast join — no corpus-keyed shuffle beyond the per-doc rollup.
    * At a benchmark too large to broadcast (`broadcastBench = false`),
    * the same plan degrades to a shuffle join on the shingle key (the
    * d02 bucket shape) with zero logic change — the collision join and
    * everything downstream are identical, only the exchange strategy
    * moves (at real scale the planner makes this call itself once the
    * bench side crosses the broadcast threshold; the explicit flag pins
    * the shape deterministically at conformance scale). In that mode a
    * bloom prefilter (`bloomPrefilter = true`) composes in FRONT of the
    * join: the sketch builds over the bench shingles (one job over the
    * small side, rides the plan as a literal) and prunes the CORPUS gram
    * stream before the exchange, so the big shuffle carries only grams
    * that might collide — ~|bench shingles| + fpp·|corpus grams| rows
    * instead of every corpus gram. False positives are dropped by the
    * exact join and false negatives cannot occur, so the audit is
    * bit-identical on every path (one oracle grades all of them). The
    * per-doc denominator (`n_grams`) always counts the UNPRUNED gram
    * set — pruning is join-side only.
    */
  def contaminationScreen(corpus: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          k: Int = 8,
                          broadcastBench: Boolean = true,
                          bloomPrefilter: Boolean = false,
                          expectedBenchShingles: Long = 1L << 20): DataFrame = {
    require(k >= 1, s"contaminationScreen: k must be >= 1, got $k")
    def shingles(df: DataFrame, as: String) = df.select(col(idCol).as(as),
        explode(shinglesFused(df, tokens(col(textCol)), k)).as("g"))
      .distinct()
    val cg = shingles(corpus, "doc_id")
    val bg = shingles(bench, "bench_id")
    val sizes = cg.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val cgJoin =
      if (!bloomPrefilter) cg
      else {
        val bits = math.min(math.max(expectedBenchShingles * 8, 1L << 16), 1L << 26)
        val bloom = graft.functions.NativeFunctions.bloomAggBytes(
          bg, xxhash64(col("g")), expectedBenchShingles, bits)
        cg.filter(graft.functions.NativeFunctions.mightContain(
          cg.sparkSession, bloom, xxhash64(col("g"))))
      }
    val bgSide =
      if (broadcastBench) broadcast(bg)
      else bg.hint("shuffle_hash")
    val hits = cgJoin.join(bgSide, "g")
      .groupBy("doc_id")
      .agg(count_distinct(col("g")).as("n_hit"),
        count_distinct(col("bench_id")).as("n_bench_docs"))
    corpus.select(col(idCol).as("doc_id")).distinct()
      .join(sizes, Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(col("n_bench_docs"), lit(0L)).as("n_bench_docs"))
      .withColumn("frac",
        when(col("n_grams") > 0,
          col("n_hit").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)))
  }

  def applyCutList(docs: DataFrame, spans: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val cuts = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__cuts"))
    docs.join(cuts, Seq(idCol), "left")
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__kept",
        when(col("__cuts").isNull, col("__toks"))
          .otherwise(filter(col("__toks"), (tok, i) =>
            !exists(col("__cuts"), c =>
              i >= c.getField("span_start") && i <= c.getField("span_end")))))
      .select(col(idCol),
        concat_ws(" ", col("__kept")).as("text_clean"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_cut"))
  }

  /** Checksum-validated payment-card screen (SURVEY §2.11) — the PII rung
    * t11's regex-only pass cannot reach: an arbitrary 13–19-digit run (order
    * ids, timestamps, serials) matches the card REGEX but fails the Luhn
    * checksum real card numbers carry by construction, so validating before
    * redacting is what keeps a corpus-scale scrub from mangling every long
    * number in the data. Emits one audit row per candidate: the redaction
    * work-list a reviewer (or the redact step) consumes. `display` shows the
    * masked form (****last4) for VALIDATED numbers — the sensitive ones —
    * and the raw run for checksum failures, which are retained verbatim in
    * the corpus and need no masking in the audit either.
    *
    * Scale shape: one shuffle-free projection + generator (regex scan,
    * per-candidate digit fold all inside whole-stage codegen); output volume
    * ∝ candidates, never corpus text. The Luhn fold is exact integer
    * arithmetic — bit-identical on any partitioning and in the oracle's
    * UNNEST(range) reconstruction.
    */
  def cardScreen(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions.{cardRe, luhnValid, maskCard}
    docs
      .select(col(idCol),
        posexplode(regexp_extract_all(col(textCol), lit(cardRe), lit(0)))
          .as(Seq("cand_no", "raw")))
      .withColumn("digits", regexp_replace(col("raw"), "[ -]", ""))
      .select(col(idCol), col("cand_no").cast("long").as("cand_no"),
        length(col("digits")).cast("long").as("n_digits"),
        luhnValid(col("digits")).as("luhn_valid"),
        when(luhnValid(col("digits")), maskCard(col("digits")))
          .otherwise(col("raw")).as("display"))
  }

  /** Checksum-GATED card redaction — [[cardScreen]]'s audit applied to the
    * text itself (the production composition of t11's rewrite with t37's
    * validation): every 13–19-digit candidate run that passes the Luhn
    * checksum is replaced in-place by its masked form (****last4); runs
    * that FAIL the checksum (order ids, serials, timestamps) are left
    * verbatim, so the redactor never mangles the long numbers a
    * regex-only pass would over-mask. Emits (id, n_cands, n_masked,
    * redacted).
    *
    * Scale shape: one shuffle-free projection — the text splits around
    * the candidate regex (pieces and matches align because both come
    * from the same greedy scan), each match folds through the Luhn HOF
    * inside a `transform`, and the pieces re-interleave with the
    * processed matches via one `aggregate` fold. No shuffle, no explode,
    * no UDF; per-row work O(len + candidates·digits), all inside
    * whole-stage codegen.
    */
  def redactValidatedCards(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    import graft.functions.TextFunctions.{cardRe, luhnValid, maskCard}
    val withParts = docs.select(col(idCol),
      split(col(textCol), cardRe, -1).as("__p"),
      regexp_extract_all(col(textCol), lit(cardRe), lit(0)).as("__m"))
    val processed = transform(col("__m"), m => {
      val digits = regexp_replace(m, "[ -]", "")
      when(luhnValid(digits), maskCard(digits)).otherwise(m)
    })
    withParts
      .withColumn("__proc", processed)
      .select(col(idCol),
        size(col("__m")).cast("long").as("n_cands"),
        size(filter(col("__m"), m =>
          luhnValid(regexp_replace(m, "[ -]", "")))).cast("long")
          .as("n_masked"),
        when(size(col("__m")) === 0, element_at(col("__p"), 1))
          .otherwise(aggregate(
            sequence(lit(1), size(col("__m"))),
            element_at(col("__p"), 1),
            (acc, i) => concat(acc, element_at(col("__proc"), i),
              element_at(col("__p"), i + 1))))
          .as("redacted"))
  }

  // ------------------------------------ Temperature mixture resampling --

  /** Per-stratum acceptance rates for temperature-based mixture
    * resampling — the multilingual/domain REBALANCING step (the mT5/XLM-R
    * exponentiated-share recipe): a stratum with raw share p_s is given
    * target share q_s ∝ p_s^τ, flattening the mixture toward uniform as
    * τ → 0 while τ = 1 keeps it unchanged. At the SAME total corpus size
    * the acceptance rate is a_s = min(1, q_s·N / n_s) — head strata
    * downsample, tail strata keep everything (deterministic resampling
    * never upsamples; the rate table reports the target so a loader can
    * oversample tail epochs if it wants true temperature weights).
    *
    * Determinism contract (what lets DuckDB grade the double bit-exactly):
    * the default τ = 0.5 computes p_s^τ as `sqrt`, IEEE-exact in both
    * engines (general `pow` is NOT bit-reproducible across libm builds —
    * callers straying from 0.5 keep the operator but lose oracle-grade
    * bit-parity), and the normalizer Σ_s sqrt(n_s) is folded in STRATUM
    * ORDER from a 0.0 seed over the sorted stratum array — the t22
    * position-ordered-fold pattern, because float addition order is the
    * only nondeterminism a per-stratum sum has. The rate expression is
    * left-associated ((sqrt(n)/S)·N)/n so both engines evaluate the same
    * IEEE sequence.
    *
    * Scale shape: ONE corpus aggregation (the per-stratum count), then
    * everything is strata-sized — the fold runs on a collected array in a
    * single-row aggregate (strata counts are bounded by the label
    * vocabulary, the same plan-literal budget class as the BPE vocab).
    */
  def temperatureRates(docs: DataFrame, srcCol: String,
                       temperature: Double = 0.5): DataFrame = {
    val cnt = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
    val sw =
      if (temperature == 0.5) sqrt(col("n").cast("double"))
      else pow(col("n").cast("double"), lit(temperature))
    val wCnt = cnt.withColumn("__sw", sw)
    val norm = wCnt.agg(
      aggregate(
        array_sort(collect_list(struct(col(srcCol), col("__sw")))),
        lit(0.0), (acc, x) => acc + x.getField("__sw")).as("__s"),
      sum(col("n")).cast("double").as("__nn"))
    wCnt.crossJoin(broadcast(norm))
      .select(col(srcCol), col("n").cast("long").as("n_docs"),
        least(lit(1.0),
          col("__sw") / col("__s") * col("__nn") / col("n").cast("double"))
          .as("accept_rate"))
  }

  /** The deterministic per-document acceptance predicate shared by the
    * batch resampler and its streaming twin: keep iff the id-hash uniform
    * u = pmod(xxhash64(id), 10⁶)/10⁶ falls under the row's rate. u < 1
    * strictly, so a rate-1.0 stratum keeps every doc.
    */
  def temperatureGate(id: Column, rate: Column): Column =
    pmod(xxhash64(id), lit(1000000L)).cast("double") / lit(1000000.0) < rate

  /** Apply [[temperatureRates]] as a deterministic per-document gate
    * ([[temperatureGate]]). Selection follows the id alone (stable under
    * growth/re-partitioning, the hashSplit guarantee); the plan is a
    * broadcast join of the strata-sized rate table + a stateless filter —
    * no shuffle beyond the rate table's own corpus count.
    */
  def temperatureResample(docs: DataFrame, idCol: String, srcCol: String,
                          temperature: Double = 0.5): DataFrame = {
    val rates = temperatureRates(docs, srcCol, temperature)
      .select(col(srcCol), col("accept_rate"))
    docs.join(broadcast(rates), Seq(srcCol))
      .filter(temperatureGate(col(idCol), col("accept_rate")))
  }

  // ------------------------- sequence packing (concat-then-chunk) --------

  /** Pack a corpus into fixed-length training sequences — the GPT-style
    * "concatenate all documents in a deterministic order, then cut every
    * `seqLen` tokens" packing every LLM pretraining pipeline runs before
    * batching. [[packSequences]] (t09) owns the per-shard LAYOUT and
    * delegates the pack-boundary straddle to the consumer; this operator
    * is that consumer made first-class, over ONE GLOBAL stream: documents
    * concatenate in id-hash order (the hashSplit determinism contract:
    * stable under growth and re-partitioning, no curriculum leak from
    * ingest order) and each document emits one row per sequence it
    * overlaps: `(seq_id, doc_id, doc_from, doc_to, seq_off)` — token span
    * [doc_from, doc_to] of the doc lands at offset `seq_off` of sequence
    * `seq_id`. Every sequence is exactly `seqLen` tokens (the last one
    * ragged), every doc's spans tile [0, n_tok) exactly, and a doc longer
    * than `seqLen` spans ≥ 2 sequences. Zero-token documents are dropped
    * (nothing to pack).
    *
    * Scale design (the reason this is not one `Window.orderBy`): the
    * global token offset is a DISTRIBUTED PREFIX SUM, never a
    * single-partition window over the corpus. Docs range-bucket by the
    * top `rangeBits` bits of their id hash (arithmetic shift + recenter:
    * monotone in SIGNED hash order, the order the concatenation — and
    * the oracle's `ORDER BY h` — is defined over), each bucket cumsums
    * locally (a bucket-partitioned window), and the 2^rangeBits bucket
    * totals prefix-sum on the tiny side and broadcast back. All-long arithmetic end to end (offsets
    * via integral DIV, never a double `floor`), so the two-level sum is
    * bit-identical to the flat global cumsum the t53 oracle runs. The
    * windowed slim frame (id, counts, offsets — no text) persists so the
    * bucket-totals branch doesn't re-derive it.
    */
  def packSequenceSpans(docs: DataFrame, idCol: String, textCol: String,
                        seqLen: Long, rangeBits: Int = 8): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive; got $seqLen")
    require(rangeBits >= 1 && rangeBits <= 16,
      s"rangeBits must be in [1, 16]; got $rangeBits")
    val h = xxhash64(col(idCol))
    val base = docs.select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tok"),
        h.as("h"),
        (shiftright(h, 64 - rangeBits) +
          lit(1L << (rangeBits - 1))).as("b"))
      .filter(col("n_tok") > 0)
    val wLocal = Window.partitionBy("b").orderBy("h", "doc_id")
    val local = Caching.persisted(
      base.withColumn("local_end", sum("n_tok").over(wLocal)))
    // exclusive prefix over the 2^rangeBits bucket totals — tiny, driver-
    // adjacent, broadcast back (max(local_end) per bucket IS the total,
    // so the totals reuse the windowed frame instead of a second corpus
    // aggregation)
    val prefixes = local.groupBy("b").agg(max("local_end").as("tot"))
      .withColumn("prefix", coalesce(sum("tot").over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("b", "prefix")
    val offs = local.join(broadcast(prefixes), "b")
      .withColumn("end_off", col("prefix") + col("local_end"))
      .withColumn("start_off", col("end_off") - col("n_tok"))
    offs
      .withColumn("seq_id", explode(sequence(
        expr(s"start_off DIV $seqLen"), expr(s"(end_off - 1) DIV $seqLen"))))
      .withColumn("doc_from",
        greatest(lit(0L), col("seq_id") * seqLen - col("start_off")))
      .withColumn("doc_to",
        least(col("n_tok"), (col("seq_id") + lit(1L)) * seqLen -
          col("start_off")) - lit(1L))
      .withColumn("seq_off",
        greatest(col("start_off"), col("seq_id") * seqLen) -
          col("seq_id") * seqLen)
      .select("seq_id", "doc_id", "doc_from", "doc_to", "seq_off")
  }
}
