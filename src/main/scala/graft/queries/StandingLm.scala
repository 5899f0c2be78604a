package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.CorpusOps
import graft.queries.Q.t

/** Standing Kneser–Ney LM tables (VERDICT r16 #2) — the d12/d16 lake
  * pattern for the fluency-filter family: the corpus n-gram passes (the
  * expensive part of every KN build) run ONCE per (corpus, order,
  * discount) and the finished LM head persists as a knob-keyed warehouse
  * table; every scorer — batch (t40/t41/t44/t45) and streaming
  * (e39/e40/e44) — serves from the table, paying only the vocabulary-
  * sized broadcast join + per-doc fold per run. The knobs ARE the layout
  * (the edit-index naming contract): order and discount are baked into
  * the table name, so a different smoothing point builds a NEW table
  * instead of silently serving stale probabilities, and the t45 sweep's
  * three discount tables coexist. Table-vs-direct identity is
  * spec-pinned bit-for-bit at every order (CorpusPropertySpec) and
  * oracle-graded end-to-end (t47: the standing table's eleven integer
  * statistics recounted from scratch in DuckDB).
  *
  * Scale shape: the LM head is vocab-capped (≤262k rows), so the table is
  * broadcast-sized by construction; what the pattern removes at 100 TB is
  * the per-serve corpus scan family (order−1 n-gram aggregations over the
  * whole corpus), exactly the cost class the r16 bench saw e44 re-pay on
  * every run.
  */
object StandingLm {

  /** The builders' gram-column name per order (hand-rolled 2/3 keep their
    * historical names; the order-generic builder emits `g`).
    */
  def gramCol(order: Int): String = order match {
    case 2 => "bg"
    case 3 => "tg"
    case _ => "g"
  }

  /** Ensure (once per session + sf dir + knobs) the standing KN LM table
    * over the `documents` corpus; returns its catalog name. Orders 2 and
    * 3 build through the hand-rolled t40/t41 builders (bit-exact fixed
    * points of the order-generic recursion, spec-pinned), higher orders
    * through [[CorpusOps.kneserNeyLmOrder]].
    */
  def ensure(s: SparkSession, dir: String, order: Int,
             discount: Double = 0.75): String = {
    val name = "kn_lm_" +
      graft.sources.BucketedLake.layoutSuffix(dir + "#knlm", 8) +
      s"_o${order}_d${discountTag(discount)}"
    if (!s.catalog.tableExists(name))
      graft.sources.BucketedLake.writeBucketedTable(
        s, name, build(s, dir, order, discount), gramCol(order), 8)
    name
  }

  /** The discount encodes LOSSLESSLY into table names (shortest-roundtrip
    * toString, '.' and '-' made identifier-safe): rounding to a percent
    * would let two nearby discounts silently share one table — exactly
    * the stale-probability failure the knob-baked naming exists to
    * prevent.
    */
  private def discountTag(discount: Double): String =
    discount.toString.replace('.', 'p').replace('-', 'm')

  private def build(s: SparkSession, dir: String, order: Int,
                    discount: Double): DataFrame = {
    val docs = t(s, dir, "documents")
    order match {
      case 2 => CorpusOps.kneserNeyLm(docs, "doc_id", "text", discount)
      case 3 => CorpusOps.kneserNeyTrigramLm(docs, "doc_id", "text", discount)
      case k => CorpusOps.kneserNeyLmOrder(docs, "doc_id", "text", k, discount)
    }
  }

  // ---- standing gram-count tables: the LM family's maintenance rung ----

  /** Knob-baked name of one standing k-gram count table over the `dir`
    * corpus (the gram family is shared across orders that need level k
    * and across EVERY discount — the t45 sweep property made layout).
    * `tag` separates maintenance lifecycles (t49 batch = "", e50
    * streaming = "s") so neither serve's fold state leaks into the other.
    */
  def gramTableName(dir: String, k: Int, tag: String = ""): String =
    "kn_gc" + tag + "_" +
      graft.sources.BucketedLake.layoutSuffix(dir + "#kngc" + tag, 8) +
      s"_k$k"

  /** The LM lifecycle's MAINTENANCE serve (t49): standing gram-count
    * tables built once over the base corpus (`doc_id % 10 < 8`, the d21
    * family's standing slice), the ingest batch (`% 10 >= 8`) folded in
    * by epoch-keyed additive append — the batch pays only its OWN gram
    * counting — and the order-`order` KN head re-derived gram-table-sized
    * from the maintained counts, then PERSISTED under a name carrying the
    * gram family's frontier epoch (scorers read the head table; the next
    * fold advances the frontier and refreshes it). Bit-identical to a
    * from-scratch retrain over the grown corpus
    * ([[CorpusOps.kneserNeyHeadFromCounts]]'s contract: same summed
    * counts in, the identical float tree out), so the t47 standing-table
    * oracle grades this path with no weakening. Idempotent per (session,
    * dir): the base build is catalog-guarded, the fold replays as a no-op
    * (epoch 1 already present), and the head persists once per frontier.
    */
  def maintainedHead(s: SparkSession, dir: String, order: Int,
                     discount: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = t(s, dir, "documents")
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    maintainedHeadImpl(s, dir, order, discount, tag = "",
      k => CorpusOps.knGramCounts(batch, "text", k))
  }

  /** [[maintainedHead]]'s STREAMING twin's serve half (e50): the ingest
    * batch's per-(k, g) gram counts arrive already materialized by the
    * stream (complete-mode count — state is the BATCH's gram vocabulary,
    * bounded by the arriving data, never the corpus), and the serve step
    * folds each order's slice into its own standing gram family (tag
    * `"s"` — a separate lifecycle from t49's, so neither serve's fold
    * state nor bench cost leaks into the other) before re-deriving the
    * head. One oracle grades batch and live maintenance.
    */
  def maintainedHeadFromDeltas(s: SparkSession, dir: String,
                               deltas: DataFrame, order: Int,
                               discount: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    maintainedHeadImpl(s, dir, order, discount, tag = "s",
      k => deltas.filter(col("k") === lit(k)).select(col("g"), col("n")))
  }

  /** The gram family's COMPACTION rung proven end to end (t50): ensure
    * the t49 maintained family, compact every gram table back to a
    * single (frontier) epoch, then derive the head FROM THE COMPACTED
    * TABLES — persisted under its own name so the derivation provably
    * consumed the rewritten layout, not the pre-compaction head — and
    * grade it with the same from-scratch oracle. Compaction preserves
    * the frontier epoch ([[CorpusOps.compactKnGramTable]]), so the t49
    * lifecycle (its no-op replay check, its frontier-named head) is
    * untouched by running this after it, in either order.
    */
  def compactedHead(s: SparkSession, dir: String, order: Int,
                    discount: Double = 0.75): DataFrame = {
    // ensure the maintained family exists (build + fold, all idempotent)
    maintainedHead(s, dir, order, discount)
    val names = (2 to order).map(k => k -> gramTableName(dir, k)).toMap
    val frontier = compactFamilyAndFrontier(s, names.values)
    val headName = "kn_lmc_" +
      graft.sources.BucketedLake.layoutSuffix(dir + "#knlmc", 8) +
      s"_o${order}_d${discountTag(discount)}_e$frontier"
    if (!s.catalog.tableExists(headName))
      graft.sources.BucketedLake.writeBucketedTable(s, headName,
        CorpusOps.kneserNeyHeadFromCounts(
          k => CorpusOps.readKnGramCounts(s, names(k)), order, discount,
          spreadProviders = true),
        "g", 8)
    s.table(headName)
  }

  /** Compact every gram table in the family that still carries multiple
    * epochs — decided from the TABLE STATE itself, never a session
    * marker, so a fold landing after a compaction re-triggers the next
    * compaction and every order a caller covers gets its own check —
    * and return the family's frontier epoch (which compaction PRESERVES:
    * [[CorpusOps.compactKnGramTable]]'s replay-ledger contract), so a
    * post-compaction fold advances the frontier and any head persisted
    * under an older frontier can never be served by identity.
    */
  private[graft] def compactFamilyAndFrontier(
      s: SparkSession, names: Iterable[String]): Long = {
    import org.apache.spark.sql.functions.{col, max, coalesce, lit,
      count_distinct}
    names.foreach { n =>
      val epochs = s.table(n)
        .agg(count_distinct(col("epoch"))).head().getLong(0)
      if (epochs > 1) CorpusOps.compactKnGramTable(s, n)
    }
    names.map(n => tableFrontier(s, n)).max
  }

  /** A gram table's frontier epoch — the catalog property (no data scan;
    * VERDICT r17 #6), falling back to one max(epoch) read for layouts
    * written before the property existed.
    */
  private def tableFrontier(s: SparkSession, name: String): Long = {
    import org.apache.spark.sql.functions.{col, max, coalesce, lit}
    graft.sources.BucketedLake.frontier(s, name).getOrElse(
      s.table(name).agg(coalesce(max(col("epoch")), lit(0L)))
        .head().getLong(0))
  }

  // ---- head refresh cadence (VERDICT r17 #3) ----

  /** Session knob: how many frontier epochs a persisted head may lag
    * before a fold's serve re-derives it. Default 1 = refresh whenever
    * the frontier advanced (round-17 behavior). Raising it buys the d18
    * economics: folds stay batch-sized every ingest; the gram-table-sized
    * head derivation (16–59 s at ×30) runs once per N ingests, with
    * serves reading the last persisted head in between — a bounded,
    * caller-chosen staleness, made safe by the `_e{epoch}` naming (what's
    * served is exactly the labeled epoch, never a silently mixed state).
    *
    * Sizing (VERDICT r18 #5, from the measured ×10 economics — SCALE.md
    * r18: fold ≈ 4.3 s, head ≈ 14.8 s, ratio ≈ 3.5): N ≈
    * head_cost / fold_cost makes the amortized head work per ingest equal
    * one fold — i.e. N = 3–5 roughly halves per-ingest maintenance while
    * bounding served staleness at N−1 epochs. Raise N further only when
    * serves tolerate staler heads than that; the default 1 is the
    * freshest-possible (and most expensive) point, kept as default
    * because correctness never depends on the knob.
    */
  private[graft] def headRefreshEpochs(s: SparkSession): Int =
    s.conf.getOption("spark.graft.lm.headRefreshEpochs").map { v =>
      val n =
        try v.trim.toInt
        catch { case e: NumberFormatException =>
          throw new IllegalArgumentException(
            "spark.graft.lm.headRefreshEpochs must be a positive epoch " +
              s"count — got '$v'", e)
        }
      require(n > 0,
        s"spark.graft.lm.headRefreshEpochs must be positive; got $n")
      n
    }.getOrElse(1)

  /** The staleness advisory ([[graft.operators.Dedup.staleKnobs]]'s shape
    * for LM heads): refresh when no head was ever persisted, or when the
    * newest persisted head lags the gram family's frontier by
    * `refreshEpochs` or more. Pure — `LmCadenceSpec` pins the boundary.
    */
  private[graft] def headStale(frontier: Long, persisted: Option[Long],
                               refreshEpochs: Int): Boolean =
    persisted.forall(e => frontier - e >= refreshEpochs)

  /** Newest persisted head epoch for `headBase` (catalog listing, no data
    * job): table names are `{headBase}{epoch}`, so the maximum parsed
    * suffix is the serve candidate.
    */
  private def latestPersistedHead(s: SparkSession,
                                  headBase: String): Option[Long] =
    s.catalog.listTables().collect().iterator
      .map(_.name)
      .filter(_.startsWith(headBase))
      .flatMap(n => n.stripPrefix(headBase).toLongOption)
      .maxOption

  private[graft] def maintainedHeadImpl(s: SparkSession, dir: String,
                                        order: Int, discount: Double,
                                        tag: String,
                                        deltaFor: Int => DataFrame,
                                        epoch: Long = 1L): DataFrame = {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = t(s, dir, "documents")
    val base = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
    val names = (2 to order).map { k =>
      val name = gramTableName(dir, k, tag)
      if (!s.catalog.tableExists(name))
        CorpusOps.writeKnGramTable(s, name,
          CorpusOps.knGramCounts(base, "text", k))
      CorpusOps.maintainKnGramTable(s, name, deltaFor(k), epoch)
      k -> name
    }.toMap
    // Maintenance ends by SERVING a persisted head — but which one is the
    // cadence decision (VERDICT r17 #3): the fold itself stays batch-sized
    // every ingest, and the gram-table-sized head derivation runs only
    // when the staleness advisory fires ([[headStale]] against
    // [[headRefreshEpochs]]; default 1 = refresh on every advancing fold,
    // the round-17 behavior). In between, serves read the newest persisted
    // head — the FRONTIER epoch baked into each head's name means the
    // served state is always exactly the epoch the name says (staleness is
    // bounded and labeled, never silent; a crash between fold and refresh
    // leaves only an orphaned older name, same argument as the knob-baked
    // LM names). Refresh itself is bit-identical to a from-scratch retrain
    // at that frontier, so the t49/e50 oracles grade the refreshed head
    // with no weakening.
    val frontier = names.values.map(n => tableFrontier(s, n)).max
    val headBase = "kn_lmm" + tag + "_" +
      graft.sources.BucketedLake.layoutSuffix(dir + "#knlmm" + tag, 8) +
      s"_o${order}_d${discountTag(discount)}_e"
    val persisted = latestPersistedHead(s, headBase)
    val serveEpoch =
      if (headStale(frontier, persisted, headRefreshEpochs(s))) frontier
      else persisted.get
    val headName = headBase + serveEpoch
    if (!s.catalog.tableExists(headName))
      graft.sources.BucketedLake.writeBucketedTable(s, headName,
        CorpusOps.kneserNeyHeadFromCounts(
          k => CorpusOps.readKnGramCounts(s, names(k)), order, discount,
          spreadProviders = true),
        "g", 8)
    s.table(headName)
  }
}
