package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Merges, Sketches}
import graft.queries.Q.t
import graft.queries.QueryDef.of

/** Sketch + incremental-maintenance queries (SURVEY §2.11 profiling
  * surface): mergeable summaries whose cluster cost is governed by summary
  * size, not data size. Oracle contract (see Sketches.scala header): the
  * hash and log primitives are materialized via AuxDumps; DuckDB recomputes
  * every downstream step — bucketing, rho via the same smear/popcount
  * arithmetic, register maxima, harmonic numerators, counter grids,
  * bottom-k ranking, set algebra, and the exact estimate float trees — from
  * scratch in SQL.
  */
object SketchQueries {

  /** Memory-sink name source (the ExtensionQueries contract). */
  private val sinkCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** The per-event-type histogram contract shared by q47 (incremental
    * batch merge) and e26 (streaming counter maintenance): one SQL
    * definition — the from-scratch sketch + quantile interpolation over
    * ALL events — so both maintenance paths must land on the identical
    * estimates by construction (the hllEventsSql pattern).
    */
  private val histEventsSql =
    """WITH h AS (SELECT event_type AS grp,
      |    CAST(LEAST(GREATEST(CAST(FLOOR((value - 0e0) / 8e0) AS BIGINT), 0), 63) AS INT) AS bin
      |  FROM events WHERE isfinite(value)),
      |bc AS (SELECT grp, bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM h GROUP BY grp, bin),
      |tot AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM bc GROUP BY grp),
      |cum AS (SELECT grp, bin, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS BIGINT) AS cum
      |  FROM bc),
      |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.5), (0.9), (0.99)) v(q)),
      |tgt AS (SELECT t.grp, qs.q, t.n, qs.q * CAST(t.n AS DOUBLE) AS t
      |  FROM tot t CROSS JOIN qs),
      |hit AS (SELECT tgt.grp, tgt.q, tgt.n, tgt.t, MIN(c.bin) AS bin
      |  FROM tgt JOIN cum c ON c.grp = tgt.grp AND CAST(c.cum AS DOUBLE) >= tgt.t
      |  GROUP BY tgt.grp, tgt.q, tgt.n, tgt.t)
      |SELECT h.grp, h.q, h.n, h.bin,
      |  0e0 + 8e0 * (CAST(h.bin AS DOUBLE) +
      |    (h.t - CAST(c.cum - c.cnt AS DOUBLE)) / CAST(c.cnt AS DOUBLE)) AS est
      |FROM hit h JOIN cum c ON c.grp = h.grp AND c.bin = h.bin
      |ORDER BY h.grp, h.q""".stripMargin

  /** The per-event-type LOG-LINEAR quantile contract shared by q54
    * (incremental batch merge) and e51 (streaming counter maintenance) —
    * the histEventsSql pattern on the unbounded-domain sketch: the
    * from-scratch octave binning (ceil-log2 with the two exact
    * power-of-two corrections — see [[graft.operators.Sketches
    * .logLinCode]]'s determinism contract), sub-bucket arithmetic,
    * cumulative walk and interpolated estimate, all in one SQL
    * definition, so every maintenance path must land on identical
    * estimates.
    */
  private val logLinEventsSql =
    """WITH src AS (SELECT event_type AS grp, value AS v FROM events),
      |oct AS (SELECT grp, v, ABS(v) AS a,
      |    CAST(CEIL(LOG2(ABS(v))) AS BIGINT) AS k0 FROM src
      |  WHERE v <> 0e0 AND isfinite(v)),
      |kk AS (SELECT grp, v, a,
      |    GREATEST(CASE WHEN a > POWER(2.0, k0) THEN k0 + 1
      |         WHEN a <= POWER(2.0, k0 - 1) THEN k0 - 1
      |         ELSE k0 END, -1073) AS k FROM oct),
      |cd AS (
      |  SELECT grp, CASE WHEN v > 0e0 THEN mag ELSE -mag END AS code FROM (
      |    SELECT grp, v, (k + 1100) * 16 + LEAST(15,
      |        CAST(FLOOR((a - POWER(2.0, k - 1)) * 16e0 / POWER(2.0, k - 1))
      |          AS BIGINT)) AS mag
      |    FROM kk) x
      |  UNION ALL
      |  SELECT grp, 0 AS code FROM src WHERE v = 0e0),
      |bc AS (SELECT grp, code, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM cd GROUP BY grp, code),
      |cum AS (SELECT grp, code, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY code) AS BIGINT) AS cum
      |  FROM bc),
      |tot AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM bc GROUP BY grp),
      |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.5), (0.9), (0.99)) v(q)),
      |tgt AS (SELECT t.grp, qs.q, t.n, qs.q * CAST(t.n AS DOUBLE) AS t
      |  FROM tot t CROSS JOIN qs),
      |hit AS (SELECT tgt.grp, tgt.q, tgt.n, tgt.t, MIN(c.code) AS code
      |  FROM tgt JOIN cum c ON c.grp = tgt.grp AND CAST(c.cum AS DOUBLE) >= tgt.t
      |  GROUP BY tgt.grp, tgt.q, tgt.n, tgt.t),
      |geo AS (SELECT h.grp, h.q, h.n, h.t, h.code, c.cum, c.cnt,
      |    ABS(h.code) // 16 - 1100 AS k, ABS(h.code) % 16 AS sub
      |  FROM hit h JOIN cum c ON c.grp = h.grp AND c.code = h.code)
      |SELECT grp, q, n, code,
      |  CASE WHEN code = 0 THEN 0e0
      |       WHEN code > 0 THEN
      |         (POWER(2.0, k - 1) + CAST(sub AS DOUBLE) * (POWER(2.0, k - 1) / 16e0))
      |         + (t - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)
      |           * (POWER(2.0, k - 1) / 16e0)
      |       ELSE
      |         -((POWER(2.0, k - 1) + CAST(sub AS DOUBLE) * (POWER(2.0, k - 1) / 16e0))
      |           + POWER(2.0, k - 1) / 16e0)
      |         + (t - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)
      |           * (POWER(2.0, k - 1) / 16e0)
      |  END AS est
      |FROM geo ORDER BY grp, q""".stripMargin

  /** The per-event-type RANK-ERROR quantile contract shared by q55
    * (incremental state merge) and e52 (streaming state maintenance) —
    * the logLinEventsSql pattern on the third quantile-sketch class
    * (bounded RANK error on arbitrary distributions; see
    * [[graft.operators.Sketches.RankQSampleAgg]]): levels from the
    * materialized event-id hashes via the HLL oracle's smear/popcount
    * arithmetic, the adaptive cutoff L from the level histogram's suffix
    * counts, the ≤256-row sample, and the order-statistic pick — all
    * recomputed from scratch in SQL, so every maintenance path must land
    * on identical estimates.
    */
  private val rankQEventsSql =
    """WITH uh AS (SELECT event_id, h FROM read_parquet('{{AUX}}/event_hashes/*.parquet')),
      |src AS (SELECT e.event_type AS grp, e.value AS v, uh.h AS h
      |  FROM events e JOIN uh USING (event_id)),
      |wb AS (SELECT grp, v, h, h & 9223372036854775807 AS w FROM src),
      |s1 AS (SELECT grp, v, h, w | (w >> 1) AS s FROM wb),
      |s2 AS (SELECT grp, v, h, s | (s >> 2) AS s FROM s1),
      |s3 AS (SELECT grp, v, h, s | (s >> 4) AS s FROM s2),
      |s4 AS (SELECT grp, v, h, s | (s >> 8) AS s FROM s3),
      |s5 AS (SELECT grp, v, h, s | (s >> 16) AS s FROM s4),
      |s6 AS (SELECT grp, v, h, s | (s >> 32) AS s FROM s5),
      |lv AS (SELECT grp, v, h, 63 - bit_count(s) AS lvl FROM s6),
      |hist AS (SELECT grp, lvl, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM lv GROUP BY grp, lvl),
      |suf AS (SELECT grp, lvl, SUM(cnt) OVER (PARTITION BY grp ORDER BY lvl DESC) AS suffix
      |  FROM hist),
      |sel AS (SELECT grp,
      |    CAST(COALESCE(MAX(CASE WHEN suffix > {{K}} THEN lvl + 1 END), 0) AS BIGINT) AS l
      |  FROM suf GROUP BY grp),
      |tot AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY grp),
      |samp AS (SELECT lv.grp, lv.v,
      |    ROW_NUMBER() OVER (PARTITION BY lv.grp ORDER BY lv.v, lv.h) AS rn
      |  FROM lv JOIN sel ON sel.grp = lv.grp WHERE lv.lvl >= sel.l),
      |msz AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS m FROM samp GROUP BY grp),
      |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.5), (0.9), (0.99)) v(q)),
      |tgt AS (SELECT t.grp, qs.q, t.n, sel.l, msz.m,
      |    GREATEST(1, CAST(CEIL(qs.q * CAST(msz.m AS DOUBLE)) AS BIGINT)) AS r
      |  FROM tot t JOIN sel ON sel.grp = t.grp JOIN msz ON msz.grp = t.grp
      |  CROSS JOIN qs)
      |SELECT tgt.grp, tgt.q, tgt.n, tgt.l, tgt.m, s.v AS est
      |FROM tgt JOIN samp s ON s.grp = tgt.grp AND s.rn = tgt.r
      |ORDER BY tgt.grp, tgt.q""".stripMargin
      .replace("{{K}}", Sketches.RankQK.toString) // one k, both engines

  /** The per-event-type HLL contract shared by q46 (incremental batch
    * merge) and e24 (streaming register maintenance): one SQL definition —
    * the from-scratch sketch over ALL events — so both maintenance paths
    * must land on the identical estimate by construction.
    */
  private val hllEventsSql =
    """WITH uh AS (SELECT user_id, h FROM read_parquet('{{AUX}}/user_hashes/*.parquet')),
      |lnl AS (SELECT z, lnv FROM read_parquet('{{AUX}}/hll_ln/*.parquet')),
      |keys AS (
      |  SELECT e.event_type AS grp, uh.h AS h
      |  FROM events e JOIN uh USING (user_id)),
      |hm AS (SELECT grp, (h >> 60) & 15 AS bucket,
      |  h & 1152921504606846975 AS w FROM keys),
      |s1 AS (SELECT grp, bucket, w, w | (w >> 1) AS s FROM hm),
      |s2 AS (SELECT grp, bucket, w, s | (s >> 2) AS s FROM s1),
      |s3 AS (SELECT grp, bucket, w, s | (s >> 4) AS s FROM s2),
      |s4 AS (SELECT grp, bucket, w, s | (s >> 8) AS s FROM s3),
      |s5 AS (SELECT grp, bucket, w, s | (s >> 16) AS s FROM s4),
      |s6 AS (SELECT grp, bucket, w, s | (s >> 32) AS s FROM s5),
      |rho AS (SELECT grp, bucket,
      |  LEAST(CASE WHEN w = 0 THEN 61 ELSE (64 - bit_count(s)) - 3 END, 40) AS reg
      |  FROM s6),
      |regs AS (SELECT grp, bucket, MAX(reg) AS reg FROM rho GROUP BY grp, bucket),
      |g AS (SELECT grp,
      |    CAST(16 - COUNT(*) AS INT) AS zeros,
      |    CAST(SUM(1::BIGINT << CAST(40 - reg AS INT)) AS BIGINT) AS s_present
      |  FROM regs GROUP BY grp),
      |est0 AS (SELECT grp, zeros,
      |    s_present + CAST(zeros AS BIGINT) * 1099511627776 AS s_num FROM g),
      |est1 AS (SELECT grp, zeros, s_num,
      |    CAST(0.673 AS DOUBLE) * CAST(256 AS DOUBLE) * CAST(1099511627776 AS DOUBLE)
      |      / CAST(s_num AS DOUBLE) AS est_raw
      |  FROM est0)
      |SELECT grp, zeros, s_num,
      |  CASE WHEN zeros > 0 AND est_raw <= CAST(40.0 AS DOUBLE)
      |    THEN CAST(16.0 AS DOUBLE) * lnl.lnv ELSE est_raw END AS est
      |FROM est1 LEFT JOIN lnl ON lnl.z = est1.zeros
      |ORDER BY grp""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // HyperLogLog distinct-count over two groupings at once — distinct
    // users per event type (the raw harmonic-mean branch at test scale) and
    // distinct docs per source (the linear-counting branch), so BOTH
    // estimator regimes are oracle-exercised. The union happens BEFORE the
    // register groupBy: one register shuffle + one estimate shuffle total.
    "q43_hll_distinct" -> of(
      """WITH uh AS (SELECT user_id, h FROM read_parquet('{{AUX}}/user_hashes/*.parquet')),
        |dh AS (SELECT doc_id, h FROM read_parquet('{{AUX}}/doc_hashes/*.parquet')),
        |lnl AS (SELECT z, lnv FROM read_parquet('{{AUX}}/hll_ln/*.parquet')),
        |keys AS (
        |  SELECT 'events' AS kind, e.event_type AS grp, uh.h AS h
        |  FROM events e JOIN uh USING (user_id)
        |  UNION ALL
        |  SELECT 'documents' AS kind, dc.source AS grp, dh.h AS h
        |  FROM documents dc JOIN dh USING (doc_id)),
        |hm AS (SELECT kind, grp, (h >> 60) & 15 AS bucket,
        |  h & 1152921504606846975 AS w FROM keys),
        |s1 AS (SELECT kind, grp, bucket, w, w | (w >> 1) AS s FROM hm),
        |s2 AS (SELECT kind, grp, bucket, w, s | (s >> 2) AS s FROM s1),
        |s3 AS (SELECT kind, grp, bucket, w, s | (s >> 4) AS s FROM s2),
        |s4 AS (SELECT kind, grp, bucket, w, s | (s >> 8) AS s FROM s3),
        |s5 AS (SELECT kind, grp, bucket, w, s | (s >> 16) AS s FROM s4),
        |s6 AS (SELECT kind, grp, bucket, w, s | (s >> 32) AS s FROM s5),
        |rho AS (SELECT kind, grp, bucket,
        |  LEAST(CASE WHEN w = 0 THEN 61 ELSE (64 - bit_count(s)) - 3 END, 40) AS reg
        |  FROM s6),
        |regs AS (SELECT kind, grp, bucket, MAX(reg) AS reg
        |  FROM rho GROUP BY kind, grp, bucket),
        |g AS (SELECT kind, grp,
        |    CAST(16 - COUNT(*) AS INT) AS zeros,
        |    CAST(SUM(1::BIGINT << CAST(40 - reg AS INT)) AS BIGINT) AS s_present
        |  FROM regs GROUP BY kind, grp),
        |est0 AS (SELECT kind, grp, zeros,
        |    s_present + CAST(zeros AS BIGINT) * 1099511627776 AS s_num FROM g),
        |est1 AS (SELECT kind, grp, zeros, s_num,
        |    CAST(0.673 AS DOUBLE) * CAST(256 AS DOUBLE) * CAST(1099511627776 AS DOUBLE)
        |      / CAST(s_num AS DOUBLE) AS est_raw
        |  FROM est0)
        |SELECT kind, grp, zeros, s_num,
        |  CASE WHEN zeros > 0 AND est_raw <= CAST(40.0 AS DOUBLE)
        |    THEN CAST(16.0 AS DOUBLE) * lnl.lnv ELSE est_raw END AS est
        |FROM est1 LEFT JOIN lnl ON lnl.z = est1.zeros
        |ORDER BY kind, grp""") { (s, d) =>
      val ev = Q.events(s, d).select(lit("events").as("kind"),
        col("event_type").as("grp"), col("user_id").as("k"))
      val docs = t(s, d, "documents").select(lit("documents").as("kind"),
        col("source").as("grp"), col("doc_id").as("k"))
      val regs = Sketches.hllRegisters(ev.unionByName(docs), Seq("kind", "grp"), col("k"))
      Sketches.hllEstimate(regs, Seq("kind", "grp")).orderBy("kind", "grp")
    },

    // Count-Min heavy hitters: top-20 exact tokens with their grid
    // estimate alongside — integer-exact end to end, so the oracle match is
    // bit-trivial and the ≥-truth guarantee is visible per row.
    "q44_cms_heavy_hitters" -> of(
      """WITH ch AS (SELECT tok, r, h FROM read_parquet('{{AUX}}/cms_hashes/*.parquet')),
        |toks AS (
        |  SELECT u.tok
        |  FROM (SELECT string_split(text, ' ') AS tk FROM documents) d,
        |    UNNEST(tk) AS u(tok)),
        |counts AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
        |routed AS (SELECT c.tok, c.n, ch.r, (ch.h >> 58) & 63 AS bucket
        |  FROM counts c JOIN ch ON ch.tok = c.tok),
        |cells AS (SELECT r, bucket, CAST(SUM(n) AS BIGINT) AS cell
        |  FROM routed GROUP BY r, bucket),
        |est AS (SELECT ro.tok, ro.n, MIN(ce.cell) AS cms_est
        |  FROM routed ro JOIN cells ce ON ce.r = ro.r AND ce.bucket = ro.bucket
        |  GROUP BY ro.tok, ro.n)
        |SELECT tok, n, cms_est FROM est ORDER BY n DESC, tok LIMIT 20""") { (s, d) =>
      Sketches.cmsHeavyHitters(t(s, d, "documents"), "text", 20)
    },

    // Incremental aggregate maintenance: the monthly order-status rollup is
    // maintained as standing state + a delta batch merged in (split at
    // 2000-01-01), and must equal the from-scratch aggregate over all
    // orders — the oracle IS that from-scratch recompute, so equality
    // proves state(A) ⊕ state(B) = state(A ∪ B) on real data.
    "q45_incremental_agg" -> of(
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS om,
        |  o_orderstatus AS status,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY om, status""") { (s, d) =>
      val orders = t(s, d, "orders")
        .withColumn("om", date_trunc("month", col("o_orderdate")))
      val cut = lit("2000-01-01").cast("timestamp")
      val keys = Seq("om", "o_orderstatus")
      val base = Merges.aggState(
        orders.filter(col("o_orderdate") < cut), keys, "o_totalprice")
      val delta = Merges.aggState(
        orders.filter(col("o_orderdate") >= cut), keys, "o_totalprice")
      Merges.mergeAggStates(base, delta, keys)
        .select(col("om"), col("o_orderstatus").as("status"),
          col("cnt"), col("tot").cast("double").as("total"))
        .orderBy("om", "status")
    },

    // Incremental JOIN view maintenance (q49): the join half of the IVM
    // story (q45 = aggregate state, q46/q47 = sketch state). The standing
    // view is orders ⋈ customer with BOTH sides split (orders at
    // 2000-01-01, customers at key mod 10 = 0 — "newly onboarded"); the
    // delta algebra ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB unioned onto the old view
    // must equal the from-scratch join over everything — which is exactly
    // what the oracle recomputes, proving the three delta terms cover the
    // new pairs disjointly. Per-ingest join work ∝ the deltas; the
    // standing view is never recomputed.
    "q49_incremental_join" -> of(
      """SELECT o.o_orderkey, c.c_custkey, c.c_name,
        |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o_orderkey""") { (s, d) =>
      val cutO = lit("2000-01-01").cast("timestamp")
      val o = t(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey").as("c_custkey"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("total"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
      val (baseO, deltaO) =
        (o.filter(col("o_orderdate") < cutO), o.filter(col("o_orderdate") >= cutO))
      val (baseC, deltaC) =
        (c.filter(pmod(col("c_custkey"), lit(10)) =!= 0),
          c.filter(pmod(col("c_custkey"), lit(10)) === 0))
      val standing = baseO.join(baseC, Seq("c_custkey"))
      val delta = Merges.incrementalJoinDelta(
        baseO, deltaO, baseC, deltaC, Seq("c_custkey"))
      standing.unionByName(delta)
        .select("o_orderkey", "c_custkey", "c_name", "total")
        .orderBy("o_orderkey")
    },

    // Incremental HLL: a STANDING register table (events before Jan 15)
    // absorbs the delta batch (rest of the month) via register-max merge,
    // and the estimate over the merged state must equal the from-scratch
    // sketch over all events — the oracle IS that from-scratch recompute
    // (q43's events branch), so equality proves sketch-state IVM the way
    // q45 proves it for decimal aggregate state.
    "q46_hll_incremental" -> of(hllEventsSql) { (s, d) =>
      val ev = Q.events(s, d)
      val cut = lit("2024-01-15").cast("timestamp")
      def regsOf(df: org.apache.spark.sql.DataFrame) = Sketches.hllRegisters(
        df.select(col("event_type").as("grp"), col("user_id").as("k")),
        Seq("grp"), col("k"))
      val merged = Sketches.hllMergeRegisters(
        regsOf(ev.filter(col("ts") < cut)),
        regsOf(ev.filter(col("ts") >= cut)), Seq("grp"))
      Sketches.hllEstimate(merged, Seq("grp")).orderBy("grp")
    },

    // Mergeable histogram quantile sketch, maintained INCREMENTALLY: the
    // per-event-type value histogram is built as standing state (events
    // before Jan 15) + a delta batch merged in by per-bin ADDITION, then
    // p50/p90/p99 are interpolated from the merged counters — and must
    // equal the from-scratch sketch over all events, which is exactly what
    // the oracle recomputes (the q46 incremental-proof contract for
    // counter state). Plan: one bin-count shuffle with map-side partial
    // sums (the combine IS the merge); everything downstream operates on
    // ≤ 64 rows per group.
    "q47_hist_quantiles" -> of(histEventsSql) { (s, d) =>
      val ev = Q.events(s, d)
      val cut = lit("2024-01-15").cast("timestamp")
      def histOf(df: org.apache.spark.sql.DataFrame) = Sketches.histCounts(
        df.select(col("event_type").as("grp"), col("value")),
        Seq("grp"), col("value"))
      val merged = Sketches.histMergeCounts(
        histOf(ev.filter(col("ts") < cut)),
        histOf(ev.filter(col("ts") >= cut)), Seq("grp"))
      Sketches.histQuantiles(merged, Seq("grp"), Seq(0.5, 0.9, 0.99))
        .orderBy("grp", "q")
    },

    // One-pass column profiler (q48): the first query against an
    // unfamiliar table — per column, row/null/exact-distinct counts,
    // string-image min/max, and the HLL distinct ESTIMATE alongside the
    // exact count (the q44 auditable-estimate pattern: at 100 TB the
    // sketch is what actually runs; exact count-distinct rides along here
    // so every estimate is graded row by row). Column images are chosen
    // cross-engine-stable: strings as-is, integers via plain cast, the
    // double through DECIMAL(18,2). Both the low-cardinality (status,
    // priority → linear counting) and high-cardinality (custkey, price →
    // raw harmonic) estimator branches are exercised.
    "q48_profile_table" -> of(
      """WITH ph AS (SELECT v, h FROM read_parquet('{{AUX}}/profile_hashes/*.parquet')),
        |lnl AS (SELECT z, lnv FROM read_parquet('{{AUX}}/hll_ln/*.parquet')),
        |m AS (
        |  SELECT 'o_orderstatus' AS col, CAST(o_orderstatus AS VARCHAR) AS v FROM orders
        |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_totalprice',
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) FROM orders),
        |prof AS (SELECT col, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
        |    MIN(v) AS min_v, MAX(v) AS max_v
        |  FROM m GROUP BY col),
        |keys AS (SELECT m.col AS grp, ph.h AS h FROM m JOIN ph ON ph.v = m.v),
        |hm AS (SELECT grp, (h >> 60) & 15 AS bucket,
        |  h & 1152921504606846975 AS w FROM keys),
        |s1 AS (SELECT grp, bucket, w, w | (w >> 1) AS s FROM hm),
        |s2 AS (SELECT grp, bucket, w, s | (s >> 2) AS s FROM s1),
        |s3 AS (SELECT grp, bucket, w, s | (s >> 4) AS s FROM s2),
        |s4 AS (SELECT grp, bucket, w, s | (s >> 8) AS s FROM s3),
        |s5 AS (SELECT grp, bucket, w, s | (s >> 16) AS s FROM s4),
        |s6 AS (SELECT grp, bucket, w, s | (s >> 32) AS s FROM s5),
        |rho AS (SELECT grp, bucket,
        |  LEAST(CASE WHEN w = 0 THEN 61 ELSE (64 - bit_count(s)) - 3 END, 40) AS reg
        |  FROM s6),
        |regs AS (SELECT grp, bucket, MAX(reg) AS reg FROM rho GROUP BY grp, bucket),
        |g AS (SELECT grp,
        |    CAST(16 - COUNT(*) AS INT) AS zeros,
        |    CAST(SUM(1::BIGINT << CAST(40 - reg AS INT)) AS BIGINT) AS s_present
        |  FROM regs GROUP BY grp),
        |est0 AS (SELECT grp, zeros,
        |    s_present + CAST(zeros AS BIGINT) * 1099511627776 AS s_num FROM g),
        |est1 AS (SELECT grp, zeros, s_num,
        |    CAST(0.673 AS DOUBLE) * CAST(256 AS DOUBLE) * CAST(1099511627776 AS DOUBLE)
        |      / CAST(s_num AS DOUBLE) AS est_raw
        |  FROM est0),
        |est AS (SELECT grp,
        |  CASE WHEN zeros > 0 AND est_raw <= CAST(40.0 AS DOUBLE)
        |    THEN CAST(16.0 AS DOUBLE) * lnl.lnv ELSE est_raw END AS est
        |  FROM est1 LEFT JOIN lnl ON lnl.z = est1.zeros)
        |SELECT p.col, p.n_rows, p.n_null, p.n_distinct, e.est AS distinct_est,
        |  p.min_v, p.max_v
        |FROM prof p JOIN est e ON e.grp = p.col
        |ORDER BY p.col""") { (s, d) =>
      graft.operators.QualityChecks.profileColumns(t(s, d, "orders"), Seq(
        "o_orderstatus" -> col("o_orderstatus"),
        "o_custkey" -> col("o_custkey"),
        "o_orderpriority" -> col("o_orderpriority"),
        "o_totalprice" -> col("o_totalprice").cast("decimal(18,2)")))
        .orderBy("col")
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis): 50 docs
    // drawn with inclusion probability ∝ n_chars — the quality-weighted
    // selection step of a corpus build. The oracle takes only ln(u) from
    // the aux dump and rebuilds keys, ranking and the cut in SQL.
    "t31_weighted_sample" -> of(
      """WITH wr AS (SELECT doc_id, lnu FROM read_parquet('{{AUX}}/wrs_logu/*.parquet')),
        |keyed AS (SELECT d.doc_id, d.source, d.n_chars,
        |    wr.lnu / CAST(d.n_chars AS DOUBLE) AS key
        |  FROM documents d JOIN wr USING (doc_id) WHERE d.n_chars > 0),
        |rk AS (SELECT keyed.*, ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS rank
        |  FROM keyed)
        |SELECT CAST(rank AS INT) AS rank, doc_id, source, n_chars, key
        |FROM rk WHERE rank <= 50 ORDER BY rank""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      graft.operators.CorpusOps.weightedSample(
        t(s, d, "documents"), "doc_id", col("n_chars"), 50)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("key").desc, col("doc_id"))))
        .select("rank", "doc_id", "source", "n_chars", "key")
        .orderBy("rank")
    },

    // Streaming HLL: the register table is MAINTAINED BY THE STREAM (one
    // complete-mode max-aggregate — state is m rows per group, bounded by
    // construction, never per-user); the estimate is a batch read over the
    // materialized state, which is how a live cardinality dashboard serves
    // it. Graded against the same from-scratch SQL as q46, so the
    // streaming maintenance path must land on the identical estimate.
    "e24_stream_hll" -> of(hllEventsSql) { (s, d) =>
      import graft.streaming.EventsStream
      val ev = EventsStream.readEvents(s, d)
      val regs = Sketches.hllRegisters(
        ev.select(col("event_type").as("grp"), col("user_id").as("k")),
        Seq("grp"), col("k"))
      val sinkName = s"stream_hll_${sinkCounter.incrementAndGet()}"
      EventsStream.runAvailableNow(regs, sinkName, outputMode = "complete")
      Sketches.hllEstimate(s.table(sinkName), Seq("grp")).orderBy("grp")
    },

    // Streaming Count-Min: the d×w counter grid is MAINTAINED BY THE
    // STREAM (one complete-mode count over per-instance cell routing —
    // state is the 192 grid cells, bounded however many distinct users
    // flow past; exact per-user streaming counts would hold one state row
    // PER USER, the thing the sketch exists to avoid). The heavy-hitter
    // listing is then a batch read joining exact counts with the streamed
    // grid — the q44 auditable output served from live sketch state, as
    // e24 serves the HLL estimate from streamed registers. Oracle = the
    // from-scratch grid over all events, so stream maintenance must land
    // on the identical cells.
    "e25_stream_cms" -> of(
      """WITH ch AS (SELECT user_id, r, h FROM read_parquet('{{AUX}}/user_cms_hashes/*.parquet')),
        |counts AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id),
        |routed AS (SELECT c.user_id, c.n, ch.r, (ch.h >> 58) & 63 AS bucket
        |  FROM counts c JOIN ch ON ch.user_id = c.user_id),
        |cells AS (SELECT r, bucket, CAST(SUM(n) AS BIGINT) AS cell
        |  FROM routed GROUP BY r, bucket),
        |est AS (SELECT ro.user_id, ro.n, MIN(ce.cell) AS cms_est
        |  FROM routed ro JOIN cells ce ON ce.r = ro.r AND ce.bucket = ro.bucket
        |  GROUP BY ro.user_id, ro.n)
        |SELECT user_id, n, cms_est FROM est
        |ORDER BY n DESC, user_id LIMIT 20""") { (s, d) =>
      import graft.streaming.EventsStream
      val ev = EventsStream.readEvents(s, d)
      val grid = Sketches.cmsInstances(ev, col("user_id"))
        .groupBy("r", "bucket").agg(count(lit(1)).as("cell"))
      val sinkName = s"stream_cms_${sinkCounter.incrementAndGet()}"
      EventsStream.runAvailableNow(grid, sinkName, outputMode = "complete")
      val exact = Q.events(s, d)
        .select(col("user_id").as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
      Sketches.cmsEstimates(exact, s.table(sinkName))
        .select(col("tok").as("user_id"), col("n"), col("cms_est"))
        .orderBy(col("n").desc, col("user_id")).limit(20)
    },

    // Streaming histogram: the per-group bin counters are MAINTAINED BY
    // THE STREAM (one complete-mode count aggregate — state is ≤ 64 bins
    // per group, bounded by the sketch spec, never per-value); the
    // quantile interpolation is a batch read over the materialized state,
    // which is how a live latency/size dashboard serves p50/p90/p99.
    // Graded against the same from-scratch SQL as q47, so all THREE
    // maintenance paths — from-scratch, incremental merge, streaming —
    // must land on identical estimates (completing the e24/e25 pattern:
    // every mergeable sketch family ships its streaming twin).
    "e26_stream_hist" -> of(histEventsSql) { (s, d) =>
      import graft.streaming.EventsStream
      val ev = EventsStream.readEvents(s, d)
      val counts = Sketches.histCounts(
        ev.select(col("event_type").as("grp"), col("value")),
        Seq("grp"), col("value"))
      val sinkName = s"stream_hist_${sinkCounter.incrementAndGet()}"
      EventsStream.runAvailableNow(counts, sinkName, outputMode = "complete")
      Sketches.histQuantiles(s.table(sinkName), Seq("grp"), Seq(0.5, 0.9, 0.99))
        .orderBy("grp", "q")
    },

    // Streaming KMV: the bottom-k sketch is MAINTAINED BY THE STREAM (the
    // BottomKDistinctLongs Aggregator as a complete-mode streaming agg —
    // state is ≤ k hashes per group, bounded by the sketch spec); the
    // estimate is a batch read over the materialized sketches. Completes
    // the streaming-maintenance story for all four sketch families
    // (e24 HLL registers, e25 CMS cells, e26 histogram bins, e27 KMV
    // bottom-k). Oracle = the from-scratch per-type sketch + estimate over
    // all events (t30's single-sketch walk), so stream maintenance must
    // land on identical sketches.
    "e27_stream_kmv" -> of(
      """WITH uh AS (SELECT user_id, h FROM read_parquet('{{AUX}}/user_hashes/*.parquet')),
        |fh AS (SELECT DISTINCT e.event_type AS et, xor(uh.h, -9223372036854775808) AS fh
        |  FROM events e JOIN uh USING (user_id)),
        |rk AS (SELECT et, fh, ROW_NUMBER() OVER (PARTITION BY et ORDER BY fh) AS rn,
        |  COUNT(*) OVER (PARTITION BY et) AS cnt FROM fh),
        |kth AS (SELECT et, MAX(cnt) AS cnt,
        |  MAX(CASE WHEN rn = 32 THEN fh END) AS kfh FROM rk WHERE rn <= 32 GROUP BY et)
        |SELECT et, CAST(LEAST(cnt, 32) AS INT) AS sk_size,
        |  CASE WHEN cnt < 32 THEN CAST(LEAST(cnt, 32) AS DOUBLE)
        |  ELSE CAST(31.0 AS DOUBLE) /
        |    ((CAST(xor(kfh, -9223372036854775808) AS DOUBLE)
        |      + CASE WHEN xor(kfh, -9223372036854775808) < 0
        |          THEN CAST(18446744073709551616 AS DOUBLE)
        |          ELSE CAST(0 AS DOUBLE) END)
        |     / CAST(18446744073709551616 AS DOUBLE)) END AS est
        |FROM kth ORDER BY et""") { (s, d) =>
      import graft.streaming.EventsStream
      val ev = EventsStream.readEvents(s, d)
      val sk = Sketches.kmvSketches(
        ev.select(col("event_type").as("et"), col("user_id")),
        "et", col("user_id"), Sketches.KmvK)
      val sinkName = s"stream_kmv_${sinkCounter.incrementAndGet()}"
      EventsStream.runAvailableNow(sk, sinkName, outputMode = "complete")
      s.table(sinkName)
        .select(col("et"), size(col("sk")).as("sk_size"),
          Sketches.kmvEstimate(col("sk"), Sketches.KmvK).as("est"))
        .orderBy("et")
    },

    // KMV/theta sketch set algebra: per-event-type user sketches (k=32),
    // then union + inclusion-exclusion intersection estimates for every
    // type pair FROM THE SKETCHES ALONE; exact counts ride along so the
    // estimates are auditable per row.
    "t30_kmv_set_ops" -> of(
      """WITH uh AS (SELECT user_id, h FROM read_parquet('{{AUX}}/user_hashes/*.parquet')),
        |eu AS (SELECT DISTINCT e.event_type AS et, e.user_id FROM events e),
        |exact AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS exact FROM eu GROUP BY et),
        |fh AS (SELECT DISTINCT eu.et, xor(uh.h, -9223372036854775808) AS fh
        |  FROM eu JOIN uh USING (user_id)),
        |rk AS (SELECT et, fh, ROW_NUMBER() OVER (PARTITION BY et ORDER BY fh) AS rn,
        |  COUNT(*) OVER (PARTITION BY et) AS cnt FROM fh),
        |bot AS (SELECT et, fh, rn, cnt FROM rk WHERE rn <= 32),
        |kth AS (SELECT et, MAX(cnt) AS cnt,
        |  MAX(CASE WHEN rn = 32 THEN fh END) AS kfh FROM bot GROUP BY et),
        |sest AS (SELECT et,
        |  CASE WHEN cnt < 32 THEN CAST(cnt AS DOUBLE)
        |  ELSE CAST(31.0 AS DOUBLE) /
        |    ((CAST(xor(kfh, -9223372036854775808) AS DOUBLE)
        |      + CASE WHEN xor(kfh, -9223372036854775808) < 0
        |          THEN CAST(18446744073709551616 AS DOUBLE)
        |          ELSE CAST(0 AS DOUBLE) END)
        |     / CAST(18446744073709551616 AS DOUBLE)) END AS est
        |  FROM kth),
        |pairs AS (SELECT a.et AS et_a, b.et AS et_b
        |  FROM exact a JOIN exact b ON a.et < b.et),
        |ubot AS (SELECT DISTINCT p.et_a, p.et_b, bo.fh
        |  FROM pairs p JOIN bot bo ON bo.et = p.et_a OR bo.et = p.et_b),
        |urk AS (SELECT et_a, et_b, fh,
        |  ROW_NUMBER() OVER (PARTITION BY et_a, et_b ORDER BY fh) AS rn,
        |  COUNT(*) OVER (PARTITION BY et_a, et_b) AS ucnt FROM ubot),
        |ukth AS (SELECT et_a, et_b, MAX(ucnt) AS ucnt,
        |  MAX(CASE WHEN rn = 32 THEN fh END) AS kfh FROM urk GROUP BY et_a, et_b),
        |uest AS (SELECT et_a, et_b,
        |  CASE WHEN ucnt < 32 THEN CAST(ucnt AS DOUBLE)
        |  ELSE CAST(31.0 AS DOUBLE) /
        |    ((CAST(xor(kfh, -9223372036854775808) AS DOUBLE)
        |      + CASE WHEN xor(kfh, -9223372036854775808) < 0
        |          THEN CAST(18446744073709551616 AS DOUBLE)
        |          ELSE CAST(0 AS DOUBLE) END)
        |     / CAST(18446744073709551616 AS DOUBLE)) END AS est_union
        |  FROM ukth),
        |inter AS (SELECT a.et AS et_a, b.et AS et_b,
        |    CAST(COUNT(*) AS BIGINT) AS exact_inter
        |  FROM eu a JOIN eu b ON a.user_id = b.user_id AND a.et < b.et
        |  GROUP BY 1, 2)
        |SELECT p.et_a, p.et_b, ea.exact AS exact_a, eb.exact AS exact_b,
        |  COALESCE(i.exact_inter, 0) AS exact_inter,
        |  sa.est AS est_a, sb.est AS est_b, u.est_union AS est_union,
        |  (sa.est + sb.est) - u.est_union AS est_inter
        |FROM pairs p
        |JOIN exact ea ON ea.et = p.et_a
        |JOIN exact eb ON eb.et = p.et_b
        |JOIN sest sa ON sa.et = p.et_a
        |JOIN sest sb ON sb.et = p.et_b
        |JOIN uest u ON u.et_a = p.et_a AND u.et_b = p.et_b
        |LEFT JOIN inter i ON i.et_a = p.et_a AND i.et_b = p.et_b
        |ORDER BY p.et_a, p.et_b""") { (s, d) =>
      val ev = Q.events(s, d)
      val eu = ev.select(col("event_type").as("et"), col("user_id")).distinct()
      val exact = eu.groupBy("et").agg(count(lit(1)).as("exact"))
      val sk = Sketches.kmvSketches(ev, "event_type", col("user_id"), Sketches.KmvK)
        .withColumnRenamed("event_type", "et").join(exact, "et")
      val a = sk.select(col("et").as("et_a"), col("sk").as("sk_a"),
        col("exact").as("exact_a"))
      val b = sk.select(col("et").as("et_b"), col("sk").as("sk_b"),
        col("exact").as("exact_b"))
      val inter = eu.as("x")
        .join(eu.as("y"),
          col("x.user_id") === col("y.user_id") && col("x.et") < col("y.et"))
        .groupBy(col("x.et").as("et_a"), col("y.et").as("et_b"))
        .agg(count(lit(1)).as("exact_inter0"))
      val k = Sketches.KmvK
      a.join(b, col("et_a") < col("et_b"))
        .join(inter, Seq("et_a", "et_b"), "left")
        .withColumn("exact_inter", coalesce(col("exact_inter0"), lit(0L)))
        .withColumn("est_a", Sketches.kmvEstimate(col("sk_a"), k))
        .withColumn("est_b", Sketches.kmvEstimate(col("sk_b"), k))
        .withColumn("est_union",
          Sketches.kmvEstimate(Sketches.kmvUnion(col("sk_a"), col("sk_b"), k), k))
        .withColumn("est_inter", (col("est_a") + col("est_b")) - col("est_union"))
        .select("et_a", "et_b", "exact_a", "exact_b", "exact_inter",
          "est_a", "est_b", "est_union", "est_inter")
        .orderBy("et_a", "et_b")
    },

    // Log-linear quantile sketch with incremental merge (q54 — VERDICT r17
    // #7, the q47 histogram's UNBOUNDED-domain sibling): per-type
    // p50/p90/p99 from octave-binned counters (2^(k-1), 2^k] × 16 linear
    // sub-buckets — bounded RELATIVE error at any magnitude, no [lo, hi)
    // range baked into the sketch spec. Same split-merge proof shape as
    // q47: the state is built over two disjoint time halves and MERGED
    // (per-code sum), so the estimates must equal the from-scratch
    // sketch's by the additive state algebra. Determinism rides the
    // exact-arithmetic contract in Sketches.logLinCode (ceil-log2 with
    // power-of-two corrections; Sterbenz-exact sub-bucketing), which the
    // oracle mirrors operation for operation.
    "q54_loglin_quantiles" -> of(logLinEventsSql) { (s, d) =>
      val ev = Q.events(s, d)
      val cut = lit("2024-01-15").cast("timestamp")
      def st(df: org.apache.spark.sql.DataFrame) = Sketches.logLinCounts(
        df.select(col("event_type").as("grp"), col("value")),
        Seq("grp"), col("value"))
      val merged = Sketches.logLinMergeCounts(
        st(ev.filter(col("ts") < cut)),
        st(ev.filter(col("ts") >= cut)), Seq("grp"))
      Sketches.logLinQuantiles(merged, Seq("grp"), Seq(0.5, 0.9, 0.99))
        .orderBy("grp", "q")
    },

    // Streaming log-linear quantiles (e51): the per-group code counters
    // are MAINTAINED BY THE STREAM (one complete-mode count aggregate —
    // state is the codes PRESENT in the data, ≤ 16 × octaves-present per
    // group, bounded by the sketch spec, never per-value); the quantile
    // walk is a batch read over the materialized state. Graded against
    // the same from-scratch SQL as q54, so all three maintenance paths —
    // from-scratch, incremental merge, streaming — land on identical
    // estimates (the e26 pattern for the unbounded sketch).
    // Rank-error quantile sketch with incremental state merge (q55 —
    // VERDICT r18 #4, the third quantile-sketch class): per-type
    // p50/p90/p99 with bounded RANK error on ARBITRARY distributions —
    // the guarantee q47 (needs a known range) and q54 (relative VALUE
    // error, blind to clustering) don't give. KLL's role with the
    // compaction decisions hash-derived (level = clz(xxhash64(id))) so
    // the state is a deterministic function of the input multiset and a
    // from-scratch DuckDB oracle grades it bit-for-bit — a literal KLL
    // compactor stack is merge-tree-order-dependent, which Spark doesn't
    // fix. Same split-merge proof shape as q54: states built over two
    // disjoint time halves and merged by the state algebra (histograms
    // add, samples concat, re-cut at the merged level) must equal the
    // from-scratch sketch by the L-monotonicity argument.
    "q55_rankq_quantiles" -> of(rankQEventsSql) { (s, d) =>
      val ev = Q.events(s, d)
      val cut = lit("2024-01-15").cast("timestamp")
      def st(df: org.apache.spark.sql.DataFrame) = Sketches.rankQStates(
        df.select(col("event_type").as("grp"), col("event_id"), col("value")),
        Seq("grp"), col("event_id"), col("value"))
      val merged = Sketches.rankQMergeStates(
        st(ev.filter(col("ts") < cut)),
        st(ev.filter(col("ts") >= cut)), Seq("grp"))
      Sketches.rankQQuantiles(merged, Seq("grp"), Seq(0.5, 0.9, 0.99))
        .orderBy("grp", "q")
    },

    // Streaming rank-error quantiles (e52): the per-group sketch state —
    // 64 exact level counters + the ≤256-row adaptive sample — is
    // MAINTAINED BY THE STREAM (one complete-mode typed-aggregator
    // aggregate; the state algebra IS the Aggregator's merge, bounded by
    // the sketch spec, never per-value); the quantile walk is a batch
    // read over the materialized states. Graded against the same
    // from-scratch SQL as q55, so all three maintenance paths —
    // from-scratch, incremental merge, streaming — land on identical
    // estimates (the e51 pattern for the rank sketch).
    "e52_stream_rankq" -> of(rankQEventsSql) { (s, d) =>
      import graft.streaming.EventsStream
      val ev = EventsStream.readEvents(s, d)
      val states = Sketches.rankQStates(
        ev.select(col("event_type").as("grp"), col("event_id"), col("value")),
        Seq("grp"), col("event_id"), col("value"))
      val sinkName = s"stream_rankq_${sinkCounter.incrementAndGet()}"
      EventsStream.runAvailableNow(states, sinkName, outputMode = "complete")
      Sketches.rankQQuantiles(s.table(sinkName), Seq("grp"), Seq(0.5, 0.9, 0.99))
        .orderBy("grp", "q")
    },

    "e51_stream_loglin" -> of(logLinEventsSql) { (s, d) =>
      import graft.streaming.EventsStream
      val ev = EventsStream.readEvents(s, d)
      val counts = Sketches.logLinCounts(
        ev.select(col("event_type").as("grp"), col("value")),
        Seq("grp"), col("value"))
      val sinkName = s"stream_loglin_${sinkCounter.incrementAndGet()}"
      EventsStream.runAvailableNow(counts, sinkName, outputMode = "complete")
      Sketches.logLinQuantiles(s.table(sinkName), Seq("grp"), Seq(0.5, 0.9, 0.99))
        .orderBy("grp", "q")
    })
}
