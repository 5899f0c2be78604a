package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's rep-aggregation policy ([[Bench.judgeReps]]) and the
  * scrape-safety of the stdout summary ([[Bench.compactSummary]]).
  *
  * Round-7 VERDICT #4: a rep faster than the trusted minimum must never be
  * discarded by calibration — contention only inflates wall time, so the
  * invariant is `trusted_min ≤ min(runs)` whenever both exist.
  * Round-7 ADVICE (medium): the stdout line must stay well under the
  * driver's ~2KB log-tail scrape window even in the worst case (every
  * query untrusted AND failed); two rounds produced `parsed: null`.
  */
class BenchPolicySpec extends AnyFunSuite {
  private val T = true
  private val F = false

  test("trusted_min is the min over ALL ok reps when any rep is trusted (s10 case)") {
    // r7's s10_ivf_pq: fastest rep 5.00s was calibration-flagged, trusted
    // reps' min was 7.31s — the old policy reported 7.31s.
    val v = Bench.judgeReps(Seq(7.31, 8.02, 5.00), Seq(T, T, T), Seq(T, T, F), 3)
    assert(!v.failed)
    assert(v.rawMin.contains(5.00))
    assert(v.trustedMin.contains(5.00))
  }

  test("invariant: trustedMin ≤ rawMin for every rep/trust combination") {
    val secs = Seq(3.0, 1.0, 2.0, 0.5)
    for {
      okBits <- (0 until 16)
      trBits <- (0 until 16)
    } {
      val ok = (0 until 4).map(i => (okBits & (1 << i)) != 0)
      val tr = (0 until 4).map(i => (trBits & (1 << i)) != 0)
      val v = Bench.judgeReps(secs, ok, tr, baseReps = 3)
      for (t <- v.trustedMin; r <- v.rawMin)
        assert(t <= r, s"trustedMin $t > rawMin $r for ok=$ok trusted=$tr")
      // trustedMin defined ⟹ rawMin defined
      assert(v.trustedMin.isEmpty || v.rawMin.isDefined)
    }
  }

  test("no trusted successful rep → trustedMin empty, query is untrusted not failed") {
    val v = Bench.judgeReps(Seq(2.0, 2.1), Seq(T, T), Seq(F, F), 2)
    assert(!v.failed && v.rawMin.contains(2.0) && v.trustedMin.isEmpty)
  }

  test("a failed trust-RETRY rep does not fail a query with clean base reps (ADVICE r7)") {
    // 3 ok-but-untrusted base reps, then rep 4 (a trust retry) throws
    val v = Bench.judgeReps(Seq(2.0, 2.2, 2.1, 9.9), Seq(T, T, T, F),
      Seq(F, F, F, F), baseReps = 3)
    assert(!v.failed, "retry failure must not discard 3 successful base reps")
    assert(v.rawMin.contains(2.0))
    assert(v.trustedMin.isEmpty) // still untrusted — listed, not summed
  }

  test("a trusted retry rep rescues an all-untrusted query at the raw floor") {
    val v = Bench.judgeReps(Seq(5.0, 6.0, 7.0, 5.5), Seq(T, T, T, T),
      Seq(F, F, F, T), baseReps = 3)
    assert(!v.failed && v.trustedMin.contains(5.0))
  }

  test("a base-rep failure fails the query; all-failed yields no minima") {
    assert(Bench.judgeReps(Seq(1.0, 0.1), Seq(T, F), Seq(T, T), 2).failed)
    val all = Bench.judgeReps(Seq(0.1, 0.1), Seq(F, F), Seq(T, T), 2)
    assert(all.failed && all.rawMin.isEmpty && all.trustedMin.isEmpty)
  }

  test("compact stdout line stays under 1500 chars in the worst case") {
    // worst case: 132 long-named queries ALL untrusted and ALL failed,
    // plus a dispute filter suffix
    val names = (1 to 132).map(i => f"q${i}%02d_some_long_query_name_$i")
    val line = Bench.compactSummary(
      total = 113.2345, totalTrusted = 99999.9999, queriesN = 132,
      untrusted = names, failed = names, reps = 3, contended = true,
      sf = "/root/testdata/sf0.1", detail = "/root/repo/BENCH.json",
      filterFields = s""","filter":"${names.take(3).mkString(",")}","partial":true""")
    assert(line.length < 1500, s"compact line is ${line.length} chars:\n$line")
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(!line.contains("\n"))
    // the capped lists must make the truncation visible
    assert(line.contains("+122 more"))
    assert(line.contains("\"untrusted_n\":132"))
  }

  test("compact line carries full short lists uncapped") {
    val line = Bench.compactSummary(1.0, 1.0, 132, Seq("s10_ivf_pq"), Nil,
      3, contended = false, sf = "sf0.1", detail = "BENCH.json")
    assert(line.contains(""""untrusted":["s10_ivf_pq"]"""))
    assert(line.contains(""""errors":[]"""))
    assert(!line.contains("more"))
  }

  // ---- adaptive rep plan (round 18, VERDICT r17 #1) ----

  test("plannedReps: new queries (thin history) get the full default") {
    assert(Bench.plannedReps(3, Nil, Nil) === 3)
    assert(Bench.plannedReps(3, Seq(0.1, 0.1), Seq(0.1, 0.1)) === 3)
  }

  test("plannedReps: established, band-stable history → 2 reps (cold rep + warm measure, never 1)") {
    // the 1-rep tier was tried and measured wrong: a cold rep is ~2× the
    // warm floor (JIT/codegen), so one rep either ships inflated or
    // relabels the warm rep as a retry; a blanket 3rd rep is not paid —
    // within-band noise is the documented host-throughput band, which the
    // normalized headline absorbs and extra reps cannot fix
    val small = Seq(0.21, 0.22, 0.20)
    assert(Bench.plannedReps(3, small, small) === 2)
    val withinBand = Seq(4.0, 5.8, 3.9) // spread 1.49 ≤ 2.0
    assert(Bench.plannedReps(3, withinBand, withinBand) === 2)
  }

  test("worthChasing: needs BOTH the 1.5× relative signal and 0.5s of absolute excess") {
    // tiny query, hugely relative but immaterial: not chased
    assert(!Bench.worthChasing(0.55, 0.2, 1.0))
    // big query, material excess: chased
    assert(Bench.worthChasing(4.5, 2.0, 1.0))
    // relative trip but excess under the bar on a slow host: not chased
    assert(!Bench.worthChasing(0.8, 0.3, 1.2))
    // below the relative bar, however big the absolute gap: not chased
    assert(!Bench.worthChasing(14.0, 10.0, 1.0))
  }

  test("plannedReps: never exceeds the configured default") {
    val h = Seq(4.0, 5.8, 3.9) // would keep 3 under default 3
    assert(Bench.plannedReps(2, h, h) === 2)
    assert(Bench.plannedReps(1, h, h) === 1)
    assert(Bench.plannedReps(1, Seq(0.2, 0.2, 0.2), Seq(0.2, 0.2, 0.2)) === 1)
  }

  test("plannedReps: a >2× spread in recent normalized floors keeps the full default (ADVICE r18)") {
    // the norm series is now load-bearing: open disagreement in the last 3
    // host-normalized floors = the genuine variance tail → 3 base reps
    val unstable = Seq(1.0, 2.5, 1.1)
    assert(Bench.plannedReps(3, unstable, unstable) === 3)
    // raw noisy but normalized stable → the host moved, not the query → 2
    assert(Bench.plannedReps(3, Seq(1.0, 2.5, 1.1), Seq(1.0, 1.2, 1.1)) === 2)
    // older history beyond the last 3 never triggers the full default
    assert(Bench.plannedReps(3, Seq(9.0, 1.0, 1.1, 1.0),
      Seq(9.0, 1.0, 1.1, 1.0)) === 2)
  }

  // ---- host-throughput normalization (round 19, VERDICT r18 #1) ----

  test("normalizedSec: scales down by the rep's parallel-probe inflation, never up") {
    // probe at 2× the floor → host granted half throughput → quiet time ≈ sec/2
    assert(Bench.normalizedSec(10.0, 100.0, 50.0) === 5.0)
    // probe at the floor → untouched
    assert(Bench.normalizedSec(10.0, 50.0, 50.0) === 10.0)
    // degenerate probes (unmeasured, zero) → raw value unchanged
    assert(Bench.normalizedSec(10.0, 0.0, 50.0) === 10.0)
    assert(Bench.normalizedSec(10.0, 50.0, 0.0) === 10.0)
  }

  test("normalizedMin: decoupled mins absorb a transient probe-only spike, keep sustained steal") {
    // transient: rep1's probe spiked 2.3× (GC hit the probe, not the
    // query) — a per-rep pairing would emit 1.016/2.29 ≈ 0.44, far below
    // the true 0.85 floor; decoupled mins pair best wall with best probe
    val t = Bench.normalizedMin(Seq(1.016, 0.852), Seq(85.0, 38.0), 37.1)
    assert(t.exists(v => math.abs(v - 0.852 * 37.1 / 38.0) < 1e-9))
    // sustained: every probe inflated 1.24× (the r18 window) → the min
    // probe still carries the correction
    val s = Bench.normalizedMin(Seq(2.48, 2.52), Seq(46.0, 46.5), 37.1)
    assert(s.exists(v => math.abs(v - 2.48 * 37.1 / 46.0) < 1e-9))
    assert(Bench.normalizedMin(Nil, Nil, 37.1).isEmpty)
  }

  test("eraRef: same-era floors only, normalized entries preferred, None when era is silent") {
    val hist = Seq(
      // same era (within 5% of runFloor 100): raw 2.0, no norm
      (103.0, Map("q" -> 2.0), Map.empty[String, Double]),
      // same era: raw 3.0 but norm 1.5 — the norm value must win
      (98.0, Map("q" -> 3.0), Map("q" -> 1.5)),
      // different era (fast host): its misleading 0.5 must NOT leak in
      (80.0, Map("q" -> 0.5), Map("q" -> 0.5)))
    assert(Bench.eraRef("q", 100.0, hist) === Some(1.5))
    // unknown query in the era → None (caller falls back to the global gate)
    assert(Bench.eraRef("other", 100.0, hist) === None)
    // no era match at all → None
    assert(Bench.eraRef("q", 200.0, hist) === None)
    // NaN floors never match
    assert(Bench.eraRef("q", Double.NaN, hist) === None)
    assert(Bench.eraRef("q", 100.0,
      Seq((Double.NaN, Map("q" -> 1.0), Map.empty[String, Double]))) === None)
  }

  test("compact line with the round-20 extra fields still fits the scrape window") {
    val names = (1 to 132).map(i => f"q${i}%02d_some_long_query_name_$i")
    val extras =
      s""","probe_floor_ms":123.4,"probe_par_floor_ms":45.6""" +
        s""","host_speed_x":1.234,"host_parallel_x":1.567,"hist_anomalies_n":12,"repass_n":12""" +
        s""","common_n":241,"total_common_prev":208.123,"prev_total_common":203.456""" +
        s""","total_common_prev_norm":195.123,"prev_total_common_norm":196.456""" +
        s""","reps_1":0,"reps_2":230,"excluded_n":1,"lane_n":1"""
    val line = Bench.compactSummary(113.2345, 99999.9999, 132,
      names, names, 3, contended = true, sf = "/root/testdata/sf0.1",
      detail = "/root/repo/BENCH.json", filterFields = extras,
      totalNorm = 199.123)
    assert(line.length < 1500, s"compact line is ${line.length} chars")
    // the decision headline leads the line (VERDICT r19 #2)
    assert(line.startsWith("""{"metric":"total","value_normalized":199.123,"""))
  }

  test("contrast-only exclusion names real registry queries") {
    // a typo'd ContrastOnly entry would silently exclude NOTHING while the
    // artifact claims it did
    Bench.ContrastOnly.foreach(n =>
      assert(SparkEntry.queries.contains(n), s"ContrastOnly '$n' not in registry"))
  }
}
