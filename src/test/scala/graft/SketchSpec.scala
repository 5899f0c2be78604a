package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.operators.{Merges, Sketches}

/** Sketch operators (Sketches.scala) + incremental aggregate state
  * (Merges.aggState/mergeAggStates): algorithmic correctness against plain
  * Scala references, the mergeability laws that make them scale, and the
  * estimator guarantees the query outputs rely on.
  */
class SketchSpec extends SparkSpec with TableDrivenPropertyChecks {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- HLL ----

  /** Plain-Scala ρ reference: leading zeros of the low 60 hash bits, read
    * from bit 59 downward, + 1 — via the JDK clz the Column expression must
    * reproduce with smear/popcount arithmetic.
    */
  private def refReg(h: Long): Int = {
    val hm = h & ((1L << 60) - 1)
    val rho = if (hm == 0L) 61 else java.lang.Long.numberOfLeadingZeros(hm) - 3
    math.min(rho, Sketches.HllRegCap)
  }

  test("hll: smear/popcount register matches the JDK clz reference on edge and random hashes") {
    val rnd = new scala.util.Random(7)
    val hashes = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue,
      1L << 59, (1L << 60) - 1, 1L << 60, 15L << 60) ++
      Seq.fill(500)(rnd.nextLong())
    val got = hashes.toDF("h")
      .select(col("h"), Sketches.hllReg(col("h")).as("reg"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    hashes.foreach { h =>
      assert(got(h) === refReg(h), s"hash $h: reg ${got(h)} != ref ${refReg(h)}")
    }
  }

  test("hll: registers merge — sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly") {
    val keys = (1L to 400L).map(i => ("g", i))
    val all = keys.toDF("grp", "k")
    val (ha, hb) = (keys.take(173), keys.drop(173))
    val merged = Sketches.hllMergeRegisters(
      Sketches.hllRegisters(ha.toDF("grp", "k"), Seq("grp"), col("k")),
      Sketches.hllRegisters(hb.toDF("grp", "k"), Seq("grp"), col("k")),
      Seq("grp"))
    val direct = Sketches.hllRegisters(all, Seq("grp"), col("k"))
    assert(direct.except(merged).isEmpty && merged.except(direct).isEmpty)
    // and the estimates built from them are identical rows
    val eA = Sketches.hllEstimate(direct, Seq("grp")).collect().toSeq
    val eB = Sketches.hllEstimate(merged, Seq("grp")).collect().toSeq
    assert(eA === eB)
  }

  test("hll: raw-branch estimate within 3 standard errors on a 400-key group") {
    val regs = Sketches.hllRegisters(
      (1L to 400L).map(i => ("g", i)).toDF("grp", "k"), Seq("grp"), col("k"))
    val est = Sketches.hllEstimate(regs, Seq("grp"))
      .select("est").as[Double].head()
    // σ = 1.04/√16 = 26%; 3σ = 78%
    assert(est > 400 * 0.22 && est < 400 * 1.78, s"est $est vs n=400")
    assert(est > 2.5 * Sketches.HllM, "400 keys must take the raw branch")
  }

  test("hll: linear-counting branch engages on a small group and is near-exact") {
    val regs = Sketches.hllRegisters(
      (1L to 10L).map(i => ("g", i)).toDF("grp", "k"), Seq("grp"), col("k"))
    val row = Sketches.hllEstimate(regs, Seq("grp"))
      .select("zeros", "est").head()
    val (zeros, est) = (row.getInt(0), row.getDouble(1))
    assert(zeros > 0, "10 keys into 16 buckets must leave zero registers")
    // LC: m·ln(m/zeros) — reproduce and compare bit-identically
    val expected = 16.0 * StrictMath.log(16.0 / zeros)
    assert(est === expected, s"LC est $est != m·ln(m/zeros) $expected")
  }

  // ------------------------------------------------------- Count-Min ----

  test("cms: estimate >= exact count for EVERY token, and equals it absent collisions") {
    val docs = Seq("a a a b c", "a b d e", "c c f").toDF("text")
      .select(monotonically_increasing_id().as("doc_id"), col("text"))
    val rows = Sketches.cmsHeavyHitters(docs, "text", 100).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"token ${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // 8 distinct tokens into 3×64 cells: overwhelmingly collision-free, and
    // the top token's exact count must be correct regardless
    val top = rows.head
    assert(top.getString(0) === "a" && top.getLong(1) === 4L)
  }

  test("cms: counter grids merge additively — cells(A ∪ B) == cells(A) + cells(B)") {
    val mk = (texts: Seq[String]) => {
      val docs = texts.toDF("text")
      docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .select(col("tok"), col("n"),
          explode(sequence(lit(0), lit(Sketches.CmsDepth - 1))).as("r"))
        .withColumn("bucket", Sketches.cmsBucket(Sketches.cmsHash(col("r"), col("tok"))))
        .groupBy("r", "bucket").agg(sum("n").as("cell"))
    }
    val (ta, tb) = (Seq("x y z x", "p q"), Seq("x q q", "z z r"))
    val summed = mk(ta).unionByName(mk(tb))
      .groupBy("r", "bucket").agg(sum("cell").as("cell"))
    val direct = mk(ta ++ tb)
    assert(direct.except(summed).isEmpty && summed.except(direct).isEmpty)
  }

  test("cms: per-instance routing grid == the grid from pre-aggregated counts") {
    // the streaming maintenance path (e25) counts instances; the batch path
    // (q44) routes exact counts — same cells by construction, verified here
    val rnd = new scala.util.Random(11)
    val keys = Seq.fill(300)(rnd.nextInt(40).toLong).toDF("user_id")
    val fromInstances = Sketches.cmsInstances(keys, col("user_id"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cell"))
    val fromCounts = keys.groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"),
        explode(sequence(lit(0), lit(Sketches.CmsDepth - 1))).as("r"))
      .withColumn("bucket", Sketches.cmsBucket(Sketches.cmsHash(col("r"), col("user_id"))))
      .groupBy("r", "bucket").agg(sum("n").as("cell"))
    assert(fromInstances.except(fromCounts).isEmpty &&
      fromCounts.except(fromInstances).isEmpty)
  }

  // ------------------------------------------------------- histogram ----

  private def refBin(v: Double): Int = {
    val b = math.floor((v - Sketches.HistLo) / Sketches.HistW)
    math.min(math.max(b, 0.0), Sketches.HistBins - 1.0).toInt
  }

  test("hist: clamped bin index matches the plain-Scala reference on edges and random values") {
    val rnd = new scala.util.Random(13)
    val vals = Seq(-5.0, 0.0, 7.999999, 8.0, 255.9, 504.0, 511.999, 512.0, 9999.0) ++
      Seq.fill(300)(rnd.nextDouble() * 600 - 20)
    val got = vals.toDF("v")
      .select(col("v"), Sketches.histBin(col("v")).as("bin"))
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    vals.foreach { v =>
      assert(got(v) === refBin(v), s"value $v: bin ${got(v)} != ref ${refBin(v)}")
    }
  }

  test("hist: domain extremes — ±0.0 and min subnormal land in bin 0, NaN/±Inf excluded (VERDICT r19 #7)") {
    // the q54/log-linear lesson ported to the clamped histogram: unguarded,
    // Spark's ANSI FLOOR/CAST path errors on NaN while DuckDB's
    // CAST(FLOOR('inf')) raises — the guard excludes non-finite rows in
    // BOTH engines (isfinite in the oracle SQL) instead
    val minSub = java.lang.Double.MIN_VALUE // 2^-1074
    val vals = Seq(0.0, -0.0, minSub, -minSub,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    val got = vals.toDF("v")
      .select(col("v"), Sketches.histBin(col("v")).as("bin"))
      .collect().map(r =>
        (r.getDouble(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    got.foreach {
      case (v, bin) if v.isNaN || v.isInfinite =>
        assert(bin.isEmpty, s"non-finite $v must bin to NULL, got $bin")
      case (v, bin) =>
        assert(bin === Some(0), s"edge value $v must land in bin 0, got $bin")
    }
    // and the counts path drops the non-finite rows instead of grouping a
    // null bin
    val counts = Sketches.histCounts(
      vals.map(("g", _)).toDF("grp", "v"), Seq("grp"), col("v"))
      .agg(sum("cnt")).head().getLong(0)
    assert(counts === 4L, "NaN/±Inf must be excluded from the sketch")
  }

  test("hist: counters merge additively and the merged quantiles are bit-identical") {
    val rnd = new scala.util.Random(17)
    val vals = Seq.fill(500)(("g", rnd.nextDouble() * 520))
    val all = vals.toDF("grp", "v")
    val (va, vb) = vals.splitAt(211)
    val merged = Sketches.histMergeCounts(
      Sketches.histCounts(va.toDF("grp", "v"), Seq("grp"), col("v")),
      Sketches.histCounts(vb.toDF("grp", "v"), Seq("grp"), col("v")),
      Seq("grp"))
    val direct = Sketches.histCounts(all, Seq("grp"), col("v"))
    assert(direct.except(merged).isEmpty && merged.except(direct).isEmpty)
    val qs = Seq(0.5, 0.9, 0.99)
    val eA = Sketches.histQuantiles(direct, Seq("grp"), qs).orderBy("q").collect().toSeq
    val eB = Sketches.histQuantiles(merged, Seq("grp"), qs).orderBy("q").collect().toSeq
    assert(eA === eB)
  }

  test("hist: estimate lands in the same bin as the true quantile — error < one bin width") {
    val rnd = new scala.util.Random(19)
    val vals = Seq.fill(1000)(rnd.nextDouble() * 500)
    val counts = Sketches.histCounts(
      vals.map(("g", _)).toDF("grp", "v"), Seq("grp"), col("v"))
    val sorted = vals.sorted
    Sketches.histQuantiles(counts, Seq("grp"), Seq(0.5, 0.9, 0.99))
      .select("q", "est").as[(Double, Double)].collect().foreach { case (q, est) =>
        // the ⌈q·n⌉-th smallest value shares the estimate's bin: cum_{b-1} <
        // q·n ≤ cum_b bounds its rank into bin b, so both lie within HistW
        val trueQ = sorted(math.ceil(q * vals.size).toInt - 1)
        assert(math.abs(est - trueQ) < Sketches.HistW,
          s"q=$q: est $est vs true $trueQ drifts beyond one bin width")
      }
  }

  // ------------------------------------------------- log-linear sketch ----

  /** Plain-Scala replica of [[Sketches.logLinCode]]: exact octave (the k
    * with 2^(k-1) < |v| ≤ 2^k, from math.getExponent adjusted at exact
    * powers of two) and the same exact sub-bucket arithmetic.
    */
  private def refLogLinCode(v: Double): Long = {
    if (v == 0.0) 0L
    else {
      val a = math.abs(v)
      // getExponent(a) = floor(log2(a)); the octave contract is
      // 2^(k-1) < a <= 2^k, so exact powers of two belong to THEIR OWN k
      // while everything else rounds up. getExponent returns -1023 for
      // every subnormal, so recover the true exponent from the unbiased
      // bit position before the clamp.
      val e =
        if (a >= java.lang.Double.MIN_NORMAL) math.getExponent(a)
        else -1075 + (64 - java.lang.Long.numberOfLeadingZeros(
          java.lang.Double.doubleToLongBits(a)))
      val k = math.max(if (a == math.pow(2.0, e)) e else e + 1, -1073)
      val lo = math.pow(2.0, k - 1)
      val sub = math.min(15L, math.floor((a - lo) * 16.0 / lo).toLong)
      val mag = (k + 1100L) * 16L + sub
      if (v > 0) mag else -mag
    }
  }

  test("loglin: code matches the exponent-based reference on edges and random values") {
    val rnd = new scala.util.Random(23)
    val vals = Seq(0.0, 1.0, -1.0, 2.0, 4.0, 0.5, 0.25, 1e-300, 1e300,
      3.9999999, 4.0000001, -511.9, 0.01, 490.02) ++
      Seq.fill(500)(math.exp(rnd.nextDouble() * 40 - 20) *
        (if (rnd.nextBoolean()) 1 else -1))
    val got = vals.toDF("v")
      .select(col("v"), Sketches.logLinCode(col("v")).as("code"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      assert(got(v) === refLogLinCode(v),
        s"value $v: code ${got(v)} != ref ${refLogLinCode(v)}")
    }
  }

  test("loglin: domain extremes — subnormals clamp, NaN/±Inf excluded (ADVICE r18)") {
    // the exact failure inputs from the advice: |v| = 2^-1074 used to
    // underflow lo to 0 (division by zero → DuckDB CAST(FLOOR(inf)) error)
    // and NaN took the v<0 branch to a garbage negative code
    val minSub = java.lang.Double.MIN_VALUE // 2^-1074
    val vals = Seq(minSub, -minSub, math.pow(2.0, -1073), 3e-308,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    val got = vals.toDF("v")
      .select(col("v"), Sketches.logLinCode(col("v")).as("code"))
      .collect().map(r =>
        (r.getDouble(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    got.foreach {
      case (v, code) if v.isNaN || v.isInfinite =>
        assert(code.isEmpty, s"non-finite $v must code to NULL, got $code")
      case (v, code) =>
        assert(code === Some(refLogLinCode(v)),
          s"subnormal $v: code $code != ref ${refLogLinCode(v)}")
        // code order = value order must survive the clamp
        assert(code.get.signum === math.signum(v).toInt)
    }
    // ...and the counts path drops the non-finite rows instead of grouping
    // a null code
    val counts = Sketches.logLinCounts(
      vals.map(("g", _)).toDF("grp", "v"), Seq("grp"), col("v"))
      .agg(sum("cnt")).head().getLong(0)
    assert(counts === 4L, "NaN/±Inf must be excluded from the sketch")
  }

  test("loglin: native LogLinCode == the definitional Column form on every input class") {
    val rnd = new scala.util.Random(43)
    val vals = Seq(0.0, -0.0, 1.0, -1.0, 2.0, 0.5, 1e-300, 1e300,
      java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE,
      math.pow(2.0, -1073), java.lang.Double.MIN_NORMAL,
      java.lang.Double.MAX_VALUE, -java.lang.Double.MAX_VALUE,
      3.9999999, 4.0000001, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity) ++
      Seq.fill(1000)(math.exp(rnd.nextDouble() * 80 - 40) *
        (if (rnd.nextBoolean()) 1 else -1))
    val both = vals.toDF("v").select(
        Sketches.logLinCode(col("v")).as("column_form"),
        graft.functions.NativeFunctions.logLinCode(spark, col("v")).as("native"))
      .collect()
    both.zip(vals).foreach { case (r, v) =>
      val c = if (r.isNullAt(0)) None else Some(r.getLong(0))
      val n = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(c === n, s"value $v: column form $c != native $n")
    }
  }

  test("loglin: counters merge additively and merged quantiles are bit-identical") {
    val rnd = new scala.util.Random(29)
    val vals = Seq.fill(600)(("g", math.exp(rnd.nextDouble() * 12 - 4)))
    val (va, vb) = vals.splitAt(253)
    val merged = Sketches.logLinMergeCounts(
      Sketches.logLinCounts(va.toDF("grp", "v"), Seq("grp"), col("v")),
      Sketches.logLinCounts(vb.toDF("grp", "v"), Seq("grp"), col("v")),
      Seq("grp"))
    val direct = Sketches.logLinCounts(vals.toDF("grp", "v"), Seq("grp"), col("v"))
    assert(direct.except(merged).isEmpty && merged.except(direct).isEmpty)
    val qs = Seq(0.5, 0.9, 0.99)
    val eA = Sketches.logLinQuantiles(direct, Seq("grp"), qs).orderBy("q").collect().toSeq
    val eB = Sketches.logLinQuantiles(merged, Seq("grp"), qs).orderBy("q").collect().toSeq
    assert(eA === eB)
  }

  // ------------------------------------------- rank-error quantile sketch ----

  test("rankq: merged state is bit-identical to from-scratch — any split, any order") {
    val rnd = new scala.util.Random(37)
    val rows = (1L to 3000L).map(id => ("g", id, rnd.nextGaussian() * 100))
    def st(part: Seq[(String, Long, Double)]) = Sketches.rankQStates(
      part.toDF("grp", "id", "v"), Seq("grp"), col("id"), col("v"))
    // three different splits of the same multiset, one of them reversed —
    // the state must be a function of the multiset alone
    val direct = st(rows)
    val splits = Seq(rows.splitAt(700), rows.splitAt(2500),
      rows.reverse.splitAt(1300))
    val ref = direct.select("st").head()
    splits.foreach { case (a, b) =>
      val merged = Sketches.rankQMergeStates(st(a), st(b), Seq("grp"))
      val eA = Sketches.rankQQuantiles(direct, Seq("grp"), Seq(0.5, 0.9, 0.99))
        .orderBy("q").collect().toSeq
      val eB = Sketches.rankQQuantiles(merged, Seq("grp"), Seq(0.5, 0.9, 0.99))
        .orderBy("q").collect().toSeq
      assert(eA === eB, "merged quantiles must equal from-scratch")
    }
    // and the aggregator itself is order-independent: the reversed input's
    // own state equals the forward one's
    assert(st(rows.reverse).select("st").head() === ref)
  }

  test("rankq: merging a group absent from one side takes the other's state intact") {
    // the oracle never exercises the full-outer coalesce path (it builds
    // from scratch) — pin it here: a group present in only one half must
    // come through the merge with its state (hist + items) untouched
    val a = Sketches.rankQStates(
      (1L to 400L).map(i => ("only_a", i, i.toDouble)).toDF("grp", "id", "v"),
      Seq("grp"), col("id"), col("v"))
    val b = Sketches.rankQStates(
      (1L to 300L).map(i => ("only_b", i, -i.toDouble)).toDF("grp", "id", "v"),
      Seq("grp"), col("id"), col("v"))
    val merged = Sketches.rankQMergeStates(a, b, Seq("grp"))
    val est = Sketches.rankQQuantiles(merged, Seq("grp"), Seq(0.5))
      .select("grp", "n", "est").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = Sketches.rankQQuantiles(
      Sketches.rankQMergeStates(a, a.limit(0), Seq("grp")), Seq("grp"), Seq(0.5))
      .select("grp", "n", "est").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(est("only_a") === direct("only_a"),
      "a one-sided group must survive the merge bit-identically")
    assert(est("only_b")._1 === 300L)
    assert(est.keySet === Set("only_a", "only_b"))
  }

  test("rankq: hash-space level edges match the JDK clz reference; value extremes flow exactly (VERDICT r19 #7)") {
    // rankQLevel consumes HASHES (xxhash64 output), never data values, so
    // the NaN/±Inf value extremes cannot reach its arithmetic — no domain
    // guard is needed there; the edges that matter are the hash-space
    // ones (zero, sign bit, all-ones, boundary powers)
    val hs = Seq(0L, 1L, -1L, 2L, 3L, Long.MaxValue, Long.MinValue,
      Long.MinValue + 1L, 1L << 62, (1L << 62) - 1L)
    def ref(h: Long): Int =
      java.lang.Long.numberOfLeadingZeros(h & Long.MaxValue) - 1
    val lvls = hs.toDF("h")
      .select(col("h"), Sketches.rankQLevel(col("h")).as("lvl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    hs.foreach { h =>
      assert(lvls(h) === ref(h), s"hash $h: level ${lvls(h)} != ref ${ref(h)}")
      // every level must index the 64-slot histogram
      assert(lvls(h) >= 0 && lvls(h) <= 63, s"hash $h: level out of range")
    }
    // VALUE extremes ride through the sketch untouched: with n ≤ k the
    // sample is the whole group and estimates are exact order statistics,
    // including signed zero, subnormals and infinities (comparison order
    // on doubles agrees between Spark and DuckDB for all of them; NaN is
    // excluded from this pin because the two engines agree it sorts last,
    // making any estimate it appears in distribution-meaningless, not
    // wrong)
    val minSub = java.lang.Double.MIN_VALUE
    val edgeVals = Seq(Double.NegativeInfinity, -2.5, -minSub, 0.0,
      minSub, 1.5, Double.PositiveInfinity)
    val rows = edgeVals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
    val est = Sketches.rankQQuantiles(
      Sketches.rankQStates(rows.toDF("grp", "id", "v"), Seq("grp"),
        col("id"), col("v")),
      Seq("grp"), Seq(0.01, 0.5, 1.0))
      .select("q", "est").as[(Double, Double)].collect().toMap
    // rank max(1, ceil(q*7)): 0.01 → 1st, 0.5 → 4th, 1.0 → 7th
    assert(est(0.01) === Double.NegativeInfinity)
    assert(est(0.5) === 0.0)
    assert(est(1.0) === Double.PositiveInfinity)
  }

  test("rankq: bounded rank error on a clustered distribution; exact when n ≤ k") {
    val rnd = new scala.util.Random(41)
    // the distribution the log-linear sketch CANNOT rank: 95% of mass in
    // one tiny value cluster, 5% spread over 6 decades — relative-value
    // buckets collapse the cluster into one bin
    val clustered = Seq.fill(9500)(1000.0 + rnd.nextGaussian() * 0.001) ++
      Seq.fill(500)(math.exp(rnd.nextDouble() * 13.8))
    val rows = clustered.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
    val states = Sketches.rankQStates(
      rows.toDF("grp", "id", "v"), Seq("grp"), col("id"), col("v"))
    val sorted = clustered.sorted
    val n = sorted.size
    Sketches.rankQQuantiles(states, Seq("grp"), Seq(0.1, 0.5, 0.9, 0.99))
      .select("q", "est", "n", "m").as[(Double, Double, Long, Long)]
      .collect().foreach { case (q, est, nOut, m) =>
        assert(nOut === n.toLong, "n must be the exact total")
        assert(m <= Sketches.RankQK, "sample must respect the budget")
        // true rank of the estimate vs target rank: within 4·n/√k
        // (k=256 → √k=16; bound 0.25·n — loose; seeded draw lands ≪ it)
        val rank = sorted.count(_ <= est)
        assert(math.abs(rank - q * n) <= 4.0 * n / 16.0,
          s"q=$q: est $est has rank $rank vs target ${q * n}")
      }
    // n ≤ k ⇒ the sample is the whole group and estimates are EXACT
    // order statistics
    val small = (1 to 100).map(i => ("g", i.toLong, i.toDouble))
    val exact = Sketches.rankQQuantiles(
      Sketches.rankQStates(small.toDF("grp", "id", "v"), Seq("grp"),
        col("id"), col("v")),
      Seq("grp"), Seq(0.5, 0.9)).select("q", "est")
      .as[(Double, Double)].collect().toMap
    assert(exact === Map(0.5 -> 50.0, 0.9 -> 90.0))
  }

  test("loglin: relative error ≤ one sub-bucket (1/16) at every magnitude, negatives included") {
    val rnd = new scala.util.Random(31)
    // four decades of magnitude in one group, plus a negative tail — the
    // regime the fixed-range histogram cannot sketch at all
    val vals = Seq.fill(2000)(math.exp(rnd.nextDouble() * 9.2)) ++ // 1..1e4
      Seq.fill(200)(-math.exp(rnd.nextDouble() * 4.6))             // -1..-100
    val counts = Sketches.logLinCounts(
      vals.map(("g", _)).toDF("grp", "v"), Seq("grp"), col("v"))
    val sorted = vals.sorted
    Sketches.logLinQuantiles(counts, Seq("grp"), Seq(0.1, 0.5, 0.9, 0.99))
      .select("q", "est").as[(Double, Double)].collect().foreach { case (q, est) =>
        // the ⌈q·n⌉-th smallest value shares the estimate's bucket, whose
        // width is its own lo/16 — a RELATIVE bound: |est − true| ≤
        // max(|est|, |true|) / 16
        val trueQ = sorted(math.ceil(q * vals.size).toInt - 1)
        val bound = math.max(math.abs(est), math.abs(trueQ)) / 16.0
        assert(math.abs(est - trueQ) <= bound,
          s"q=$q: est $est vs true $trueQ beyond one sub-bucket ($bound)")
      }
  }

  // ------------------------------------------------------ profiler ----

  test("profiler: counts, nulls, string-image min/max and estimate branches behave") {
    import graft.operators.QualityChecks
    val df = Seq(
      (Some("a"), 1L), (Some("b"), 2L), (None, 3L), (Some("a"), 4L),
      (Some("c"), 5L), (None, 6L)
    ).toDF("s", "k")
    val prof = QualityChecks.profileColumns(df, Seq(
        "s" -> col("s"), "k" -> col("k")))
      .orderBy("col").collect()
    val byCol = prof.map(r => r.getString(0) -> r).toMap
    val s = byCol("s")
    assert(s.getLong(1) === 6L && s.getLong(2) === 2L && s.getLong(3) === 3L)
    assert(s.getString(5) === "a" && s.getString(6) === "c")
    val k = byCol("k")
    assert(k.getLong(1) === 6L && k.getLong(2) === 0L && k.getLong(3) === 6L)
    // string-image ordering: "1" < "6" lexicographically over these digits
    assert(k.getString(5) === "1" && k.getString(6) === "6")
    // LC branch near-exactness at tiny cardinality: estimate within 3σ
    prof.foreach { r =>
      val (exact, est) = (r.getLong(3).toDouble, r.getDouble(4))
      assert(math.abs(est - exact) <= 3 * 0.26 * math.max(exact, 1.0) + 1.0,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  // ------------------------------------------------------------- KMV ----

  test("kmv: sketch of the whole == sketch-algebra union of the halves") {
    val k = 8
    val df = (1L to 300L).map(i => ("g", i)).toDF("grp", "key")
    val whole = Sketches.kmvSketches(df, "grp", col("key"), k)
      .select("sk").as[Seq[Long]].head()
    val halves = Seq(df.filter(col("key") <= 150), df.filter(col("key") > 150))
      .map(Sketches.kmvSketches(_, "grp", col("key"), k)
        .select("sk").as[Seq[Long]].head())
    val unioned = spark.range(1)
      .select(Sketches.kmvUnion(typedLit(halves(0)), typedLit(halves(1)), k).as("u"))
      .select("u").as[Seq[Long]].head()
    assert(unioned === whole)
  }

  test("kmv: duplicates in the input do not change the sketch (distinct semantics)") {
    val base = (1L to 100L).map(i => ("g", i))
    val dup = base ++ base ++ base.take(40)
    val a = Sketches.kmvSketches(base.toDF("grp", "key"), "grp", col("key"), 16)
      .select("sk").as[Seq[Long]].head()
    val b = Sketches.kmvSketches(dup.toDF("grp", "key"), "grp", col("key"), 16)
      .select("sk").as[Seq[Long]].head()
    assert(a === b)
  }

  test("kmv: under-filled sketch estimates exactly; filled sketch within 3σ") {
    val k = Sketches.KmvK
    val small = Sketches.kmvSketches(
      (1L to 20L).map(i => ("g", i)).toDF("grp", "key"), "grp", col("key"), k)
    val eSmall = small.select(Sketches.kmvEstimate(col("sk"), k)).as[Double].head()
    assert(eSmall === 20.0, "sketch below k IS the key set — estimate must be exact")
    val big = Sketches.kmvSketches(
      (1L to 2000L).map(i => ("g", i)).toDF("grp", "key"), "grp", col("key"), k)
    val eBig = big.select(Sketches.kmvEstimate(col("sk"), k)).as[Double].head()
    // σ ≈ n/√(k-2) ≈ 365 at n=2000; 3σ band
    assert(eBig > 2000 - 3 * 365 && eBig < 2000 + 3 * 365, s"est $eBig vs n=2000")
  }

  // -------------------------------------------------- weighted sample ----

  test("wrs: sample is invariant under weight scaling (the E-S key property)") {
    val docs = (1L to 200L).map(i => (i, (i % 37 + 1).toDouble)).toDF("id", "w")
    val pick = (weights: org.apache.spark.sql.Column) =>
      graft.operators.CorpusOps.weightedSample(docs, "id", weights, 25)
        .select("id").as[Long].collect().toSet
    assert(pick(col("w")) === pick(col("w") * 7.0),
      "keys ln(u)/w scale by 1/c under w → c·w: the ORDER cannot change")
  }

  test("wrs: keys match a plain-Scala replica of the float tree, and the cut is the top-k") {
    val docs = (1L to 300L).map(i => (i, (i % 37 + 1).toDouble)).toDF("id", "w")
    val hashes = docs.select(col("id"), xxhash64(col("id")).as("h"), col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val twoP64 = 1.8446744073709552e19
    val refKeys = hashes.map { case (id, h, w) =>
      val u = (h.toDouble + (if (h < 0) twoP64 else 0.0) + 0.5) / twoP64
      // StrictMath, not math.log: Spark's Log expression is StrictMath-based
      // and the intrinsic differs by 1 ulp on some inputs
      id -> StrictMath.log(u) / w
    }.toMap
    val got = graft.operators.CorpusOps.weightedSample(docs, "id", col("w"), 40)
      .select("id", "key").as[(Long, Double)].collect()
    got.foreach { case (id, key) =>
      assert(key === refKeys(id), s"id $id: key $key != replica ${refKeys(id)}")
    }
    val expectedTop = refKeys.toSeq.sortBy { case (id, k) => (-k, id) }
      .take(40).map(_._1).toSet
    assert(got.map(_._1).toSet === expectedTop)
  }

  test("wrs: non-positive weights are excluded, never sampled") {
    val docs = Seq((1L, 5.0), (2L, 0.0), (3L, -2.0), (4L, 1.0)).toDF("id", "w")
    val ids = graft.operators.CorpusOps.weightedSample(docs, "id", col("w"), 10)
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 4L))
  }

  // ------------------------------------------- incremental agg state ----

  test("ivm: state(base) ⊕ state(delta) == state(all) exactly, for several split points") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("om", date_trunc("month", col("o_orderdate")))
    val keys = Seq("om", "o_orderstatus")
    val full = Merges.aggState(orders, keys, "o_totalprice")
      .orderBy("om", "o_orderstatus").collect().toSeq
    forAll(Table("cut", "1996-06-15", "1999-01-01", "2001-07-31")) { cut =>
      val c = lit(cut).cast("timestamp")
      val merged = Merges.mergeAggStates(
        Merges.aggState(orders.filter(col("o_orderdate") < c), keys, "o_totalprice"),
        Merges.aggState(orders.filter(col("o_orderdate") >= c), keys, "o_totalprice"),
        keys)
      // cast both sides to the merged (29,2) decimal for row comparison
      val m = merged.select(col("om"), col("o_orderstatus"), col("cnt"),
        col("tot").cast("decimal(29,2)").as("tot"))
        .orderBy("om", "o_orderstatus").collect().toSeq
      val f = full.map(r => (r.get(0), r.get(1), r.get(2),
        r.getDecimal(3).setScale(2)))
      val got = m.map(r => (r.get(0), r.get(1), r.get(2),
        r.getDecimal(3).setScale(2)))
      assert(got === f, s"split at $cut diverges from the from-scratch state")
    }
  }

  test("ivm join: standing ∪ delta == from-scratch join, duplicate-free, at several splits") {
    val a = (1L to 40L).map(k => (k % 7, k)).toDF("k", "av")
    val b = (1L to 20L).map(k => (k % 7, k * 100)).toDF("k", "bv")
    val full = a.join(b, Seq("k")).orderBy("k", "av", "bv").collect().toSeq
    forAll(Table("splitA", 0L, 13L, 40L)) { sa =>
      val (baseA, deltaA) = (a.filter(col("av") <= sa), a.filter(col("av") > sa))
      val (baseB, deltaB) = (b.filter(col("bv") <= 700L), b.filter(col("bv") > 700L))
      val got = baseA.join(baseB, Seq("k"))
        .unionByName(Merges.incrementalJoinDelta(baseA, deltaA, baseB, deltaB, Seq("k")))
      // duplicate-free by the disjoint delta algebra — no dedup pass needed
      assert(got.count() === got.distinct().count())
      assert(got.orderBy("k", "av", "bv").collect().toSeq === full,
        s"split at av=$sa diverges from the from-scratch join")
    }
  }

  test("ivm: a delta whose keys are all new appends without disturbing standing state") {
    val a = Seq(("k1", 10.0), ("k2", 20.0)).toDF("k", "v")
    val b = Seq(("k3", 5.0)).toDF("k", "v")
    val merged = Merges.mergeAggStates(
      Merges.aggState(a, Seq("k"), "v"),
      Merges.aggState(b, Seq("k"), "v"), Seq("k"))
      .orderBy("k")
      .select(col("k"), col("cnt"), col("tot").cast("double"))
      .as[(String, Long, Double)].collect().toSeq
    assert(merged === Seq(("k1", 1L, 10.0), ("k2", 1L, 20.0), ("k3", 1L, 5.0)))
  }
}
