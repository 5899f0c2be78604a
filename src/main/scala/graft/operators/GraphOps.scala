package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph propagation operators over pair tables (the dedup family's edge
  * lists double as document graphs). The LLM-pipeline use is quality/spam
  * propagation over a link or similarity graph — Common Crawl curation ranks
  * hosts by centrality before sampling — so the operator takes any
  * `(id_a, id_b)` pair frame (e.g. [[Dedup.ngramJaccardPairs]]) as the graph.
  *
  * Scale shape: one shuffle per iteration on the destination id (the same
  * key every iteration, so a pre-partitioned edge table reuses its exchange),
  * edge table persisted once and read `iters` times; no driver-side loop
  * over data — the driver only composes a fixed-depth lazy plan.
  *
  * Bit-reproducibility without hub buffering: double addition is
  * order-dependent — PageRank's one nondeterminism trap on a cluster — but
  * pinning the order by collecting each destination's messages into one
  * sorted array (the t15 pattern) buffers a hub's ENTIRE in-neighborhood in
  * a single aggregation group (a degree-10⁷ hub is a 10⁷-struct array —
  * OOM at exactly the skewed graphs similarity graphs are). Instead each
  * double message m ∈ [0, 1] is quantized once to the fixed-point integer
  * `floor(m · 10¹⁸)` (the multiply and floor are single deterministic IEEE
  * ops; the result is ≤ 10¹⁸ so the long is exact) and the integers are
  * summed as DECIMAL(38,0) — exact integer addition is order-independent,
  * so map-side partial aggregation works, per-group state is one 16-byte
  * decimal regardless of degree, and the result is still bit-identical on
  * any partitioning. One decimal→double conversion (correctly rounded in
  * every engine) at the read edge keeps ~12 significant digits at rank
  * scale 1/N — quantization noise 10⁻¹⁸ per message, far below double
  * roundoff of any alternative summation order.
  */
object GraphOps {

  /** Quantized exact sum of a non-negative double message column bounded by
    * 1.0: Σ floor(m·10¹⁸) as DECIMAL(38,0), read back as a double, giving an
    * order-independent (hence partitioning-independent) bit-reproducible
    * sum with O(1) per-group state. `floor` on a non-negative double ≤ 10¹⁸
    * yields an exact long in Spark and an exact integral double in DuckDB —
    * the oracle mirrors the same tree with HUGEINT as the exact adder.
    */
  private[graft] def quantizedSum(msg: Column): Column =
    sum(floor(msg * lit(1e18)).cast(DecimalType(38, 0)))
      .cast("double") / lit(1e18)

  /** Fixed-iteration PageRank over an UNDIRECTED pair graph: each pair
    * contributes both directions; nodes are the pair-member ids (every node
    * has degree ≥ 1, so there are no dangling-mass corrections to make).
    * Returns one row per node: (id, degree, pagerank) after `iters` rounds
    * of r ← (1−d)/N + d·Σ_{s→id} r_s/deg_s from the uniform 1/N start.
    *
    * Fixed `iters` (not convergence-tested) keeps the plan static and the
    * result engine-checkable; production curation runs use a fixed round
    * budget for the same reproducibility reason.
    */
  def pageRank(pairs: DataFrame, iters: Int = 3,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    // The symmetrized edge set is THE upstream cut: every consumer below —
    // degree, N, the uniform start, the final join, and all `iters`
    // propagation rounds — would otherwise re-evaluate the pair input
    // (often an expensive Jaccard self-join) once each. Persist it first
    // (guarded persist, swept by SessionSweep like every operator-internal
    // cache); everything else derives from the cached edges.
    val sym = Caching.persisted(pairs
      .select(col("id_a").as("s"), col("id_b").as("t"))
      .union(pairs.select(col("id_b").as("s"), col("id_a").as("t")))
      .distinct())
    val deg = sym.groupBy(col("s")).agg(count(lit(1)).as("d"))
    val edges = Caching.persisted(sym.join(deg, "s"))
    // N rides along as a broadcast 1-row frame so the whole operator stays
    // one lazy plan (no driver-side count action)
    val nDf = deg.agg(count(lit(1)).cast("double").as("n_nodes"))
    val teleport = lit(1.0 - damping)
    def step(ranks: DataFrame): DataFrame =
      edges
        .join(ranks.select(col("id").as("s"), col("pr"), col("n_nodes")), "s")
        .groupBy(col("t"), col("n_nodes"))
        .agg(quantizedSum(col("pr") / col("d")).as("msum"))
        .select(col("t").as("id"), col("n_nodes"),
          (teleport / col("n_nodes") + lit(damping) * col("msum")).as("pr"))
    val r0 = deg.select(col("s").as("id")).crossJoin(broadcast(nDf))
      .withColumn("pr", lit(1.0) / col("n_nodes"))
    val rFinal = Iterator.iterate(r0)(step).drop(iters).next()
    rFinal
      .join(deg.select(col("s").as("id"), col("d").as("degree")), "id")
      .select(col("id"), col("degree"), col("pr").as("pagerank"))
  }

  /** Weight-proportional PageRank over an UNDIRECTED weighted pair graph
    * (`weightCol` ∈ [0, 1] — e.g. the Jaccard of a near-dup pair frame):
    * r ← (1−d)/N + d·Σ_{s→id} r_s · w_{s,id}/strength_s, where strength_s
    * is s's total edge weight. The curation read: unweighted centrality
    * treats a 0.5-Jaccard link like a 0.95 one, so a node stitched into a
    * cluster by many weak coincidental links outranks a tight template
    * hub; weighting by similarity makes rank follow actual duplication
    * mass. Same scale shape as [[pageRank]] — one destination-keyed
    * shuffle per iteration, edges persisted once, N broadcast — and BOTH
    * double sums (per-source strength, per-destination rank messages ≤ 1
    * each since pr < 1 and w/strength ≤ 1) go through [[quantizedSum]],
    * so results stay bit-reproducible with O(1) aggregation state.
    * Returns (id, degree, strength, pagerank).
    */
  def weightedPageRank(pairs: DataFrame, weightCol: String, iters: Int = 3,
                       damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "weightedPageRank: iters must be >= 1")
    val sym = Caching.persisted(pairs
      .select(col("id_a").as("s"), col("id_b").as("t"),
        col(weightCol).cast("double").as("w"))
      .union(pairs.select(col("id_b").as("s"), col("id_a").as("t"),
        col(weightCol).cast("double").as("w")))
      .distinct())
    val strength = Caching.persisted(sym.groupBy(col("s")).agg(
      quantizedSum(col("w")).as("strength"), count(lit(1)).as("d")))
    val edges = Caching.persisted(sym.join(strength, "s"))
    val nDf = strength.agg(count(lit(1)).cast("double").as("n_nodes"))
    val teleport = lit(1.0 - damping)
    def step(ranks: DataFrame): DataFrame =
      edges
        .join(ranks.select(col("id").as("s"), col("pr"), col("n_nodes")), "s")
        .groupBy(col("t"), col("n_nodes"))
        .agg(quantizedSum(col("pr") * (col("w") / col("strength"))).as("msum"))
        .select(col("t").as("id"), col("n_nodes"),
          (teleport / col("n_nodes") + lit(damping) * col("msum")).as("pr"))
    val r0 = strength.select(col("s").as("id")).crossJoin(broadcast(nDf))
      .withColumn("pr", lit(1.0) / col("n_nodes"))
    val rFinal = Iterator.iterate(r0)(step).drop(iters).next()
    rFinal
      .join(strength.select(col("s").as("id"), col("d").as("degree"),
        col("strength")), "id")
      .select(col("id"), col("degree"), col("strength"), col("pr").as("pagerank"))
  }

  /** Per-node triangle counts and local clustering coefficient over an
    * UNDIRECTED pair graph — the similarity-graph density signals a curation
    * pipeline reads before survivor selection (a near-dup cluster that is
    * also a dense triangle neighborhood is template/boilerplate text; a
    * star is one canonical doc plus variants).
    *
    * Scale shape (Suri & Vassilvitskii, "Counting Triangles and the Curse
    * of the Last Reducer", WWW'11): every edge is ORIENTED from its lower
    * to its higher endpoint in (degree, id) order, wedges are generated
    * only at each edge's LOWER endpoint, and a wedge is closed by one hash
    * join back to the edge set. Orientation bounds every node's out-degree
    * by O(√m) regardless of its real degree — a hub of degree 10⁷ emits no
    * wedges at all unless its neighbors are also hubs — so wedge volume is
    * O(m^1.5) worst-case instead of Σ deg² (which the naive
    * neighbor-pairing blows up on exactly the skewed degree distributions
    * similarity graphs have). Three shuffles total: degree agg, the wedge
    * self-join on the oriented source, the closing join on the canonical
    * edge key; nothing is ever broadcast or collected.
    *
    * Each triangle is generated exactly once (at its orientation-minimal
    * vertex, with the other two in id order), then credited to all three
    * corners via one explode + count. Returns one row per node:
    * (id, degree, triangles, clustering) where clustering =
    * 2·triangles / (degree·(degree−1)) and 0.0 for degree-1 nodes.
    */
  def triangleStats(pairs: DataFrame): DataFrame = {
    // canonical undirected edge set (a < b, self-loops dropped): the wedge
    // closure probes it and degrees derive from it — persist (guarded) so
    // an expensive upstream pair plan (typically a Jaccard self-join) is
    // evaluated once
    val und = Caching.persisted(pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    // orient each edge toward the (degree, id)-larger endpoint; the flag is
    // computed once per edge so both endpoints' degrees join before the
    // wedge stage (two joins on the already-shuffled edge keys)
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
    val fwd = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("s"),
      when(fwd, col("b")).otherwise(col("a")).as("t"))
    // wedges at the oriented source (id-ordered far endpoints dedupe the
    // unordered pair); both self-join sides are the same plan, so the
    // exchange on s is built once and reused
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      .select(col("x.s").as("u"), col("x.t").as("v"), col("y.t").as("w"))
    // close the wedge against the canonical edge key — each match is one
    // triangle, generated exactly once
    val tris = wedges.join(und,
      least(col("v"), col("w")) === col("a") &&
        greatest(col("v"), col("w")) === col("b"))
    val perNode = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          lit(2.0) * col("triangles") / (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)))
  }

  /** Fixed-round k-core peel over an UNDIRECTED pair graph: repeatedly
    * remove nodes whose degree among the REMAINING nodes is < k, `rounds`
    * times, and return the survivors with their within-core degree. After
    * convergence (survivor set stops shrinking) the result IS the exact
    * k-core; a fixed round budget — the [[pageRank]] philosophy — keeps
    * the plan static, driver-loop-free and engine-checkable, and is also
    * what a production curation run does (coreness is a density screen:
    * boilerplate/template text forms high-core similarity subgraphs, while
    * organic near-dup pairs sit in low cores; a bounded peel that
    * under-removes slightly only errs toward keeping data).
    *
    * Scale shape: each round is two semi joins of the persisted canonical
    * edge set against the (monotonically SHRINKING) survivor set plus one
    * count aggregation — all keyed on node id, the same key every round,
    * so a pre-partitioned edge table reuses its exchange and AQE broadcasts
    * the survivor side as soon as the peel bites. Nothing is collected;
    * wedge-free (work is O(m) per round, never Σ deg²), so hubs cost
    * nothing beyond their edge rows.
    *
    * Returns one row per surviving node: (id, degree, core_degree) —
    * `degree` in the full graph, `core_degree` among survivors.
    */
  def kCore(pairs: DataFrame, k: Int, rounds: Int = 6): DataFrame = {
    val (und, fullDeg) = kCoreBase(pairs)
    kCoreOn(und, fullDeg, k, rounds)
  }

  /** Shared k-core base frames: the persisted canonical undirected edge set
    * and the full-graph degree table. Split out of [[kCore]] so that
    * [[kCoreProfile]] can materialize them ONCE before overlapping its
    * per-k sweeps (guarded persists dedupe by plan either way; the split
    * only controls WHEN the one real computation happens). */
  private def kCoreBase(pairs: DataFrame): (DataFrame, DataFrame) = {
    val und = Caching.persisted(pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val fullDeg = Caching.persisted(
      und.select(col("a").as("id")).union(und.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("degree")))
    (und, fullDeg)
  }

  private def kCoreOn(und: DataFrame, fullDeg: DataFrame,
                      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "kCore: k must be >= 1")
    require(rounds >= 1, "kCore: rounds must be >= 1")
    // Per-round lineage truncation — the one operator in the library that
    // materializes between rounds, and necessarily so: each round
    // references the previous survivor set TWICE (both endpoint semi
    // joins), and degree-after-restriction forces an aggregate + join-back
    // in ANY formulation (a window count would instead buffer a hub's full
    // edge partition — the g01 trap). A lazy recurrence therefore builds a
    // 2^rounds-node logical TREE (Catalyst plans share nothing): measured
    // at sf0.1, 4 rounds analyzed a ~44k-node tree for 75 s against a
    // 256-edge graph — pure analyzer cost, the caches were all hit.
    // `localCheckpoint` truncates each round to a LogicalRDD (plan size
    // linear in rounds; at the RDD layer references are shared by object
    // identity, so nothing recomputes), exactly how Pregel-class
    // iteration runs on Spark (GraphFrames' connected components does the
    // same). Cost: one small job per round over the PERSISTED edge set —
    // work O(m · rounds), survivor frames are node-id lists.
    def step(alive: DataFrame): DataFrame = {
      val keptEdges = und
        .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
      keptEdges.select(col("a").as("id")).union(keptEdges.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("id"))
        .localCheckpoint(true)
    }
    val alive0 = fullDeg.select(col("id"))
    val (aliveFinal, _) = peelToFixpoint(alive0, rounds, step)
    // within-core degree: one more edge restriction against the final set
    val coreEdges = und
      .join(aliveFinal.select(col("id").as("a")), Seq("a"), "left_semi")
      .join(aliveFinal.select(col("id").as("b")), Seq("b"), "left_semi")
    val coreDeg = coreEdges.select(col("a").as("id"))
      .union(coreEdges.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("core_degree"))
    aliveFinal
      .join(fullDeg, "id")
      .join(coreDeg, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("core_degree"), lit(0L)).as("core_degree"))
  }

  /** Run `step` up to `rounds` times, stopping early at the FIXPOINT
    * (optimization r20, guide §1.2 "remove unnecessary passes"): the peel
    * step is monotone-shrinking (its output only contains ids drawn from
    * edges both of whose endpoints are in its input, so
    * alive_{n+1} ⊆ alive_n), which makes equal COUNT ⇔ equal SET — and
    * once a round leaves the survivor set unchanged, every later round is
    * the identity function, so stopping there returns a bit-identical
    * frame while skipping the remaining rounds' jobs (g07's graph
    * converges after round 1 of 4; g10 paid kMax·rounds = 16 steps for
    * ~5 productive ones). The count runs over the round's own EAGER
    * `localCheckpoint` — already-materialized cached partitions, a
    * milliseconds job — never a recompute of the round. The fixed `rounds`
    * budget stays the semantic contract (the oracle unrolls it); the exit
    * is purely an algebraic no-op elision.
    */
  private def peelToFixpoint(alive0: DataFrame, rounds: Int,
                             step: DataFrame => DataFrame): (DataFrame, Long) = {
    var alive = alive0
    var prevN = -1L
    var r = 0
    while (r < rounds && prevN != 0L) {
      val next = step(alive)
      val n = next.count()
      if (n == prevN) return (next, n)
      alive = next
      prevN = n
      r += 1
    }
    (alive, prevN)
  }

  /** One-pass coreness DECOMPOSITION (g10, VERDICT r12 #4): per-node
    * coreness by an iterated min-degree peel — level k starts from level
    * k−1's survivor set (monotone shrinkage), runs `rounds` fixed peel
    * rounds at threshold k, and a node's coreness is the deepest level it
    * survives (0 = dropped in level 1). One decomposition yields the whole
    * (k, survivors, edges) curve at ANY k granularity — count nodes/edges
    * with coreness ≥ k — where [[kCoreProfile]] pays a full from-scratch
    * peel per sweep point; and the coreness COLUMN is what users actually
    * join on (block-cut thresholds, per-family density tiers).
    *
    * Fixed-round semantics, stated precisely: with `rounds` large enough
    * to reach each level's fixpoint (this graph family converges in 1–2),
    * level k's survivor set IS the true k-core and coreness is exact;
    * under-provisioned rounds only err toward KEEPING nodes (higher
    * coreness), the same conservative direction as [[kCore]]. Because
    * level k+1 resumes from level k's survivors, the cumulative rounds
    * spent by level k is k·rounds — the sequential schedule converges at
    * least as far as [[kCoreProfile]]'s per-k restart at equal `rounds`.
    *
    * Scale shape: [[kCore]]'s machinery verbatim — two shrinking
    * semi-joins + one count agg per round over the persisted canonical
    * edge set, per-round `localCheckpoint` lineage truncation (the
    * 2^rounds tree trap, g07 lesson), kMax·rounds bounded jobs total,
    * O(m) each, wedge-free. The level label union is kMax node-id lists.
    */
  def corenessDecomposition(pairs: DataFrame, kMax: Int,
                            rounds: Int = 6): DataFrame = {
    require(kMax >= 1, "corenessDecomposition: kMax must be >= 1")
    require(rounds >= 1, "corenessDecomposition: rounds must be >= 1")
    val und = Caching.persisted(pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val allNodes = Caching.persisted(
      und.select(col("a").as("id")).union(und.select(col("b").as("id")))
        .distinct())
    def step(alive: DataFrame, k: Int): DataFrame = {
      val keptEdges = und
        .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
      keptEdges.select(col("a").as("id")).union(keptEdges.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("id"))
        .localCheckpoint(true)
    }
    // Per-level fixpoint exit (guide §1.2, see [[peelToFixpoint]]): each
    // level peels only until its survivor set stabilizes, and once a level
    // empties, every deeper level is empty too (step output ⊆ input), so
    // its frames would union in zero rows — skip them. Both cuts are
    // algebraic no-op elisions; the emitted rows are bit-identical to the
    // full kMax·rounds schedule the oracle unrolls.
    var alive = allNodes
    var aliveN = -1L
    val levels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var k = 1
    while (k <= kMax && aliveN != 0L) {
      val (a, n) = peelToFixpoint(alive, rounds, step(_, k))
      alive = a
      aliveN = n
      levels += alive.select(col("id"), lit(k.toLong).as("coreness"))
      k += 1
    }
    allNodes
      .join(levels.reduce(_ unionByName _)
        .groupBy(col("id")).agg(max(col("coreness")).as("coreness")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("coreness"), lit(0L)).as("coreness"))
  }

  /** Degeneracy profile (g09): [[kCore]] swept over `ks`, one row per k —
    * (k, n_core_nodes, n_core_edges) — the curve a curation owner reads to
    * pick the block-cut threshold: the k where the curve hits zero bounds
    * the graph's degeneracy, and a fat high-k tail is the template-family
    * signature. Each sweep point shares the persisted canonical edge set
    * (the guarded persist dedupes by plan), so the sweep costs
    * Σ_k O(m · rounds), never a re-derivation of the pair input.
    * n_core_edges is NULL for an empty core (no survivors to sum over) —
    * the honest "curve has ended" marker, mirrored by the oracle.
    */
  def kCoreProfile(pairs: DataFrame, ks: Seq[Int],
                   rounds: Int = 6): DataFrame = {
    require(ks.nonEmpty, "kCoreProfile: ks must be non-empty")
    require(ks.forall(_ >= 1), "kCoreProfile: every k must be >= 1")
    require(rounds >= 1, "kCoreProfile: rounds must be >= 1")
    // Overlap the sweep points (optimization r20, guide §2.6): each per-k
    // peel is an eager driver loop of small localCheckpoint jobs that are
    // mutually independent across k, so the sweep submits them from a
    // thread pool and one sweep's round tail back-fills the others' idle
    // slots. The shared base frames materialize ONCE, sequentially, before
    // the fork, so the futures never race to compute the guarded persists;
    // the per-k survivor sets and the union order (ks order) are
    // bit-identical to the sequential sweep — only job ordering overlaps.
    val (und, fullDeg) = kCoreBase(pairs)
    fullDeg.count()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(ks.size, 8))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val perK =
      try {
        val fs = ks.map { k =>
          Future {
            kCoreOn(und, fullDeg, k, rounds)
              .agg(count(lit(1)).as("n_core_nodes"),
                (sum(col("core_degree")) / 2).cast("long").as("n_core_edges"))
              .select(lit(k).as("k"), col("n_core_nodes"), col("n_core_edges"))
          }
        }
        fs.map(Await.result(_, Duration.Inf))
      } finally pool.shutdown()
    perK.reduce(_ unionByName _)
  }

  /** Degree assortativity of an UNDIRECTED pair graph: the Pearson
    * correlation between the endpoint degrees over the symmetrized edge
    * list (Newman 2002). The curation read: strongly positive r means
    * near-dup mass concentrates hub-to-hub (template families referencing
    * each other — cut as a block); negative r means hub-and-spoke (one
    * canonical doc with many variants — survivor-select instead).
    *
    * Bit-reproducibility for free: every sufficient statistic (edge count,
    * Σd, Σd², Σd_s·d_t) is an INTEGER sum — summed as DECIMAL(38,0), which
    * is exact and order-independent, so no quantization is even needed —
    * and the final Pearson formula is a fixed tree of deterministic IEEE
    * ops on exactly-represented integers (degrees are far below 2⁵³).
    * One degree aggregation + two id-keyed joins + one global agg; the
    * global agg partial-aggregates map-side, so the coordinator sees one
    * row per partition. Returns one row: (n_nodes, n_edges, assortativity).
    */
  def degreeAssortativity(pairs: DataFrame): DataFrame = {
    val und = Caching.persisted(pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val deg = Caching.persisted(
      und.select(col("a").as("id")).union(und.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("d")))
    val sym = und.select(col("a").as("s"), col("b").as("t"))
      .union(und.select(col("b").as("s"), col("a").as("t")))
    val joined = sym
      .join(deg.select(col("id").as("s"), col("d").as("ds")), "s")
      .join(deg.select(col("id").as("t"), col("d").as("dt")), "t")
    val dec = DecimalType(38, 0)
    val stats = joined.agg(
      count(lit(1)).as("m"),
      sum(col("ds").cast(dec)).as("sx"),
      sum((col("ds") * col("ds")).cast(dec)).as("sxx"),
      sum((col("ds") * col("dt")).cast(dec)).as("sxy"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    // symmetrized list ⇒ x and y marginals are identical (sx=sy, sxx=syy)
    val mD = col("m").cast("double")
    val sxD = col("sx").cast("double")
    val sxxD = col("sxx").cast("double")
    val sxyD = col("sxy").cast("double")
    stats.crossJoin(broadcast(nNodes))
      .select(col("n_nodes"), (col("m") / 2).cast("long").as("n_edges"),
        ((mD * sxyD - sxD * sxD) / (mD * sxxD - sxD * sxD))
          .as("assortativity"))
  }

  /** Neighborhood-similarity link prediction over an UNDIRECTED pair graph:
    * for every node pair sharing at least one neighbor, the three classic
    * scores — common-neighbor count, neighborhood Jaccard
    * |N(a)∩N(b)| / |N(a)∪N(b)|, and the Resource-Allocation index Σ_{c∈N(a)∩N(b)} 1/deg(c)
    * (Zhou, Lü & Zhang 2009 — Adamic–Adar's 1/ln(deg) discount sharpened
    * to 1/deg, chosen here over AA because 1/deg is exact IEEE division of
    * small integers and therefore bit-identical across engines, where
    * 1/ln(deg) inherits each engine's libm log, which differs by 1 ULP
    * between the JVM's StrictMath and glibc) — plus whether the pair is already an edge. The curation use: a
    * near-dup graph's *missing* high-score links are pairs one noisy
    * candidate generator dropped (LSH band miss, df-cut shingle), so the
    * score ranks candidate pairs for a second-pass exact verify; pairs that
    * ARE edges with low Jaccard flag weakly-attached cluster bridges worth
    * re-checking before transitive-closure merging.
    *
    * Scale shape: co-neighbor pairs are generated per shared neighbor c
    * (one self-join of the symmetrized edge list on the center key — the
    * d02 shingle-bucket pattern with nodes as buckets), so wedge volume is
    * Σ_c deg(c)², quadratic at a hub center. Unlike the triangle census the
    * pair SET is the output, so degree-orientation cannot prune it;
    * `maxCenterDegree` is the honest mitigation — drop centers above the
    * cap before pairing (the d07 df-cut applied to nodes). A capped run
    * loses exactly the pairs whose ONLY shared neighbors are hubs, which is
    * also what the RA index's 1/deg says those pairs are worth (a
    * degree-10⁷ hub contributes weight 10⁻⁷ and ~10¹⁴ wedges). Two
    * aggregations (degree, pair-group) + three hash joins, nothing
    * collected or broadcast; the RA weights sum through [[quantizedSum]]
    * (fixed-point quantize + exact DECIMAL add — see the object doc), so
    * scores are bit-reproducible on any partitioning with O(1) per-pair
    * aggregation state even when a pair shares min(deg_u, deg_v) centers.
    *
    * Returns (id_a, id_b, common, jaccard, ra_index, is_edge) with
    * id_a < id_b, one row per co-neighbor pair. Note: by default only
    * pairs with at least one COMMON neighbor appear — an existing edge
    * whose endpoints share no neighbor (the weakest bridge of all,
    * jaccard would be 0) has no row. Set `includeZeroCommonEdges` for
    * bridge audits: those edges union in with common = 0, jaccard = 0,
    * ra_index = 0, so an `is_edge` scan sees the full edge set.
    */
  def nodeSimilarity(pairs: DataFrame,
                     maxCenterDegree: Option[Int] = None,
                     includeZeroCommonEdges: Boolean = false): DataFrame = {
    val und = Caching.persisted(pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val sym = und.select(col("a").as("s"), col("b").as("t"))
      .union(und.select(col("b").as("s"), col("a").as("t")))
    val deg = Caching.persisted(
      sym.groupBy(col("s")).agg(count(lit(1)).as("d")))
    // center-keyed adjacency; both wedge sides are the same plan, so the
    // exchange on s is built once and reused (the triangleStats pattern)
    val centered = maxCenterDegree.foldLeft(sym.join(deg, "s")) {
      (df, cap) => df.filter(col("d") <= cap)
    }
    val wedges = centered.as("x").join(centered.as("y"),
        col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      .select(col("x.t").as("u"), col("y.t").as("v"),
        col("x.s").as("c"), col("x.d").as("dc"))
    val cn0 = wedges.groupBy(col("u"), col("v")).agg(
      count(lit(1)).as("common"),
      quantizedSum(lit(1.0) / col("dc").cast("double")).as("ra_index"))
    // `includeZeroCommonEdges` closes the bridge-audit blind spot: an edge
    // whose endpoints share NO neighbor is the weakest bridge of all, but
    // it has no co-neighbor row — union those edges in with common = 0
    // (ra_index 0.0; jaccard computes to 0 below) so `is_edge` scans see
    // the full edge set. Cost: one anti join of edges against the pair
    // frame — O(edges), no new shuffle class.
    val cn =
      if (!includeZeroCommonEdges) cn0
      else cn0.unionByName(
        und.select(col("a").as("u"), col("b").as("v"))
          .join(cn0.select("u", "v"), Seq("u", "v"), "left_anti")
          .select(col("u"), col("v"), lit(0L).as("common"),
            lit(0.0).as("ra_index")))
    cn
      .join(deg.select(col("s").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("s").as("v"), col("d").as("dv")), "v")
      .join(und.select(col("a").as("u"), col("b").as("v"),
        lit(true).as("edge_mark")), Seq("u", "v"), "left")
      .select(col("u").as("id_a"), col("v").as("id_b"), col("common"),
        (col("common").cast("double") /
          (col("du") + col("dv") - col("common")).cast("double")).as("jaccard"),
        col("ra_index"),
        coalesce(col("edge_mark"), lit(false)).as("is_edge"))
  }
}
