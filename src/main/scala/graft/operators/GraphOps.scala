package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph propagation operators over pair tables (the dedup family's edge
  * lists double as document graphs). The LLM-pipeline use is quality/spam
  * propagation over a link or similarity graph — Common Crawl curation ranks
  * hosts by centrality before sampling — so the operator takes any
  * `(id_a, id_b)` pair frame (e.g. [[Dedup.ngramJaccardPairs]]) as the graph.
  *
  * Scale shape: one shuffle per iteration on the destination id (the same
  * key every iteration, so a pre-partitioned edge table reuses its exchange),
  * edge table persisted once and read `iters` times; no driver-side loop
  * over data — the driver only composes a fixed-depth lazy plan. Rank sums
  * fold per destination in source-id order from a 0.0 seed (exact collect →
  * sort → fold, the t15 pattern), so the double addition order — PageRank's
  * one nondeterminism trap on a cluster — is pinned and the result is
  * bit-reproducible on any partitioning.
  */
object GraphOps {

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
        .agg(aggregate(
          array_sort(collect_list(struct(col("s"), (col("pr") / col("d")).as("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("msum"))
        .select(col("t").as("id"), col("n_nodes"),
          (teleport / col("n_nodes") + lit(damping) * col("msum")).as("pr"))
    val r0 = deg.select(col("s").as("id")).crossJoin(broadcast(nDf))
      .withColumn("pr", lit(1.0) / col("n_nodes"))
    val rFinal = Iterator.iterate(r0)(step).drop(iters).next()
    rFinal
      .join(deg.select(col("s").as("id"), col("d").as("degree")), "id")
      .select(col("id"), col("degree"), col("pr").as("pagerank"))
  }
}
