package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics on DataFrames — the power-iteration family
  * (PageRank here; the same shape serves label propagation, which
  * `Dedup.duplicateClusters` already implements as pointer-jumping).
  *
  * Scale shape per iteration: one join (edges ⋈ ranks on src — ranks is
  * node-sized, edges edge-sized; Catalyst broadcasts ranks while it
  * fits, hash-exchanges both on src beyond that) + one dst-keyed
  * aggregate with map-side partials. Nothing is ever collected: state
  * stays a DataFrame, iterations compose lineage (fixed small iteration
  * counts; a convergence-driven variant would checkpoint every few
  * rounds exactly like `duplicateClusters` does).
  *
  * Determinism protocol (the cross-engine hinge, same as
  * `Similarity.lloydCentroids`): per-dst inflow sums go through
  * DECIMAL(27,12) — exact and order-independent under any partitioning
  * — and each iteration's rank is rounded to 6 dp, so both engines
  * iterate on identical doubles and the fixpoint is bit-reproducible.
  */
object Graph {

  /** Weighted PageRank. `edges`: (src, dst, w); `nodes`: (node).
    * Dangling nodes (no out-edges) leak their mass — the simple
    * formulation; the oracle mirrors it. Returns (node, pr).
    *
    * Exchange shape: the edge relation is partitioned by `dst` ONCE and
    * persisted — every iteration's inflow aggregate then inherits that
    * distribution, so with ranks broadcast (node-sized ≪ edge-sized;
    * Catalyst picks it from stats) an iteration adds NO edge-mass
    * exchange at all. When ranks outgrow broadcast (true web scale),
    * Catalyst falls back to a src-keyed shuffle of ranks only — the
    * edges still never move again.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    val n = nodes.count() // one metadata-sized action, node count only
    val base = (1.0 - damping) / n
    val outw = edges.groupBy("src").agg(sum(col("w")).as("outw"))
    // every iteration references e: without a persist the final DAG
    // re-derives the (possibly expensive) edge build once PER iteration;
    // cached, the build runs once and iterations reuse the (edge-count
    // sized, already-aggregated) relation
    val e = edges.join(outw, "src").repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      val inflow = e.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst"),
          (col("pr") * col("w") / col("outw")).cast(DecimalType(27, 12)).as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).cast("double").as("inflow"))
      ranks = nodes.join(broadcast(inflow), col("node") === col("dst"), "left_outer")
        .select(col("node"),
          round(lit(base) + lit(damping) * coalesce(col("inflow"), lit(0.0)), 6)
            .as("pr"))
    }
    ranks
  }
}
