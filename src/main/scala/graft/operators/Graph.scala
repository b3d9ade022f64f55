package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics on DataFrames — the power-iteration family
  * (PageRank here; the same shape serves label propagation, which
  * `Dedup.duplicateClusters` already implements as pointer-jumping).
  *
  * Scale shape per iteration: one join (edges ⋈ ranks on src — ranks is
  * node-sized, edges edge-sized) + one dst-keyed aggregate with
  * map-side partials. Nothing is ever collected: state stays a
  * DataFrame. Join strategy is stats-driven: an explicit broadcast hint
  * is only attached while the driver-known node COUNT is under
  * `broadcastRanksMax` — an unconditional hint would be honored
  * regardless of size and force-broadcast a node-sized relation at
  * web-scale node counts (driver/executor OOM); past the gate, Catalyst
  * and AQE pick the src-keyed shuffle from runtime stats.
  *
  * Determinism protocol (the cross-engine hinge, same as
  * `Similarity.lloydCentroids`): per-dst inflow sums go through
  * DECIMAL(27,12) — exact and order-independent under any partitioning
  * — and each iteration's rank is rounded to 6 dp, so both engines
  * iterate on identical doubles and the fixpoint is bit-reproducible.
  */
object Graph {

  /** Above this node count, no broadcast hint is attached to the
    * per-iteration ranks/inflow joins: ~16 B/row puts 1M nodes around
    * the default 10 MB autoBroadcast threshold; the relation then
    * follows stats/AQE like any other join side.
    */
  private[graft] val BroadcastRanksMaxDefault = 1000000L

  /** Weighted PageRank. `edges`: (src, dst, w); `nodes`: (node).
    * Dangling nodes (no out-edges) leak their mass — the simple
    * formulation; the oracle mirrors it. Returns (node, pr).
    *
    * Exchange shape: the edge relation is partitioned ONCE and
    * persisted, keyed to match the join strategy so edges never move
    * again after the build. Broadcast path (n ≤ broadcastRanksMax):
    * e is DST-partitioned — the join moves nothing and the inflow
    * aggregate inherits the distribution, so an iteration adds NO
    * exchange at all. Shuffle path: e is SRC-partitioned — the join
    * shuffles only the node-sized ranks onto e's layout, and the
    * edge-sized contribution stream is collapsed by the map-side
    * partial agg before its dst exchange (≤ partitions × |dst| rows
    * move, ≪ edges). Keying e by dst in the shuffle path would instead
    * re-exchange the full edge relation on src EVERY iteration.
    *
    * Lineage/cache lifecycle: every `checkpointEvery` iterations the
    * rank state is materialized behind a plan boundary
    * (`Dedup.materializeOnce` — reliable checkpoint on a cluster,
    * localCheckpoint in local mode), so a convergence-driven caller can
    * run 50+ iterations without unbounded plan growth or analysis-time
    * blowup. The final ranks are materialized the same way, after which
    * the iteration-scoped edge cache is RELEASED — repeated pageRank
    * calls in a long-lived session don't accumulate edge-sized cache
    * entries (the returned frame no longer references it).
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
               damping: Double = 0.85,
               checkpointEvery: Int = 10,
               broadcastRanksMax: Long = BroadcastRanksMaxDefault): DataFrame = {
    val n = nodes.count() // one metadata-sized action, node count only
    require(n > 0, "pageRank needs a non-empty node set")
    val nodeBase = nodes.select(col("node"),
      lit((1.0 - damping) / n).as("base"), lit(1.0 / n).as("pr"))
    powerIterate(edges, nodeBase, n, iters, damping, checkpointEvery,
      broadcastRanksMax)
  }

  /** PERSONALIZED PageRank: teleport mass goes only to `seeds` (a
    * `node` column — a topic's trusted pages, a user's liked docs), so
    * ranks measure proximity TO THE SEED SET instead of global
    * importance — the random-walk-with-restart family behind
    * topic-sensitive ranking and graph-based recommendation. Same
    * iteration core, exchange shape, determinism protocol, and
    * broadcast gate as [[pageRank]]; only the per-node base/init
    * column differs (seeds get (1−d)/|S| and 1/|S|, others 0).
    */
  def personalizedPageRank(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
                           iters: Int, damping: Double = 0.85,
                           checkpointEvery: Int = 10,
                           broadcastRanksMax: Long = BroadcastRanksMaxDefault): DataFrame = {
    val n = nodes.count()
    require(n > 0, "personalizedPageRank needs a non-empty node set")
    val s = seeds.select(col("node")).distinct()
    val nS = s.count()
    require(nS > 0, "personalizedPageRank needs a non-empty seed set")
    val nodeBase = nodes
      .join(s.withColumn("_s", lit(1)), Seq("node"), "left_outer")
      .select(col("node"),
        when(col("_s").isNotNull, lit((1.0 - damping) / nS))
          .otherwise(lit(0.0)).as("base"),
        when(col("_s").isNotNull, lit(1.0 / nS))
          .otherwise(lit(0.0)).as("pr"))
    powerIterate(edges, nodeBase, n, iters, damping, checkpointEvery,
      broadcastRanksMax)
  }

  /** HITS hubs & authorities (Kleinberg '99): the two-sided fixpoint —
    * a node's AUTHORITY is the (L1-normalized) sum of the hub scores
    * pointing at it, its HUB score the normalized sum of the authority
    * scores it points at. Unweighted edges (the classical formulation;
    * `distinct` applied defensively). Returns (node, hub, auth).
    *
    * Same engineering protocol as [[pageRank]]: edge relation persisted
    * once and released after the fixpoint materializes; node-sized
    * score relations broadcast under the same gate; per-node sums AND
    * the L1 norm go through DECIMAL(27,12) (order-independent) with
    * 6-dp rounding each half-step, so the fixpoint is bit-reproducible
    * cross-engine. Per-iteration normalization keeps every score ≤ 1,
    * inside the DECIMAL cast's range — an unnormalized power iteration
    * overflows DECIMAL(27,12) within a few steps on weighted graphs.
    */
  def hits(edges: DataFrame, nodes: DataFrame, iters: Int,
           broadcastRanksMax: Long = BroadcastRanksMaxDefault): DataFrame = {
    val n = nodes.count()
    require(n > 0, "hits needs a non-empty node set")
    require(iters >= 0)
    val hint: DataFrame => DataFrame =
      if (n <= broadcastRanksMax) broadcast else identity
    val e = edges.select("src", "dst").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var hubs = nodes.select(col("node"), lit(1.0).as("h"))
    var auths = nodes.select(col("node"), lit(1.0).as("a"))
    // UNLIKE pageRank's linear chain, each HITS half-step references
    // its raw-sum relation TWICE (the per-node join AND the L1 norm)
    // and the other side's scores once more — left lazy, the lineage
    // fans out exponentially in the iteration count (measured: 4
    // nation-graph iterations = 118 s of re-computed subtrees). Every
    // half-step therefore materializes behind a plan boundary; the
    // score relations are node-sized, so each cut is metadata-cheap.
    for (_ <- 1 to iters) {
      val ar = Dedup.materializeOnce(
        e.join(hint(hubs), col("src") === col("node"))
          .groupBy("dst")
          .agg(sum(col("h").cast(DecimalType(27, 12))).cast("double").as("ar")))
      val an = ar.agg(coalesce(
        sum(col("ar").cast(DecimalType(27, 12))).cast("double"), lit(1.0)).as("an"))
      auths = Dedup.materializeOnce(
        nodes.join(hint(ar), col("node") === col("dst"), "left_outer")
          .crossJoin(hint(an))
          .select(col("node"),
            round(coalesce(col("ar"), lit(0.0)) / col("an"), 6).as("a")))
      val hr = Dedup.materializeOnce(
        e.join(hint(auths), col("dst") === col("node"))
          .groupBy("src")
          .agg(sum(col("a").cast(DecimalType(27, 12))).cast("double").as("hr")))
      val hn = hr.agg(coalesce(
        sum(col("hr").cast(DecimalType(27, 12))).cast("double"), lit(1.0)).as("hn"))
      hubs = Dedup.materializeOnce(
        nodes.join(hint(hr), col("node") === col("src"), "left_outer")
          .crossJoin(hint(hn))
          .select(col("node"),
            round(coalesce(col("hr"), lit(0.0)) / col("hn"), 6).as("h")))
    }
    val out = Dedup.materializeOnce(
      hubs.join(auths, "node").select(col("node"), col("h").as("hub"), col("a").as("auth")))
    e.unpersist()
    out
  }

  /** Single-source shortest HOPS (BFS levels) by iterative
    * min-relaxation: after k rounds every node holds its exact
    * shortest hop count if it is ≤ k (unreachable-within-k nodes are
    * absent from the output). Integer arithmetic throughout — no
    * float determinism protocol needed. Returns (node, hops) for
    * reached nodes only.
    *
    * Same lineage discipline as [[hits]]: the distance relation is
    * referenced twice per round (the frontier join and the outer
    * merge), so each round materializes behind a node-sized plan
    * boundary; edges distinct + persisted once + released.
    */
  def shortestHops(edges: DataFrame, nodes: DataFrame, source: Long,
                   maxHops: Int,
                   broadcastRanksMax: Long = BroadcastRanksMaxDefault): DataFrame =
    shortestHopsAt(edges, nodes, lit(source), maxHops, broadcastRanksMax)

  /** [[shortestHops]] for any node-key type (the doc graph's nodes are
    * URLs, the nation graph's are Long keys): `source` is a literal
    * column compared against the node key.
    */
  def shortestHopsAt(edges: DataFrame, nodes: DataFrame,
                     source: org.apache.spark.sql.Column, maxHops: Int,
                     broadcastRanksMax: Long = BroadcastRanksMaxDefault): DataFrame = {
    val n = nodes.count()
    require(n > 0, "shortestHops needs a non-empty node set")
    require(maxHops >= 0)
    val hint: DataFrame => DataFrame =
      if (n <= broadcastRanksMax) broadcast else identity
    val e = edges.select("src", "dst").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = nodes.select(col("node"),
      when(col("node") === source, lit(0L)).otherwise(lit(null).cast("long"))
        .as("hops"))
    for (_ <- 1 to maxHops) {
      val relax = e.join(hint(dist.filter(col("hops").isNotNull)),
          col("src") === col("node"))
        .groupBy("dst").agg(min(col("hops") + lit(1L)).as("nh"))
      dist = Dedup.materializeOnce(
        dist.join(hint(relax), col("node") === col("dst"), "left_outer")
          .select(col("node"),
            when(col("hops").isNull, col("nh"))
              .when(col("nh").isNull, col("hops"))
              .otherwise(least(col("hops"), col("nh"))).as("hops")))
    }
    val out = Dedup.materializeOnce(dist.filter(col("hops").isNotNull))
    e.unpersist()
    out
  }

  /** Weighted single-source shortest PATHS (SSSP) by iterative
    * min-relaxation — the weighted sibling of [[shortestHops]]: after
    * k rounds every node holds the exact minimum path WEIGHT over
    * paths of at most k edges (distributed Bellman-Ford; nodes
    * unreachable within k edges are absent). Long weights, integer
    * arithmetic throughout — no float protocol needed. Same lineage,
    * hint-gate, and edge-cache discipline as [[shortestHops]].
    * Returns (node, dist) for reached nodes.
    */
  def shortestPaths(edges: DataFrame, nodes: DataFrame,
                    source: org.apache.spark.sql.Column, maxRounds: Int,
                    broadcastRanksMax: Long = BroadcastRanksMaxDefault): DataFrame = {
    val n = nodes.count()
    require(n > 0, "shortestPaths needs a non-empty node set")
    require(maxRounds >= 0)
    val hint: DataFrame => DataFrame =
      if (n <= broadcastRanksMax) broadcast else identity
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = nodes.select(col("node"),
      when(col("node") === source, lit(0L)).otherwise(lit(null).cast("long"))
        .as("dist"))
    for (_ <- 1 to maxRounds) {
      val relax = e.join(hint(dist.filter(col("dist").isNotNull)),
          col("src") === col("node"))
        .groupBy("dst").agg(min(col("dist") + col("w")).as("nd"))
      dist = Dedup.materializeOnce(
        dist.join(hint(relax), col("node") === col("dst"), "left_outer")
          .select(col("node"),
            when(col("dist").isNull, col("nd"))
              .when(col("nd").isNull, col("dist"))
              .otherwise(least(col("dist"), col("nd"))).as("dist")))
    }
    val out = Dedup.materializeOnce(dist.filter(col("dist").isNotNull))
    e.unpersist()
    out
  }

  /** Synchronous weighted LABEL PROPAGATION (Raghavan et al. '07) —
    * community detection, the graph-family member between connected
    * components (`Dedup.duplicateClusters`' pointer-jumping) and the
    * rank fixpoints: label_0(v) = v; each round every node adopts the
    * label with the greatest incoming edge-weight mass among its
    * neighbors' current labels (its own label kept when it has no
    * in-edges). DETERMINISTIC throughout — the argmax tie-break is the
    * MINIMUM label, and weight sums are integer — so a fixed-round run
    * oracles exactly (async/randomized LPA variants do not). Callers
    * pass a symmetric edge relation for undirected graphs (the
    * `q_hits_docs` shape). Returns (node, label).
    *
    * Exchange shape per round: one src-keyed join moving only the
    * node-sized label relation onto the persisted src-partitioned
    * edges, then the vote aggregate — map-side partials collapse the
    * edge-sized stream to ≤ |dst|·labels-per-dst rows. The per-node
    * argmax is AGGREGATION-only (max weight per dst, then min label
    * achieving it): unlike a row_number window it stays AQE-splittable
    * under degree skew — a celebrity node's votes never serialize onto
    * one task. Same lineage/materialize/hint-gate/edge-release
    * discipline as [[hits]].
    */
  def labelPropagation(edges: DataFrame, nodes: DataFrame, iters: Int,
                       broadcastRanksMax: Long = BroadcastRanksMaxDefault): DataFrame = {
    val n = nodes.count()
    require(n > 0, "labelPropagation needs a non-empty node set")
    require(iters >= 0)
    val hint: DataFrame => DataFrame =
      if (n <= broadcastRanksMax) broadcast else identity
    val e = edges.groupBy("src", "dst").agg(sum(col("w").cast("long")).as("w"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to iters) {
      // votes is referenced twice (the max and the argmax join) — one
      // materialized cut per round, per the HITS lineage rule
      val votes = Dedup.materializeOnce(
        e.join(hint(labels), col("src") === col("node"))
          .groupBy(col("dst"), col("label"))
          .agg(sum(col("w")).as("vw")))
      val best = votes.groupBy("dst").agg(max(col("vw")).as("mv"))
      val winner = votes.join(hint(best.withColumnRenamed("dst", "bdst")),
          col("dst") === col("bdst") && col("vw") === col("mv"))
        .groupBy("dst").agg(min(col("label")).as("nl"))
      labels = Dedup.materializeOnce(
        labels.join(hint(winner), col("node") === col("dst"), "left_outer")
          .select(col("node"), coalesce(col("nl"), col("label")).as("label")))
    }
    val out = Dedup.materializeOnce(labels)
    e.unpersist()
    out
  }

  /** The shared power-iteration core. `nodeBase`: (node, base, pr) —
    * per-node teleport mass and initial rank, node-sized by contract
    * (one row per node; referenced once per iteration like the ranks).
    */
  private def powerIterate(edges: DataFrame, nodeBase: DataFrame, n: Long,
                           iters: Int, damping: Double, checkpointEvery: Int,
                           broadcastRanksMax: Long): DataFrame = {
    require(iters >= 0 && checkpointEvery > 0)
    // gate decided ONCE from the driver-known node count — the hinted
    // relation is exactly node-sized by construction (one row per node)
    val broadcastRanks = n <= broadcastRanksMax
    val hint: DataFrame => DataFrame =
      if (broadcastRanks) broadcast else identity
    val outw = edges.groupBy("src").agg(sum(col("w")).as("outw"))
    // every iteration references e: without a persist the final DAG
    // re-derives the (possibly expensive) edge build once PER iteration;
    // cached, the build runs once and iterations reuse the (edge-count
    // sized, already-aggregated) relation — keyed per the doc above
    val e = edges.join(outw, "src")
      .repartition(col(if (broadcastRanks) "dst" else "src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodeBase.select("node", "pr")
    for (i <- 1 to iters) {
      val inflow = e.join(hint(ranks), col("src") === col("node"))
        .select(col("dst"),
          (col("pr") * col("w") / col("outw")).cast(DecimalType(27, 12)).as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).cast("double").as("inflow"))
      ranks = nodeBase.join(hint(inflow), col("node") === col("dst"), "left_outer")
        .select(col("node"),
          round(col("base") + lit(damping) * coalesce(col("inflow"), lit(0.0)), 6)
            .as("pr"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = Dedup.materializeOnce(ranks)
    }
    // materialize the fixpoint (node-sized) so the edge cache can be
    // dropped NOW instead of leaking until storage eviction
    val out = Dedup.materializeOnce(ranks)
    e.unpersist()
    out
  }
}
