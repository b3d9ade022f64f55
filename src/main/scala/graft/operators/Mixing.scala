package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Target-mix resampling (⊕ LLM-pipeline): downsample a multi-source
  * corpus to EXACT target proportions, maximizing retained data subject
  * to exactness and availability — the "data mixture" pass a
  * pre-training stack runs to hit a prescribed domain mix
  * (web/books/code/...).
  *
  * Targets are INTEGER ratio weights p_s (e.g. 5:3:2), not fractions:
  * the mix is taken in whole "batches" of Σp docs, so proportions are
  * exact by construction at every K — a fractional-target floor(t_s·K)
  * formulation drifts from the target whenever t_s·K is non-integral.
  * K = min_s floor(n_s / p_s) batches is the most the scarcest source
  * supports; each source contributes quota p_s·K ≤ n_s, selected
  * DETERMINISTICALLY by md5-rank (`TextAnalysis.md5RankOrder` — stable
  * across runs, engines and cluster sizes, no RNG).
  *
  * A targeted source with fewer docs than its weight (n_s < p_s, which
  * includes sources absent from the corpus entirely — the typo case)
  * cannot support one batch: the quota relation carries a `raise_error`
  * for it, so the job FAILS with the offending source named instead of
  * silently emitting an empty or skewed mix.
  *
  * Scale shape: non-targeted sources are dropped map-side by the
  * broadcast inner join with the tiny target relation BEFORE the one
  * data-sized exchange — the per-source md5 rank, computed by the
  * distributed `RangeRank` operator (range repartition + tiny offset
  * relation), NOT a per-source row_number window: with 3 targeted
  * sources a window means 3 tasks regardless of corpus size, each
  * external-sorting a full source on one core. The counts branch is a
  * separate pass but a cheap one: its scan prunes to the `source`
  * column alone and map-side partial aggregation keeps its exchange
  * source-cardinality-sized. K/quotas are source-cardinality relations
  * broadcast back. A deployment that tolerates approximate proportions
  * can swap the rank for a map-side hash-bucket threshold and skip the
  * rank shuffle entirely — exact quotas need the rank.
  */
object Mixing {

  /** (source, doc_id, rk) of the docs selected to hit the target mix. */
  def targetMix(docsDf: DataFrame, targets: Seq[(String, Int)]): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "targets must be non-empty with positive integer weights")
    require(targets.map(_._1).distinct.size == targets.size, "duplicate target source")
    val spark = docsDf.sparkSession
    import spark.implicits._
    val tRel = targets.toDF("source", "p")
    // project to the two columns the operator owns BEFORE deriving
    // anything: caller columns named rk/n/quota must not collide with
    // (or silently replace) the working columns, and the window must
    // never shuffle caller payload it does not need
    val targeted = docsDf.select(col("source"), col("doc_id"))
      .join(broadcast(tRel), Seq("source"))
    // per-source md5 rank via the distributed RangeRank operator, NOT a
    // row_number window: Window.partitionBy(source) with 3 targeted
    // sources means 3 window partitions regardless of corpus size —
    // each source's full doc mass external-sorts on ONE task, the
    // straggler wall AQE cannot split. RangeRank's range repartition
    // spreads every source across data-sized partitions; md5RankOrder's
    // doc_id tie-break is a total order, so the rank stays fully
    // deterministic (same values as the window formulation). The rank
    // input is projected to exactly (source, doc_id, _h): the weight
    // column would ride the range exchange as prunable payload
    // (RangeRank's reuse invariant), and nothing downstream of the rank
    // needs it — the quota relation carries p's consequence.
    val ranked = RangeRank.ranked(
        targeted.select(col("source"), col("doc_id")).withColumn("_h",
          graft.functions.TextAnalysis.md5RankOrder(col("doc_id")).head),
        "source", Seq("_h", "doc_id"))
      .withColumn("rk", col("_rn"))
      .select("source", "doc_id", "rk")
    val counts = targeted.groupBy("source").agg(count(lit(1)).as("n"))
    val withMissing = tRel
      .join(counts, Seq("source"), "left")
      .select(col("source"), col("p"), coalesce(col("n"), lit(0L)).as("n"))
    val k = withMissing.agg(
      min(floor(col("n").cast("double") / col("p"))).as("k"))
    val quota = withMissing.crossJoin(broadcast(k)).select(
      col("source"),
      when(col("n") >= col("p"), (col("p") * col("k")).cast("long"))
        .otherwise(raise_error(concat(
          lit("targetMix: source '"), col("source"),
          lit("' cannot support one batch (fewer docs than its weight)"))))
        .as("quota"))
    ranked.join(broadcast(quota), Seq("source"))
      .filter(col("rk") <= col("quota"))
      .select("source", "doc_id", "rk")
  }

  /** WEIGHTED sample without replacement, k docs with inclusion
    * probability proportional to `weight` (Efraimidis–Spirakis A-ES:
    * top-k by priority u^(1/w)) — the "sample by quality/length/score"
    * pass a curation pipeline runs when it wants a budget-sized subset
    * that still favors its best documents. Fully DETERMINISTIC: u is
    * md5-derived (`TextAnalysis.hashUniform`), so the sample is stable
    * across runs, engines and cluster sizes — reproducible curation, and
    * oracle-checkable (the RNG `sample()` can never be).
    *
    * Scale shape: priority is a map-side projection; the top-k plans as
    * TakeOrderedAndProject — per-partition O(k) heaps merged once,
    * NEVER a global sort of the corpus. k is result-sized by contract
    * (a sample you intend to look at), not corpus-sized; for
    * corpus-fraction sampling use a priority-threshold filter instead
    * (same key, no ordering at all).
    *
    * Weights must be strictly positive (u^(1/w) needs w > 0; a zero
    * weight is a doc the caller already decided to drop — filter it
    * first). Ties on the 6-dp rounded priority break by doc_id, a total
    * order, so the boundary of the sample is exact.
    */
  def weightedSample(docsDf: DataFrame, weight: Column, k: Int): DataFrame =
    docsDf
      .select(col("doc_id"),
        graft.functions.TextAnalysis.weightedPriority(col("doc_id"), weight)
          .as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
}
