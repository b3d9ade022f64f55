package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * data-sized exchange — the per-source md5-rank window over the
  * targeted subset. The counts branch is a separate pass but a cheap
  * one: its scan prunes to the `source` column alone and map-side
  * partial aggregation keeps its exchange source-cardinality-sized.
  * (A count-over-partition on the rank window's exchange would avoid
  * the second scan but shuffles the corpus full-width a second time —
  * the branches column-prune differently, so Catalyst never
  * canonicalizes their exchanges equal for reuse; measured, not
  * assumed.) K/quotas are source-cardinality relations broadcast back.
  * A deployment that tolerates approximate proportions can swap the
  * rank for a map-side hash-bucket threshold and skip the window
  * shuffle entirely — exact quotas need the rank.
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
    val wRank = Window.partitionBy("source")
      .orderBy(graft.functions.TextAnalysis.md5RankOrder(col("doc_id")): _*)
    val ranked = targeted.withColumn("rk", row_number().over(wRank).cast("long"))
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
}
