package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Target-mix resampling (⊕ LLM-pipeline): downsample a multi-source
  * corpus to EXACT target proportions, maximizing retained data subject
  * to availability — the "data mixture" pass a pre-training stack runs
  * to hit a prescribed domain mix (web/books/code/...).
  *
  * Given targets t_s (relative weights over the sources to keep) and
  * observed counts n_s, the largest total the scarcest source supports
  * is K = min_s floor(n_s / t_s); each source contributes its quota
  * k_s = floor(t_s · K) ≤ n_s, selected DETERMINISTICALLY by md5-rank
  * (stable across runs, engines and cluster sizes — same discipline as
  * the split/sampling operators, no RNG).
  *
  * Scale shape: non-targeted sources are dropped BEFORE any shuffle (the
  * broadcast inner join with the tiny target relation doubles as the
  * filter); counts/K/quotas are three tiny aggregates over
  * source-cardinality relations, broadcast back; the one data-sized
  * operation is the per-source md5-rank window over the TARGETED subset
  * only. A deployment that tolerates approximate proportions can swap
  * the rank for a map-side hash-bucket threshold (`hashBucket100 <
  * 100·k_s/n_s`) and skip the window shuffle entirely — exact quotas
  * need the rank.
  */
object Mixing {

  /** (source, doc_id, rk) of the docs selected to hit the target mix.
    * `targets` must be non-empty with positive weights; sources absent
    * from it are dropped, sources in it but absent from the corpus make
    * the result empty (their n_s = 0 caps K at 0) — loud, not silent.
    */
  def targetMix(docsDf: DataFrame, targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "targets must be non-empty with positive weights")
    require(targets.map(_._1).distinct.size == targets.size, "duplicate target source")
    val spark = docsDf.sparkSession
    import spark.implicits._
    val tRel = targets.toDF("source", "t")
    val targeted = docsDf.join(broadcast(tRel), Seq("source"))
    val counts = targeted.groupBy("source")
      .agg(count(lit(1)).as("n"), max(col("t")).as("t"))
    // missing-source guard: a target with no corpus rows never reaches
    // `counts`, so its implicit n=0 must cap K to 0 via a left join
    val withMissing = tRel
      .join(counts.select(col("source"), col("n")), Seq("source"), "left")
      .select(col("source"), col("t"), coalesce(col("n"), lit(0L)).as("n"))
    val k = withMissing.agg(
      min(floor(col("n").cast("double") / col("t"))).as("k"))
    val quota = counts.crossJoin(broadcast(k))
      .select(col("source"), floor(col("t") * col("k")).cast("long").as("quota"))
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    targeted.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quota), Seq("source"))
      .filter(col("rk") <= col("quota"))
      .select("source", "doc_id", "rk")
  }
}
