package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical TESTING and distribution-drift operators — the readout
  * passes an experimentation or corpus-curation pipeline runs over its
  * fact streams: did cohort A move metric X (Welch), and how far apart
  * have two corpus slices drifted (Jensen–Shannon).
  *
  * Determinism protocol (the cross-engine hinge, same as
  * `RelationalQueries.LineitemMoments`): every data-mass sum goes
  * through DECIMAL — exact and order-independent under any
  * partitioning — and float math happens only on the final
  * already-reduced scalars (Welch) or as per-row contributions rounded
  * to 12 dp before an exact DECIMAL(27,12) sum (JS), so results are
  * bit-reproducible and oracle-mirrorable. `ln` parity across engines
  * is the established q_pmi/q_lm_score precedent.
  */
object Stats {

  /** Welch's unequal-variance two-sample t-test: does `valueCol` differ
    * between cohorts `a` and `b` of `groupCol`? The A/B-experiment
    * readout. ONE aggregate pass over the (filtered) table computes
    * both cohorts' (n, Σv, Σv²) moments — map-side partials, one
    * exchange carrying two rows — and the t statistic + the
    * Welch–Satterthwaite degrees of freedom are a projection over the
    * two-row result (bounded by contract: two 1-row relations cross-
    * joined). Values must be ≤2-dp with |v| < 1e6 — the corpus measure
    * contract that keeps each value exactly representable in
    * DECIMAL(8,2), so the squared sum (decimal product of the decimal
    * value — never a double square cast after the fact) and the
    * DECIMAL(18,6) value sum are both exact and order-independent.
    *
    * Output (one row): cohort_a, cohort_b, n_a, n_b, mean_a, mean_b,
    * t_stat, df_welch — all float outputs 6-dp rounded.
    */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
                 a: String, b: String): DataFrame = {
    val m = df.filter(col(groupCol).isin(a, b))
      .groupBy(groupCol).agg(
        count(col(valueCol)).as("n"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast("double").as("s"),
        // square IN DECIMAL: a ≤2-dp value fits DECIMAL(8,2) exactly and
        // the decimal product is exact by construction. Squaring in
        // double first and casting after is NOT exact near the 1e6
        // bound: the double product's absolute error (~3e-16·v²,
        // up to ~3e-4) exceeds the 4-dp grid's 0.5e-4 half-ulp, and
        // Spark's HALF_UP vs the oracle engine's cast rounding could
        // then diverge on the recovered square.
        sum(col(valueCol).cast(DecimalType(8, 2)) * col(valueCol).cast(DecimalType(8, 2)))
          .cast("double").as("q"))
    val ma = m.filter(col(groupCol) === a)
      .select(col("n").as("na"), col("s").as("sa"), col("q").as("qa"))
    val mb = m.filter(col(groupCol) === b)
      .select(col("n").as("nb"), col("s").as("sb"), col("q").as("qb"))
    // sample variance and squared standard error per cohort — spelled
    // once and reused so both engines evaluate the identical op sequence
    val va = (col("qa") - col("sa") * col("sa") / col("na")) / (col("na") - 1)
    val vb = (col("qb") - col("sb") * col("sb") / col("nb")) / (col("nb") - 1)
    val sea = va / col("na")
    val seb = vb / col("nb")
    ma.crossJoin(mb).select(
      lit(a).as("cohort_a"), lit(b).as("cohort_b"),
      col("na").as("n_a"), col("nb").as("n_b"),
      round(col("sa") / col("na"), 6).as("mean_a"),
      round(col("sb") / col("nb"), 6).as("mean_b"),
      round((col("sa") / col("na") - col("sb") / col("nb")) / sqrt(sea + seb), 6)
        .as("t_stat"),
      round((sea + seb) * (sea + seb) /
        (sea * sea / (col("na") - 1) + seb * seb / (col("nb") - 1)), 6)
        .as("df_welch"))
  }

  /** Pairwise Jensen–Shannon divergence between the per-`groupCol`
    * term distributions of a (group, term, count) relation — the
    * corpus-drift matrix (which sources' language has diverged),
    * complementing `Dedup.sourceOverlap`'s shingle Jaccard with a
    * distribution-level measure.
    *
    * INNER-join-only decomposition (the scale hinge — no per-pair full
    * outer join over the vocabulary): with m = (p+q)/2,
    *
    *   JSD(a,b) = ½ [ Σ_shared ( pa·ln(2pa/(pa+pb)) + pb·ln(2pb/(pa+pb)) )
    *                + (1 − Σ_shared pa)·ln 2 + (1 − Σ_shared pb)·ln 2 ]
    *
    * because a term present only in `a` contributes pa·ln(2pa/pa) =
    * pa·ln 2 — so the one-sided mass reduces to the complement of the
    * shared mass, and only the term-keyed equi-join over shared terms
    * (per-term fan ≤ groups-with-term², AQE-splittable) ever runs.
    * Per-term contributions are 12-dp rounded then summed EXACTLY in
    * DECIMAL(27,12), so the float sum order can never flip a result.
    *
    * Output: (source_a, source_b, shared_terms, jsd) per unordered
    * group pair, jsd ∈ [0, ln 2] rounded 6-dp.
    */
  def jsDivergence(counts: DataFrame, groupCol: String, termCol: String,
                   countCol: String): DataFrame = {
    val tot = counts.groupBy(groupCol).agg(sum(col(countCol)).as("t"))
    val p = counts.join(broadcast(tot), groupCol)
      .select(col(groupCol).as("g"), col(termCol).as("term"),
        (col(countCol).cast("double") / col("t")).as("p"))
    val pa = p.select(col("g").as("source_a"), col("term"), col("p").as("pa"))
    val pb = p.select(col("g").as("source_b"), col("term"), col("p").as("pb"))
    val contrib =
      col("pa") * log(lit(2) * col("pa") / (col("pa") + col("pb"))) +
        col("pb") * log(lit(2) * col("pb") / (col("pa") + col("pb")))
    pa.join(pb, "term").filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(
        sum(round(contrib, 12).cast(DecimalType(27, 12))).cast("double").as("cs"),
        sum(round(col("pa"), 12).cast(DecimalType(27, 12))).cast("double").as("spa"),
        sum(round(col("pb"), 12).cast(DecimalType(27, 12))).cast("double").as("spb"),
        count(lit(1)).as("shared_terms"))
      .select(col("source_a"), col("source_b"), col("shared_terms"),
        round((col("cs") + (lit(1.0) - col("spa")) * log(lit(2.0)) +
          (lit(1.0) - col("spb")) * log(lit(2.0))) / 2, 6).as("jsd"))
  }
}
