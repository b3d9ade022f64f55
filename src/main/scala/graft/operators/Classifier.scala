package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trained discriminative quality filter — the gate every modern
  * curation pipeline runs (CCNet's fastText filter, DCLM's trained
  * classifier, FineWeb-Edu's scorer): a linear model FIT on a labeled
  * seed, then applied as one map-side scoring pass over the corpus.
  * This is the engine's trainer; the seed-construction and gating live
  * with the registered queries (`AnalysisQueries.qualityClfOf`).
  *
  * TRAINING PROTOCOL (the Lloyd/PageRank/Pca cross-engine discipline):
  * full-batch gradient descent for a FIXED number of rounds from the
  * all-zero start. Per round the per-row residual quantizes to the 6dp
  * grid and the d+1 gradient sums accumulate in EXACT DECIMAL(18,6) —
  * order-independent, so the fit is identical across partitionings,
  * runs, and engines (the DuckDB oracle unrolls the same rounds as
  * CTEs and hash-matches the weights). Weights re-quantize to 6dp
  * after every update.
  *
  * THE LINK FUNCTION IS THE ALGEBRAIC SIGMOID σ(z) = 0.5 + 0.5·z/(1+|z|),
  * not exp-based logistic: +, ·, /, abs are IEEE-deterministic across
  * engines, while exp() may differ in the last ulp between libm
  * implementations — and one flipped ulp under the 6dp rounding would
  * diverge the whole descent. Same gradient-descent dynamics, exact
  * cross-engine portability.
  *
  * SCALE SHAPE: each round is ONE aggregate over the seed (map-side
  * partial sums; d+1 decimal cells per task), and the only driver
  * action is the (d+1)-value gradient lift — bounded by the feature
  * contract, never by seed size. The seed relation is persisted for
  * the duration of the fixed `rounds` loop and released before the
  * model returns; scoring is a literal-weight map expression (zero
  * shuffle, whole-stage codegen).
  */
object Classifier {

  private def r6(x: Double): Double = graft.util.Num.r6(x)

  /** The linear margin z = w₀ + Σ wⱼ·xⱼ with LITERAL weights — built
    * left-associated so the engine's IEEE evaluation order matches the
    * oracle's `b + w1*x1 + w2*x2 + …` text exactly.
    */
  def margin(weights: Seq[Double], features: Seq[Column]): Column = {
    require(weights.length == features.length + 1,
      s"${weights.length} weights for ${features.length} features (+bias)")
    features.zip(weights.tail).foldLeft(lit(weights.head): Column) {
      case (acc, (x, w)) => acc + lit(w) * x
    }
  }

  /** Per-row score p = σ(z) with the algebraic sigmoid — monotone in
    * the margin, so gating on p ≥ 0.5 is exactly `margin ≥ 0`.
    */
  def score(weights: Seq[Double], features: Seq[Column]): Column = {
    val z = margin(weights, features)
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))
  }

  /** Hashed char-n-gram bucket features over a TOKEN-LIST column — the
    * fastText-shaped featurizer (bag of character n-grams, hashed into
    * a fixed bucket table) for classifiers that should learn from TEXT
    * SHAPE rather than hand-engineered scalars. The token list is
    * re-joined with single spaces (so cross-word boundary grams carry
    * function-word shape — 'he ', ' th' — exactly the signal a
    * stopword-free pathology lacks), the sliding `n`-grams hash through
    * the native `md5_prefix32` expression, and bucket j's feature is
    * its 6dp-rounded gram-mass share. md5-derived buckets are the
    * engine-portable determinism trick: the oracle recomputes the same
    * bucket of every gram from the md5 hex text. `d` is bounded by the
    * fit's (d+1)-value driver-lift contract — keep it tens, not
    * thousands.
    */
  def hashedGramVector(tokens: Column, d: Int, ns: Seq[Int]): Column = {
    require(d >= 2 && d <= 256, s"bucket count must be in [2, 256], got $d")
    require(ns.nonEmpty && ns.forall(_ >= 1), s"gram lengths must be >= 1, got $ns")
    val s = array_join(tokens, " ")
    // ONE native pass per gram length builds the d-bucket histograms,
    // zip_with-pooled into shared buckets (fastText-style); the share
    // transform runs over the pooled ARRAY, so the d features stay one
    // column and every downstream plan (stats, gradient, gate) is a
    // handful of nodes whatever d is — d named columns made the
    // per-round PLANNING dominate the fit ~20× (measured at d = 128)
    val counts = ns.map(n => graft.plans.GramBuckets.gramBuckets(s, n, d))
      .reduce((a, b) => zip_with(a, b, _ + _))
    val ng = ns.map(n => greatest(length(s) - (n - 1), lit(0))).reduce(_ + _)
    // RAW ×10 gram-mass shares (the clfFeatures x1 discipline) — the
    // fit standardizes them per bucket (`featureStatsVec`): shares are
    // non-negative with a constant row sum, so unstandardized descent
    // degenerates to the "has any grams at all" axis, and bucket
    // variances differ by orders of magnitude, so one global learning
    // rate crawls on the discriminative dimensions
    transform(counts, c =>
      round(when(ng <= 0, 0.0).otherwise(c.cast("double") * 10.0 / ng), 6))
  }

  /** Per-position (mean, 6dp std) of an `array<double>` feature column
    * for the wide fit's standardization — ONE posexplode aggregate
    * (d-row lift), exact-DECIMAL sums (the fitLogReg gradient protocol,
    * so the stats are order-independent and engine-portable), std
    * floored at 1e-6 so a constant bucket cannot divide by zero.
    */
  def featureStatsVec(df: DataFrame, featuresCol: String, dims: Int): Seq[(Double, Double)] = {
    val rows = df
      .select(posexplode(col(featuresCol)).as(Seq("fj", "fx")))
      .groupBy("fj")
      .agg(sum(col("fx").cast(DecimalType(18, 6))).as("s"),
        // exact 12dp squares — see the gradient's half-point note
        sum(col("fx").cast(DecimalType(12, 6)) *
          col("fx").cast(DecimalType(12, 6))).as("q"),
        count(lit(1)).as("n"))
      .collect()
    require(rows.length == dims,
      s"featureStatsVec: ${rows.length} positions, expected $dims (empty input or ragged arrays)")
    val byPos = rows.map(r => r.getInt(0) ->
      (r.getDecimal(1).doubleValue(), r.getDecimal(2).doubleValue(), r.getLong(3).toDouble)).toMap
    (0 until dims).map { j =>
      val (sm, sq, n) = byPos(j)
      val mu = r6(sm / n)
      val sd = math.max(r6(math.sqrt(math.max(sq / n - mu * mu, 1e-12))), 1e-6)
      (mu, sd)
    }
  }

  /** `fitLogReg` for WIDE feature vectors (the hashed-gram featurizer's
    * d ≳ 64): identical arithmetic, identical DECIMAL gradient
    * protocol, identical weights — but the seed carries ONE
    * `array<double>` feature column (leading 1.0 bias element) instead
    * of d named columns, the margin is the native `dot_f64` (left-to-
    * right accumulation ≡ the literal fold, property of DotF64), and
    * the gradient is a posexplode → per-position aggregate. With d
    * named columns every round re-analyzes a d-term expression tree
    * and a (d+1)-cell aggregate — at d = 128 the per-round planning
    * dominates the fit ~20× over the data passes (measured); here each
    * round's plan is a handful of nodes whatever d is, and the
    * gradient lift stays the bounded (d+1)-row collect.
    *
    * `featuresCol` rows must be non-null, length-`dims`, element 0 =
    * 1.0 (so gradient position 0 is the bias cell: round(r·1, 6) = r,
    * exactly `fitLogReg`'s g0).
    */
  def fitLogRegWide(seed0: DataFrame, featuresCol: String, labelCol: String,
                    dims: Int, rounds: Int, lr: Double): Array[Double] = {
    val seed = seed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = seed.count().toDouble
      require(n > 0, "cannot fit a classifier on an empty seed")
      var w = Array.fill(dims)(0.0)
      for (_ <- 1 to rounds) {
        val z = graft.plans.DotF64.dotF64(col(featuresCol), lit(w))
        val r = round((lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))) - col(labelCol), 6)
        // EXACT decimal products, no rounding: r and x both live on the
        // 6dp grid, so their product is exactly a 12dp decimal — and
        // `round(r*x, 6)` would land EXACTLY on rounding half-points
        // (e.g. r = ±0.5 against an odd-grid x) where the engines'
        // double-round implementations disagree in the last digit
        // (measured: 128/193 weights off by 1e-6 after 48 rounds)
        val g = seed
          .select(r.as("gr"), posexplode(col(featuresCol)).as(Seq("gj", "gx")))
          .groupBy("gj")
          .agg(sum(col("gr").cast(DecimalType(12, 6)) *
            col("gx").cast(DecimalType(18, 6))).as("g"))
          .collect() // dims rows — bounded by the feature contract
        require(g.length == dims,
          s"gradient has ${g.length} cells, expected $dims — ragged feature arrays")
        val gm = g.map(row => row.getInt(0) -> row.getDecimal(1).doubleValue()).toMap
        w = w.indices.map(j => r6(w(j) - lr * (gm(j) / n))).toArray
      }
      w
    } finally { seed.unpersist(); () }
  }

  /** Fixed-round full-batch fit. `seed` must carry the 6dp-quantized
    * feature columns and a 0.0/1.0 double label; returns bias-first
    * 6dp weights. Deterministic and partitioning-invariant by the
    * DECIMAL gradient protocol (spec-pinned).
    */
  def fitLogReg(seed0: DataFrame, featureCols: Seq[String], labelCol: String,
                rounds: Int, lr: Double): Array[Double] = {
    val seed = seed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = seed.count().toDouble
      require(n > 0, "cannot fit a classifier on an empty seed")
      // a NULL feature/label contributes NOTHING to the DECIMAL gradient
      // sums (NULL propagates; SUM skips it) while still counting in n —
      // a malformed seed would silently train on fewer rows than n
      // claims. Fail loudly instead (the Pca ±300 contract). ONE
      // aggregate pass over the cached seed: count(c) skips NULLs.
      val checkCols = featureCols :+ labelCol
      val nnRow = seed.agg(count(col(checkCols.head)),
        checkCols.tail.map(c => count(col(c))): _*).collect()(0)
      val nullable = checkCols.zipWithIndex
        .map { case (c, i) => (c, n.toLong - nnRow.getLong(i)) }
        .filter(_._2 > 0)
      require(nullable.isEmpty,
        "fitLogReg: NULL cells in seed columns " +
          nullable.map { case (c, k) => s"$c($k rows)" }.mkString(", ") +
          " — every feature/label must be non-null (n counts every row)")
      var w = Array.fill(featureCols.length + 1)(0.0)
      for (_ <- 1 to rounds) {
        val z = margin(w.toSeq, featureCols.map(col))
        // residual on the 6dp grid; the grid is what makes the decimal
        // sums exact and the fit order-independent
        val r = round((lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))) - col(labelCol), 6)
        val gradCells =
          sum(r.cast(DecimalType(18, 6))).as("g0") +:
            featureCols.zipWithIndex.map { case (c, i) =>
              sum(round(r * col(c), 6).cast(DecimalType(18, 6))).as(s"g${i + 1}")
            }
        // the (d+1)-value gradient lift — bounded by the feature
        // contract, the protocol's only per-round driver action
        val row = seed.agg(gradCells.head, gradCells.tail: _*).collect()(0)
        w = w.indices.map { j =>
          r6(w(j) - lr * (row.getDecimal(j).doubleValue() / n))
        }.toArray
      }
      w
    } finally { seed.unpersist(); () }
  }
}
