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
