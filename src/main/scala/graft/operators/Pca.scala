package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Top principal component of an embedding corpus — covariance via ONE
  * distributed Gram/moment pass, then QUANTIZED POWER ITERATION on the
  * driver (the dimensionality diagnostic a pipeline runs before
  * whitening, PQ subspace design, or spectral outlier screens; the same
  * Gramian-then-driver split as Spark MLlib's
  * `RowMatrix.computePrincipalComponents`, whose Gramian is also one
  * distributed pass into a driver-local d×d solve).
  *
  * SCALE SHAPE: the corpus-proportional work is one `mapPartitions`
  * pass accumulating the d(d+1)/2 pair sums PARTITION-LOCALLY (the
  * treeAggregate/Gramian shape — d² state per task, rows never widen),
  * then one tiny exchange of #partitions × d² partial rows. Everything
  * after runs on the driver over the d×d matrix — bounded by the
  * DIMENSION contract (d = 64 here; the k-means-centroid-lift role),
  * never by corpus size. The first cut built the pairs as a per-row
  * `transform`/`flatten` HOF explode: 2 080 interpreted struct
  * allocations per vector (HOFs are CodegenFallback) and a 10M-row
  * exchange — measured 7.5–9 s at sf0.1; this accumulator form is the
  * same answer bit-for-bit at well under a second.
  *
  * DETERMINISM (the Lloyd/PageRank cross-engine protocol): elements
  * quantize to the 6dp grid (exact Long micro-units; products exact in
  * Long, spilled to BigDecimal every 64 rows so no magnitude ever
  * approaches overflow), so every corpus-order-dependent sum is EXACT
  * and partitioning-invariant; the covariance quantizes to 6dp doubles;
  * each power-iteration step multiplies 6dp decimals EXACTLY,
  * renormalizes through one IEEE sqrt/divide, and re-quantizes to 6dp.
  * Fixed iteration count, a deterministic start basis (max-variance
  * dim, min-index tie-break) and a deterministic sign convention
  * (largest-|loading| dim positive) make the 8-round output identical
  * on any engine and any partitioning — convergence is a quality
  * property (spec-checked), not a correctness precondition.
  */
object Pca {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** @param embeddings relation with an `embedding` Array[Float] column
    * @param dims       the embedding dimension (schema contract)
    * @param iters      fixed power-iteration rounds
    */
  def topComponent(embeddings: DataFrame, dims: Int, iters: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val nPair = dims * (dims + 1) / 2
    val total = nPair + dims + 1 // pair sums ++ element sums ++ count

    // flat index layout: [0, nPair) upper-tri (i ≤ j) row-major pair
    // sums (scale 12); [nPair, nPair+dims) element sums (scale 6); last
    // slot the row count (scale 0). float inputs widen exactly, so a
    // float corpus and its double-valued store twin quantize identically
    val partials = embeddings
      .select(col("embedding").cast("array<double>").as("embedding"))
      .as[Array[Double]]
      .mapPartitions { it =>
        val hi = Array.fill(total)(java.math.BigDecimal.ZERO)
        val lo = new Array[Long](total)
        val q = new Array[Long](dims)
        var window = 0
        def spill(): Unit = {
          var k = 0
          while (k < total) {
            if (lo(k) != 0L) {
              val scale = if (k < nPair) 12 else if (k < nPair + dims) 6 else 0
              hi(k) = hi(k).add(java.math.BigDecimal.valueOf(lo(k), scale))
              lo(k) = 0L
            }
            k += 1
          }
          window = 0
        }
        it.foreach { v =>
          require(v.length == dims, s"embedding of ${v.length} dims, expected $dims")
          var i = 0
          while (i < dims) {
            // the same 6dp half-up grid as SQL round(x, 6), in exact
            // Long micro-units (throws past ~9e12 — far beyond any
            // embedding magnitude; loud, not silent)
            q(i) = BigDecimal(v(i))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .underlying.unscaledValue.longValueExact()
            i += 1
          }
          var k = 0
          i = 0
          while (i < dims) {
            lo(nPair + i) += q(i)
            var j = i
            while (j < dims) {
              lo(k) += q(i) * q(j) // |q| ≤ 1e8-ish ⇒ product ≤ 1e16, 64-row window safe
              k += 1
              j += 1
            }
            i += 1
          }
          lo(total - 1) += 1L
          window += 1
          if (window == 64) spill()
        }
        spill()
        Iterator.range(0, total).filter(k => hi(k).signum != 0 || k == total - 1)
          .map(k => (k, hi(k)))
      }
    val moments = partials.toDF("k", "m")
      .groupBy("k").agg(sum(col("m")).as("m"))
      .collect() // ≤ d(d+1)/2 + d + 1 rows — bounded by the dims contract
      .map(r => r.getInt(0) -> r.getDecimal(1)).toMap
      .withDefaultValue(java.math.BigDecimal.ZERO)

    val n = moments(total - 1).doubleValue()
    require(n > 0, "PCA over an empty relation")
    val s = Array.tabulate(dims)(i => moments(nPair + i).doubleValue())
    def pairIdx(i: Int, j: Int): Int = {
      // row-major upper-tri offset for row i: i*dims - i*(i-1)/2
      val (a, b) = (math.min(i, j), math.max(i, j))
      a * dims - a * (a - 1) / 2 + (b - a)
    }
    // covariance, quantized to the 6dp grid shared with the oracle text
    val c = Array.tabulate(dims, dims) { (a, b) =>
      r6((moments(pairIdx(a, b)).doubleValue() - s(a) * s(b) / n) / n)
    }

    // deterministic start: basis vector of the max-variance dimension
    val start = (0 until dims).maxBy(i => (c(i)(i), -i))
    var v = Array.tabulate(dims)(i => if (i == start) 1.0 else 0.0)
    var lambda = 0.0
    for (_ <- 1 to iters) {
      // exact decimal mat-vec: 6dp × 6dp products summed exactly
      val w = Array.tabulate(dims) { i =>
        var acc = java.math.BigDecimal.ZERO
        var j = 0
        while (j < dims) {
          acc = acc.add(java.math.BigDecimal.valueOf(c(i)(j))
            .multiply(java.math.BigDecimal.valueOf(v(j))))
          j += 1
        }
        r6(acc.doubleValue())
      }
      var nrm2 = java.math.BigDecimal.ZERO
      w.foreach { x =>
        val d = java.math.BigDecimal.valueOf(x)
        nrm2 = nrm2.add(d.multiply(d))
      }
      lambda = math.sqrt(nrm2.doubleValue())
      if (lambda > 0) v = w.map(x => r6(x / lambda))
      // a zero-variance corpus keeps the start basis — still deterministic
    }
    // sign convention: the largest-|loading| dimension reads positive
    val anchor = (0 until dims).maxBy(i => (math.abs(v(i)), -i))
    if (v(anchor) < 0) v = v.map(x => r6(-x))

    val trace = {
      var t = java.math.BigDecimal.ZERO
      (0 until dims).foreach(i => t = t.add(java.math.BigDecimal.valueOf(c(i)(i))))
      t.doubleValue()
    }
    val rows = (0 until dims).map(i => Row(
      (i + 1).toLong, c(i)(i), v(i), r6(lambda), r6(lambda / trace)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("dim", LongType, nullable = false),
        StructField("variance", DoubleType, nullable = false),
        StructField("loading", DoubleType, nullable = false),
        StructField("eig", DoubleType, nullable = false),
        StructField("explained", DoubleType, nullable = false))))
  }
}
