package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Principal components of an embedding corpus — covariance via ONE
  * distributed Gram/moment pass, then QUANTIZED POWER ITERATION WITH
  * DEFLATION on the driver (the dimensionality step a pipeline runs
  * before whitening, PQ subspace design, or spectral outlier screens;
  * the same Gramian-then-driver split as Spark MLlib's
  * `RowMatrix.computePrincipalComponents`, whose Gramian is also one
  * distributed pass into a driver-local d×d solve).
  *
  * SCALE SHAPE: the corpus-proportional work is one `mapPartitions`
  * pass accumulating the d(d+1)/2 pair sums PARTITION-LOCALLY (the
  * treeAggregate/Gramian shape — d² state per task, rows never widen),
  * then one tiny exchange of #partitions × d² partial rows. Everything
  * after — including all k deflation rounds — runs on the driver over
  * the d×d matrix, bounded by the DIMENSION contract (d = 64 here),
  * never by corpus size. The first cut built the pairs as a per-row
  * `transform`/`flatten` HOF explode: 2 080 interpreted struct
  * allocations per vector (HOFs are CodegenFallback) and a 10M-row
  * exchange — measured 7.5–9 s at sf0.1; this accumulator form is the
  * same answer bit-for-bit at well under a second.
  *
  * DETERMINISM (the Lloyd/PageRank cross-engine protocol): elements
  * quantize to the 6dp grid (exact Long micro-units; products exact in
  * Long, spilled to BigDecimal every 64 rows, with a LOUD ±300
  * magnitude guard so no input can wrap the window), so every
  * corpus-order-dependent sum is EXACT and partitioning-invariant; the
  * covariance quantizes to 6dp doubles; each power-iteration step
  * multiplies 6dp decimals EXACTLY, renormalizes through one IEEE
  * sqrt/divide, and re-quantizes to 6dp. Fixed iteration count, a
  * deterministic start basis (max-variance dim, min-index tie-break)
  * and a deterministic sign convention (largest-|loading| dim
  * positive) make the output identical on any engine and any
  * partitioning — convergence is a quality property (spec-checked),
  * not a correctness precondition. DEFLATION stays on the same grid:
  * C ← round6(C − λ₆ v vᵀ) with the product taken in exact decimals,
  * so every later component is as engine-portable as the first.
  */
object Pca {

  private def r6(x: Double): Double = graft.util.Num.r6(x)

  /** One fitted component: 6dp loadings (sign convention applied),
    * the 6dp eigenvalue estimate, and its share of the ORIGINAL trace.
    */
  private[graft] final case class Component(
      v: Array[Double], eig: Double, explained: Double)

  /** Driver-resident model: corpus size, 6dp per-dimension means, the
    * ORIGINAL covariance diagonal, and the k deflated components — all
    * bounded by the dims/k contract, never by corpus size.
    */
  private[graft] final case class Model(
      n: Double, means: Array[Double], diag: Array[Double],
      comps: Seq[Component])

  /** The ONE corpus pass: exact 6dp-quantized moment sums → the 6dp
    * covariance matrix + element sums + count on the driver.
    */
  private def moments(embeddings: DataFrame, dims: Int)
      : (Double, Array[Double], Array[Array[Double]]) = {
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
            // Long micro-units
            q(i) = BigDecimal(v(i))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .underlying.unscaledValue.longValueExact()
            // r16 ADVICE: the 64-row spill window is only exact while
            // 64·q(i)·q(j) fits a Long — guard the element magnitude
            // (3e8 micro-units = |x| ≤ 300) so an out-of-contract
            // corpus fails LOUDLY instead of silently wrapping
            require(math.abs(q(i)) <= 300000000L,
              s"embedding element ${v(i)} exceeds the ±300 magnitude " +
                "contract (pair-product accumulator would overflow)")
            i += 1
          }
          var k = 0
          i = 0
          while (i < dims) {
            lo(nPair + i) += q(i)
            var j = i
            while (j < dims) {
              lo(k) += q(i) * q(j) // guarded |q| ≤ 3e8 ⇒ 64·product ≤ 5.8e18 < Long.Max
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
    val m = partials.toDF("k", "m")
      .groupBy("k").agg(sum(col("m")).as("m"))
      .collect() // ≤ d(d+1)/2 + d + 1 rows — bounded by the dims contract
      .map(r => r.getInt(0) -> r.getDecimal(1)).toMap
      .withDefaultValue(java.math.BigDecimal.ZERO)

    val n = m(total - 1).doubleValue()
    require(n > 0, "PCA over an empty relation")
    val s = Array.tabulate(dims)(i => m(nPair + i).doubleValue())
    def pairIdx(i: Int, j: Int): Int = {
      // row-major upper-tri offset for row i: i*dims - i*(i-1)/2
      val (a, b) = (math.min(i, j), math.max(i, j))
      a * dims - a * (a - 1) / 2 + (b - a)
    }
    // covariance, quantized to the 6dp grid shared with the oracle text
    val c = Array.tabulate(dims, dims) { (a, b) =>
      r6((m(pairIdx(a, b)).doubleValue() - s(a) * s(b) / n) / n)
    }
    (n, s, c)
  }

  /** Fixed-round power iteration on the 6dp grid (sign convention
    * applied): the dominant eigenpair of `c`, identical on any engine.
    */
  private def iterate(c: Array[Array[Double]], dims: Int, iters: Int)
      : (Array[Double], Double) = {
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
    (v, lambda) // RAW λ — callers round where the oracle rounds
  }

  /** Fit the top-k components by DEFLATION: extract the dominant
    * eigenpair, subtract λ₆ v vᵀ on the exact-decimal 6dp grid, repeat.
    * (v vᵀ is sign-invariant, so the sign convention never perturbs the
    * deflated matrix.) Explained shares always read against the
    * ORIGINAL trace.
    */
  private[graft] def fit(embeddings: DataFrame, dims: Int, k: Int,
                         iters: Int = 8): Model = {
    val (n, s, c0) = moments(embeddings, dims)
    val trace = {
      var t = java.math.BigDecimal.ZERO
      (0 until dims).foreach(i => t = t.add(java.math.BigDecimal.valueOf(c0(i)(i))))
      t.doubleValue()
    }
    var c = c0
    val comps = (1 to k).map { m =>
      val (v, lamRaw) = iterate(c, dims, iters)
      // rank-deficiency is LOUD on the deflation path (k > 1): a zero
      // eigenvalue means the corpus spans fewer than m directions at
      // the 6dp grid — the engine would keep the start basis while the
      // oracle's round(w / nrm, 6) divides 0/0 into NaN, and whitening
      // would divide by √0. (k = 1 keeps the legacy zero-variance
      // contract: deterministic basis output, eig 0.)
      require(k == 1 || r6(lamRaw) > 0,
        s"rank-deficient corpus: component $m has zero eigenvalue at the " +
          s"6dp grid — reduce k below $m")
      // deflate with the 6dp λ (the grid the oracle can mirror); the
      // REPORTED eig/explained round from the raw norm exactly as the
      // oracle's round(nrm, 6) / round(nrm / trace, 6) do
      val lamD = java.math.BigDecimal.valueOf(r6(lamRaw))
      val prev = c
      c = Array.tabulate(dims, dims) { (i, j) =>
        r6(java.math.BigDecimal.valueOf(prev(i)(j))
          .subtract(lamD
            .multiply(java.math.BigDecimal.valueOf(v(i)))
            .multiply(java.math.BigDecimal.valueOf(v(j))))
          .doubleValue())
      }
      Component(v, r6(lamRaw), r6(lamRaw / trace))
    }
    Model(n, Array.tabulate(dims)(i => r6(s(i) / n)),
      Array.tabulate(dims)(i => c0(i)(i)), comps)
  }

  /** @param embeddings relation with an `embedding` Array[Float] column
    * @param dims       the embedding dimension (schema contract)
    * @param iters      fixed power-iteration rounds
    */
  def topComponent(embeddings: DataFrame, dims: Int, iters: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    val m = fit(embeddings, dims, k = 1, iters)
    val comp = m.comps.head
    val rows = (0 until dims).map(i => Row(
      (i + 1).toLong, m.diag(i), comp.v(i), comp.eig, comp.explained))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("dim", LongType, nullable = false),
        StructField("variance", DoubleType, nullable = false),
        StructField("loading", DoubleType, nullable = false),
        StructField("eig", DoubleType, nullable = false),
        StructField("explained", DoubleType, nullable = false))))
  }

  /** Top-k components via deflation, one row per (component, dim). */
  def topComponents(embeddings: DataFrame, dims: Int, k: Int,
                    iters: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    val m = fit(embeddings, dims, k, iters)
    val rows = for {
      (comp, ci) <- m.comps.zipWithIndex
      i <- 0 until dims
    } yield Row((ci + 1).toLong, (i + 1).toLong, comp.v(i), comp.eig, comp.explained)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("comp", LongType, nullable = false),
        StructField("dim", LongType, nullable = false),
        StructField("loading", DoubleType, nullable = false),
        StructField("eig", DoubleType, nullable = false),
        StructField("explained", DoubleType, nullable = false))))
  }

  /** WHITENING projection: z_m = round6( Σᵢ (x₆ᵢ − μ₆ᵢ)·vₘᵢ / √λₘ ) per
    * vector — the step pipelines run before PQ subspace design or
    * SemDeDup (the SemDeDup paper whitens first). The model rides each
    * task as a broadcast-sized k·d literal; the projection itself is a
    * SHUFFLE-FREE per-row map (`mapPartitions`), every dot product in
    * exact decimals over the shared 6dp grid, so the output is
    * partitioning-invariant and oracle-mirrorable. Output: (vec_id,
    * z array of k 6dp doubles).
    */
  def whiten(embeddings: DataFrame, model: Model, dims: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    model.comps.foreach(c =>
      require(c.eig > 0, "whitening needs strictly positive eigenvalues"))
    val mu = model.means
    val comps = model.comps.map(_.v).toArray
    val roots = model.comps.map(c => math.sqrt(c.eig)).toArray
    embeddings
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>").as("embedding"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val muD = mu.map(java.math.BigDecimal.valueOf)
        val compD = comps.map(_.map(java.math.BigDecimal.valueOf))
        it.map { case (id, x) =>
          require(x.length == dims, s"embedding of ${x.length} dims, expected $dims")
          val x6 = x.map(e => java.math.BigDecimal.valueOf(r6(e)))
          val z = Array.tabulate(comps.length) { m =>
            var acc = java.math.BigDecimal.ZERO
            var i = 0
            while (i < dims) {
              acc = acc.add(x6(i).subtract(muD(i)).multiply(compD(m)(i)))
              i += 1
            }
            r6(acc.doubleValue() / roots(m))
          }
          (id, z)
        }
      }
      .toDF("vec_id", "z")
  }
}
