package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric distance computation (ADC)
  * — the third classic ANN family next to sign-LSH buckets and IVF
  * cells (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): vectors are cut into M subvectors, each
  * quantized against a per-subspace codebook of K codewords, so a
  * 64-dim float vector compresses to M small codes; a query scores a
  * candidate WITHOUT touching its floats by summing per-subspace
  * query×codeword dot products looked up by the candidate's codes.
  * At 100 TB this is the memory-side lever: the scan ranks codes
  * (M bytes/vector) and only the top `poolSize` candidates are
  * re-ranked against their real vectors.
  *
  * Determinism (the engine's oracle-portability contract): codebooks
  * are the subvectors of the first K vectors (the `q_ann_ivf`
  * deterministic-quantizer precedent — a deployment would Lloyd-train
  * them like `VectorStore.ivf(iters=2)` does for cells); code
  * assignment breaks distance ties by codeword id; the ADC estimate
  * sums per-subspace dots through DECIMAL(18,6) so the total is exact
  * and ADDITION-ORDER-INDEPENDENT (the `q_lm_score` rule — a double
  * SUM hash-diverges between engines on aggregation order); every
  * float compare is 6-dp rounded. The DuckDB oracle mirrors each step.
  *
  * All vectors are L2-normalized first, so inner product IS cosine and
  * the ADC estimate approximates the true cosine directly.
  */
object PQ {

  val M = 8        // subspaces
  val SubDim = 8   // dims per subspace (fixture vectors are 64-dim)
  val K = 32       // codewords per subspace

  private def dot(a: Column, b: Column): Column = graft.plans.DotF64.dotF64(a, b)

  /** (vec_id, vn) with vn = v / ||v|| — from a `Similarity.prepared`
    * relation (vec_id, v, norm).
    */
  private[graft] def normalized(p: DataFrame): DataFrame =
    p.select(col("vec_id"), transform(col("v"), x => x / col("norm")).as("vn"))

  /** (vec_id, m, sub): the M subvectors of every normalized vector. */
  private[graft] def subvectors(pn: DataFrame): DataFrame =
    pn.select(col("vec_id"), explode(array((0 until M).map(m =>
        struct(lit(m).as("m"), slice(col("vn"), m * SubDim + 1, SubDim).as("sub"))): _*)).as("e"))
      .select(col("vec_id"), col("e.m").as("m"), col("e.sub").as("sub"))

  /** The deterministic codebook: per subspace, the subvectors of
    * vec_id < K as codewords (m, cent_id, cw). K×M rows — broadcast
    * scale by construction.
    */
  private[graft] def codebook(subs: DataFrame): DataFrame =
    subs.filter(col("vec_id") < K)
      .select(col("m"), col("vec_id").as("cent_id"), col("sub").as("cw"))

  /** Encode every vector: nearest codeword per subspace by squared L2
    * distance (computed as ss + cc − 2·sc over codegen'd `dot_f64`,
    * 6-dp rounded for the tie-stable compare), id tie-break. The
    * codebook side is broadcast; the window partitions are (vector,
    * subspace) — data-sized parallelism.
    */
  private[graft] def encode(subs: DataFrame, cb: DataFrame): DataFrame = {
    val dist = round(
      dot(col("sub"), col("sub")) + dot(col("cw"), col("cw"))
        - lit(2) * dot(col("sub"), col("cw")), 6)
    val w = Window.partitionBy("vec_id", "m").orderBy(col("_dist"), col("cent_id"))
    subs.join(broadcast(cb), Seq("m"))
      .withColumn("_dist", dist)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("vec_id"), col("m"), col("cent_id").as("code"))
  }

  /** IVF-PQ with residual encoding (Jégou et al. §IV — the
    * billion-scale composition FAISS ships as IndexIVFPQ): the coarse
    * quantizer's cell explains most of a vector's direction, so PQ
    * encodes only the RESIDUAL r = vn − ĉ(cell) (normalized vector
    * minus normalized centroid), which quantizes far better than the
    * raw vector; a query probes nProbe cells and scores their members
    * as q·vn ≈ q·ĉ(cell) + ADC(q, codes(r)) — the per-cell coarse term
    * plus the code-table lookup, floats touched only for the re-rank
    * pool.
    *
    * Scale shape: candidates come from the probed cells of the
    * cell-PARTITIONED store (planning-time directory pruning), the
    * shared residual codebook + query dot-table + per-cell coarse terms
    * are all K×M / nProbe-sized broadcasts, and the ADC sum is the same
    * DECIMAL(18,6) order-independent aggregate as flat PQ. A deployment
    * precomputes the code table store-side; here candidates encode at
    * query time (probed-cell-bounded work).
    *
    * Determinism: one GLOBAL residual codebook from the residual
    * subvectors of vec_id < K (deterministic, like flat PQ — FAISS also
    * shares one PQ codebook across cells); every float compare is 6-dp
    * rounded; probe selection reuses the trained-IVF tie-break.
    */
  /** OPQ eigenvalue-allocation rotation (Ge et al., "Optimized Product
    * Quantization", CVPR 2013, §4 parametric form): a variance-
    * BALANCING permutation of the coordinates — a SNAKE (boustrophedon)
    * allocation of the variance-ranked dims (descending variance,
    * dim-index tie-break): round s deals ranks to subspaces 0..M-1 in
    * forward order when s is even and backward when odd, so no
    * subspace hoards the energy and the per-subspace codebooks share
    * the quantization load. A
    * permutation is the member of the orthogonal group the oracle can
    * mirror EXACTLY (a dense learned rotation would unroll d power-
    * iteration chains into the CTE mirror); on this corpus a dense
    * rotation has nothing further to add anyway — the spectrum is
    * near-isotropic (top-8 PCA directions hold ~20% of total variance,
    * measured at sf0.01), so energy balancing IS the parametric-OPQ
    * lever. Input: `Pca.Model.diag` (the 6dp covariance diagonal — one
    * Gramian corpus pass); output: the 1-based source dim for each
    * rotated position.
    */
  def eigenAllocation(diag: Seq[Double]): Seq[Int] = {
    require(diag.length == M * SubDim,
      s"eigenAllocation expects ${M * SubDim} dims, got ${diag.length}")
    val ranked = diag.zipWithIndex.sortBy { case (v, i) => (-v, i) }.map(_._2 + 1)
    // SNAKE (boustrophedon) allocation — what greedy balancing reduces
    // to on a sorted sequence: round s hands ranks out forward when s
    // is even, backward when odd, so for any linearly-varying spectrum
    // the per-subspace sums balance EXACTLY (OpqSpec pins it)
    (0 until diag.length).map { j =>
      val m = j / SubDim
      val s = j % SubDim
      val pos = if (s % 2 == 0) m else M - 1 - m
      ranked(s * M + pos)
    }
  }

  /** @param perm OPQ rotation (`eigenAllocation`): applied to the
    *             RESIDUALS before the subspace split and to the query
    *             vector feeding the ADC table — never to the coarse
    *             term or the exact re-rank, which stay in the original
    *             basis (a permutation preserves every inner product, so
    *             q·res = perm(q)·perm(res) holds exactly).
    */
  def ivfPqTopK(assigned: DataFrame, cents: Seq[Similarity.Centroid],
                queryId: Long, k: Int, nProbe: Int = 4,
                poolSize: Int = 100, perm: Option[Seq[Int]] = None): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    def rotate(c: Column): Column =
      perm.fold(c)(p => array(p.map(i => element_at(c, lit(i))): _*))
    // normalized vectors with their cell
    val pn = assigned.select(col("vec_id"),
      transform(col("v"), x => x / col("norm")).as("vn"), col("cell"))
    // normalized centroids — nCells rows, broadcast
    val centDf = cents.map(c => (c.id, c.cv.map(_ / c.cn).toSeq))
      .toDF("cell", "cnv")
    // residuals of every vector against its own cell's centroid
    val res = pn.join(broadcast(centDf), "cell")
      .select(col("vec_id"), col("cell"),
        rotate(zip_with(col("vn"), col("cnv"), (a, b) => a - b)).as("vn"))
    val subs = subvectors(res.select("vec_id", "vn"))
    val cb = codebook(subs) // residual codewords, vec_id < K, all cells
    // probe cells: the query's nProbe best cells by the SAME rounded
    // cosine + cent_id tie-break the trained-IVF rank uses
    val probeCells = Similarity.probeCellsFor(assigned, cents, queryId, nProbe)
    val cand = assigned
      .filter(col("cell").isin(probeCells.map(_.toInt): _*))
      .filter(col("vec_id") =!= queryId)
    val codes = encode(subs.join(cand.select("vec_id"), "vec_id"), cb)
    // global ADC table: query (full normalized) subvectors × residual
    // codewords — K×M rows
    val qsubs = subvectors(pn.filter(col("vec_id") === queryId)
      .select(col("vec_id"), rotate(col("vn")).as("vn")))
    val qd = cb.join(qsubs.select(col("m"), col("sub").as("qsub")), Seq("m"))
      .select(col("m"), col("cent_id"), round(dot(col("qsub"), col("cw")), 6).as("qdot"))
    // per-probed-cell coarse term q·ĉ
    val q = pn.filter(col("vec_id") === queryId).select(col("vn").as("qvn"))
    val qcoarse = centDf.filter(col("cell").isin(probeCells.map(_.toInt): _*))
      .crossJoin(broadcast(q))
      .select(col("cell"), round(dot(col("cnv"), col("qvn")), 6).as("qc"))
    val est = codes
      .join(broadcast(qd), codes("m") === qd("m") && codes("code") === qd("cent_id"))
      .groupBy(codes("vec_id"))
      .agg(sum(col("qdot").cast("decimal(18,6)")).cast("double").as("sumr"))
      .join(cand.select("vec_id", "cell"), "vec_id")
      .join(broadcast(qcoarse), "cell")
      .select(col("vec_id"), (col("qc") + col("sumr")).as("est"))
    val pool = est.orderBy(col("est").desc, col("vec_id")).limit(poolSize)
      .select("vec_id")
    val qrow = assigned.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("norm").as("qn"))
    assigned.join(pool, Seq("vec_id"))
      .crossJoin(broadcast(qrow))
      .select(col("vec_id"),
        round(dot(col("v"), col("qv")) / (col("norm") * col("qn")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Top-k by PQ-ADC with exact re-rank: rank ALL candidates by the
    * code-table estimate, keep `poolSize`, re-rank the pool by exact
    * cosine, return (vec_id, sim). `poolSize` bounds the float-touching
    * work; recall is pinned by spec (`PQSpec`), not assumed.
    */
  def pqTopK(p: DataFrame, queryId: Long, k: Int, poolSize: Int = 100): DataFrame = {
    val pn = normalized(p)
    val subs = subvectors(pn)
    val cb = codebook(subs)
    val codes = encode(subs.filter(col("vec_id") =!= queryId), cb)
    // ADC table: per (subspace, codeword), the query-subvector dot —
    // K×M rows, broadcast
    val qd = cb.join(
        subs.filter(col("vec_id") === queryId)
          .select(col("m"), col("sub").as("qsub")), Seq("m"))
      .select(col("m"), col("cent_id"),
        round(dot(col("qsub"), col("cw")), 6).as("qdot"))
    // exact order-independent sum of the M rounded dots per candidate
    val est = codes
      .join(broadcast(qd),
        codes("m") === qd("m") && codes("code") === qd("cent_id"))
      .groupBy(codes("vec_id"))
      .agg(sum(col("qdot").cast("decimal(18,6)")).cast("double").as("est"))
    val pool = est.orderBy(col("est").desc, col("vec_id")).limit(poolSize)
      .select("vec_id")
    // exact cosine re-rank of the pool only
    val q = p.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("norm").as("qn"))
    p.join(pool, Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("v"), col("qv")) / (col("norm") * col("qn")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
