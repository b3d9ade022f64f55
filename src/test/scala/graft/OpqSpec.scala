package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PQ, Pca, Similarity}
import graft.sources.VectorStore

class OpqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("eigenAllocation is a permutation and snake-balances a linear spectrum exactly") {
    val diag = (0 until 64).map(i => (64 - i).toDouble)
    val perm = PQ.eigenAllocation(diag)
    assert(perm.sorted === (1 to 64), "must be a permutation of 1..64")
    val sums = perm.grouped(PQ.SubDim).toSeq.map(_.map(d => diag(d - 1)).sum)
    assert(sums.distinct.size === 1,
      s"snake allocation must balance a linear spectrum exactly: $sums")
    // every subspace gets exactly one rank from each round of 8
    val rankOf = perm.map(d => diag.indexWhere(_ == diag(d - 1)))
    assert(rankOf.grouped(PQ.SubDim).forall(g => g.map(_ / PQ.M).sorted == (0 until 8)))
  }

  private def withRank(df: org.apache.spark.sql.DataFrame, q: Long) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    df.withColumn("qid", lit(q)).withColumn("rank", row_number().over(w))
  }

  private def meanRecall(assigned: org.apache.spark.sql.DataFrame,
                         cents: Seq[Similarity.Centroid],
                         exact: org.apache.spark.sql.DataFrame,
                         nq: Int, nProbe: Int, poolSize: Int,
                         perm: Option[Seq[Int]]): Double = {
    val approx = (0L until nq.toLong).map { q =>
      withRank(PQ.ivfPqTopK(assigned, cents, q, k = 10, nProbe = nProbe,
        poolSize = poolSize, perm = perm), q)
    }.reduce(_ unionByName _)
    Similarity.retrievalEval(approx, exact, k = 10)
      .agg(avg(col("recall"))).head().getDouble(0)
  }

  test("crafted variance-skewed corpus: the OPQ rotation strictly beats contiguous split") {
    // all the variance lives in dims 1..8 as INDEPENDENT deterministic
    // pseudo-noise (no cluster structure — intrinsic dimension 8),
    // dims 9..64 are near-zero: the contiguous split asks ONE 32-word
    // codebook to cover an 8-dim cube (curse of dimensionality) while
    // 7 codebooks quantize nothing; eigen-allocation gives every
    // subspace one strong dim — effectively scalar quantization —
    // which is exactly the regime Ge et al.'s allocation exists for
    val vecs = (0 until 300).map { i =>
      val v = Array.tabulate(64) { j0 =>
        val j = j0 + 1
        if (j0 < 8) (((i * 131 + j * 197 + i * i * (j + 13)) % 101) - 50) * 0.04
        else ((i * 29 + j * 31) % 9 - 4) * 0.01
      }
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val p = Similarity.prepared(emb)
    val cents = Similarity.collectCentroids(p, 16)
    val assigned = p.withColumn("cell",
      Similarity.bestCell(cents).cast("int")).persist()
    try {
      val nq = 8
      val qs = p.filter(col("vec_id") < nq)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
      val exact = Similarity.knnJoin(p.select("vec_id", "v", "norm"), qs,
        k = 10, knownQueryCount = Some(nq.toLong))
      val perm = PQ.eigenAllocation(Pca.fit(emb, dims = 64, k = 1).diag.toSeq)
      // tight pool + exhaustive probes: the ADC code ranking alone
      // decides the pool, so recall reads pure quantization quality
      val plain = meanRecall(assigned, cents, exact, nq, 16, 12, None)
      val opq = meanRecall(assigned, cents, exact, nq, 16, 12, Some(perm))
      assert(opq > plain,
        s"eigen-allocation must beat the contiguous split on a skewed " +
          s"spectrum: plain=$plain opq=$opq")
    } finally { assigned.unpersist(); () }
  }

  test("real fixture at the SHIPPED parameters (nProbe 4, pool 12): OPQ recall >= plain") {
    // this corpus is near-isotropic (top-8 PCA directions ≈ 20% of
    // variance; natural 8-dim blocks already balanced — measured), so
    // the rotation gain is small; the assertion is the VERDICT's ≥ at
    // exactly the parameters q_ann_opq registers (pool 12 — the tight
    // pool that makes the rotated ADC ranking decide the output), plus
    // a wide-pool sanity row. Measured at pin time: pool 12 plain
    // 0.4125 / opq 0.4375; pool 100 both ≈ 0.84 (re-rank saturates).
    val dir = "/root/testdata/sf0.01"
    val (assigned, cents) = VectorStore.ivf(spark, dir, nCells = 16, iters = 2)
    val vs = VectorStore.vectors(spark, dir).select("vec_id", "v", "norm")
    val perm = PQ.eigenAllocation(
      Pca.fit(spark.read.parquet(s"$dir/embeddings.parquet"), dims = 64, k = 1)
        .diag.toSeq)
    val nq = 8
    val qs = vs.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
    val exact = Similarity.knnJoin(vs, qs, k = 10, knownQueryCount = Some(nq.toLong))
    val plain12 = meanRecall(assigned, cents, exact, nq, 4, 12, None)
    val opq12 = meanRecall(assigned, cents, exact, nq, 4, 12, Some(perm))
    assert(opq12 >= plain12,
      s"OPQ must not lose recall at the shipped pool-12 config: " +
        s"plain=$plain12 opq=$opq12")
    assert(opq12 > 0.3, s"shipped-config recall unusably low: $opq12")
    // wide pool: the exact re-rank absorbs code noise — both configs
    // must recover to usable recall
    val opq100 = meanRecall(assigned, cents, exact, nq, 4, 100, Some(perm))
    assert(opq100 > 0.5, s"wide-pool recall unusably low: $opq100")
  }
}
