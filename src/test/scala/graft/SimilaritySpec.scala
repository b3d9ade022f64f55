package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4-dim toy embeddings: v1 ∥ v0 (scaled), v2 orthogonal, v3 opposite,
  // v4 in another sign bucket close to v2.
  private lazy val emb = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(2f, 0f, 0f, 0f), 0),
    (2L, Array(0f, 1f, 0f, 0f), 1),
    (3L, Array(-1f, 0f, 0f, 0f), 2),
    (4L, Array(0f, 1f, 0.1f, 0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("brute-force cosine topK ranks by similarity with vec_id tie-break") {
    val r = Similarity.topK(emb, queryId = 0L, k = 3)
      .as[(Long, Double)].collect()
    assert(r.map(_._1).toSeq === Seq(1L, 2L, 4L)) // cos: 1.0, 0.0, 0.0 (tie → id)
    assert(r.head._2 === 1.0)
    assert(r(1)._2 === 0.0)
  }

  test("sign-bucket ANN compares only within buckets") {
    // bits=2 buckets: v0,v1 → "11" (dims 1,2 ≥ 0? dim2=0 → '1'); v3 → "01"
    val nn = Similarity.annNearestNeighbor(emb, bits = 2)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // v2 and v4 share a bucket and are each other's nearest neighbours
    assert(nn(2L)._1 === 4L)
    assert(nn(4L)._1 === 2L)
    // v3 is alone in its bucket → no row
    assert(!nn.contains(3L))
  }

  test("ann similarity is the rounded double cosine") {
    val nn = Similarity.annNearestNeighbor(emb, bits = 2)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    val expected = BigDecimal(1.0 / math.sqrt(1.01))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(nn(2L) === expected)
  }

  test("dot_f64 / simhash_hex reject wrong-typed SQL arguments at analysis") {
    // both are session-registered SQL functions: without the input-type
    // check, array<float> passes analysis and ArrayData.getDouble reads
    // garbage bits at runtime
    Seq((Array(1f, 2f), Array("a", "b"))).toDF("vf", "vs")
      .createOrReplaceTempView("t_typed_args")
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT dot_f64(vf, vf) FROM t_typed_args").collect())
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT simhash_hex(vf) FROM t_typed_args").collect())
    // run_stats: array<string> required — a float array must fail at
    // analysis, not ClassCastException inside the generated code
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT run_stats(vf) FROM t_typed_args").collect())
    assert(spark.sql("SELECT run_stats(vs) FROM t_typed_args").count() === 1)
    // the declared types still pass
    assert(spark.sql(
      "SELECT dot_f64(transform(vf, x -> CAST(x AS DOUBLE)), " +
        "transform(vf, x -> CAST(x AS DOUBLE))) FROM t_typed_args").count() === 1)
    assert(spark.sql("SELECT simhash_hex(vs) FROM t_typed_args").count() === 1)
  }

  test("multi-probe ANN: a vector alone in its bucket gets a neighbor from a Hamming-1 bucket") {
    // single-probe: v3 ("01") is alone → no row (asserted above). Multi-
    // probe reaches "11" (v0, v1, v2, v4) and "00": the orthogonal v2/v4
    // (cosine 0.0) beat the opposite-direction v0/v1 (-1.0), id tie → v2.
    val nn = Similarity.annNearestNeighborMultiProbe(emb, bits = 2)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(nn(3L) === ((2L, 0.0)))
    // in-bucket pairs keep their single-probe answer unless an adjacent
    // bucket holds something closer: v2's bucket-mate v4 (cos ≈ 0.995)
    // still beats every Hamming-1 candidate
    assert(nn(2L)._1 === 4L)
  }

  test("multi-probe ANN: covers >= 0.9 of singleton-bucket vectors, never worse than single-probe") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.sources.Tables.tbl(spark, "/root/testdata/sf0.01", "embeddings")
    val single = Similarity.annNearestNeighbor(corpus, bits = 8)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    val multi = Similarity.annNearestNeighborMultiProbe(corpus, bits = 8)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    val all = corpus.select(col("vec_id")).as[Long].collect().toSet
    val orphans = all -- single.keySet
    assert(orphans.nonEmpty, "fixture has no singleton-bucket vectors; recall case is vacuous")
    val covered = orphans.count(multi.contains)
    assert(covered.toDouble / orphans.size >= 0.9,
      s"multi-probe covered $covered of ${orphans.size} singleton-bucket vectors")
    // candidate superset ⇒ the per-vector top-1 similarity can only improve
    for ((id, s) <- single) assert(multi(id) >= s, s"vec $id: multi ${multi(id)} < single $s")
  }

  test("trained IVF: recall >= 0.9 @ k=10 vs the exact brute-force answer") {
    val corpus = graft.sources.Tables.tbl(spark, "/root/testdata/sf0.01", "embeddings")
    val exact = Similarity.topK(corpus, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val trained = Similarity.ivfTopKTrained(corpus, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = exact.intersect(trained).size / 10.0
    assert(recall >= 0.9, s"recall $recall; exact=$exact trained=$trained")
  }

  test("PQ-ADC: recall >= 0.8 @ k=10 vs exact; codes well-formed; deterministic") {
    val corpus = graft.sources.Tables.tbl(spark, "/root/testdata/sf0.01", "embeddings")
    val p = Similarity.prepared(corpus)
    val exact = Similarity.topK(corpus, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val pq = graft.operators.PQ.pqTopK(p, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toSeq
    val recall = exact.intersect(pq.map(_._1).toSet).size / 10.0
    assert(recall >= 0.8, s"PQ recall $recall; exact=$exact pq=${pq.map(_._1)}")
    // sims in the output are the EXACT re-ranked cosines — any returned
    // vector that IS in the exact top-10 must carry the identical sim
    val exactSims = Similarity.topK(corpus, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toMap
    pq.filter(r => exactSims.contains(r._1))
      .foreach { case (id, sim) => assert(sim === exactSims(id)) }
    // codes: every (vector, subspace) has exactly one code in [0, K)
    val subs = graft.operators.PQ.subvectors(graft.operators.PQ.normalized(p))
    val codes = graft.operators.PQ.encode(subs, graft.operators.PQ.codebook(subs))
    val n = p.count()
    assert(codes.count() === n * graft.operators.PQ.M)
    assert(codes.filter(org.apache.spark.sql.functions.col("code") < 0 ||
      org.apache.spark.sql.functions.col("code") >= graft.operators.PQ.K).count() === 0)
    // determinism across partitionings
    val again = graft.operators.PQ.pqTopK(p.repartition(7), queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(again === pq)
  }

  test("semdedup: discards are exactly the vectors with a smaller-id cluster-mate above threshold") {
    val dir = "/root/testdata/sf0.001"
    val tau = 0.3
    val (assigned, _) = graft.sources.VectorStore.ivf(spark, dir, nCells = 16, iters = 2)
    val rows = graft.sources.VectorStore.semDedup(spark, dir, threshold = tau)
      .as[(Long, Long, Double, Long)].collect()
    // brute-force ground truth: every in-cell ordered pair above tau
    val vecs = assigned.select("vec_id", "v", "norm", "cell")
      .as[(Long, Seq[Double], Double, Int)].collect()
    def cos(a: (Long, Seq[Double], Double, Int), b: (Long, Seq[Double], Double, Int)) =
      BigDecimal(a._2.zip(b._2).map { case (x, y) => x * y }.sum / (a._3 * b._3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (for {
      a <- vecs; b <- vecs
      if a._4 == b._4 && a._1 < b._1
      s = cos(a, b) if s >= tau
    } yield (b._1, s)).groupBy(_._1)
      .map { case (id, ss) => id -> ((ss.map(_._2).max, ss.length.toLong)) }
    assert(rows.map(_._1).toSet === expect.keySet,
      s"discard set mismatch: got ${rows.map(_._1).toSet}, want ${expect.keySet}")
    rows.foreach { case (id, _, maxSim, nDups) =>
      assert((maxSim, nDups) === expect(id), s"witness mismatch for vec $id")
    }
    // completeness restated: the survivor set has no in-cell pair >= tau
    val discards = rows.map(_._1).toSet
    val survivors = vecs.filterNot(v => discards.contains(v._1))
    for (a <- survivors; b <- survivors if a._4 == b._4 && a._1 < b._1)
      assert(cos(a, b) < tau, s"surviving pair (${a._1},${b._1}) above threshold")
  }

  test("streamedIvf: version-keyed derivation rebuilds when the embed store changes") {
    val store = java.nio.file.Files.createTempDirectory("graft-embivf-").toString + "/store"
    def mk(ids: Seq[Long]) =
      ids.map(i => (i, Array.tabulate(8)(d => i.toFloat + d + 1f))).toDF("vec_id", "embedding")
    assert(graft.streaming.StreamingEmbed.processBatch(mk(0L until 20L), 0L, store))
    val first = graft.queries.SimilarityQueries.streamedIvfFor(spark, store)
      .select("vec_id").as[Long].collect().toSet
    assert(first === (0L until 20L).toSet)
    // ingest more: the version witness moves, so the derivation rebuilds
    // instead of serving the stale assignment
    assert(graft.streaming.StreamingEmbed.processBatch(mk(20L until 30L), 1L, store))
    val second = graft.queries.SimilarityQueries.streamedIvfFor(spark, store)
      .select("vec_id").as[Long].collect().toSet
    assert(second === (0L until 30L).toSet,
      "stale derived IVF served after the embed store changed")
  }

  test("IVF-PQ: recall >= 0.6 @ k=10 vs exact; residual estimate beats coarse-only ranking") {
    val dir = "/root/testdata/sf0.01"
    val corpus = graft.sources.Tables.tbl(spark, dir, "embeddings")
    val exact = Similarity.topK(corpus, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val ivfpq = graft.sources.VectorStore.ivfPqTopK(spark, dir, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toSeq
    // IVF-PQ prunes to 4/16 cells AND compresses to codes — recall is
    // the product of both approximations; the probed-cell ceiling is
    // what trained-IVF@nProbe=4 finds
    val recall = exact.intersect(ivfpq.map(_._1).toSet).size / 10.0
    assert(recall >= 0.6, s"IVF-PQ recall $recall; exact=$exact got=${ivfpq.map(_._1)}")
    // sims are exact re-ranked cosines: any overlap with the exact
    // top-10 carries the identical value
    val exactSims = Similarity.topK(corpus, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toMap
    ivfpq.filter(r => exactSims.contains(r._1))
      .foreach { case (id, sim) => assert(sim === exactSims(id)) }
    // determinism across invocations (store-served, probe + encode fixed)
    val again = graft.sources.VectorStore.ivfPqTopK(spark, dir, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(again === ivfpq)
  }

  test("lloyd training is deterministic across invocations") {
    val corpus = graft.sources.Tables.tbl(spark, "/root/testdata/sf0.01", "embeddings")
    def run() = Similarity.ivfTopKTrained(corpus, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(run() === run())
  }

  test("VectorStore-served queries equal the direct operators bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.sources.Tables.tbl(spark, dir, "embeddings")
    val V = graft.sources.VectorStore
    // ordered results compare as sequences, set-valued ones as sets
    assert(V.topK(spark, dir, 0L, 10).as[(Long, Double)].collect().toSeq
      === Similarity.topK(corpus, 0L, 10).as[(Long, Double)].collect().toSeq)
    assert(V.annNearestNeighbor(spark, dir).as[(Long, Long, Double)].collect().toSet
      === Similarity.annNearestNeighbor(corpus).as[(Long, Long, Double)].collect().toSet)
    assert(V.annNearestNeighborMultiProbe(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
      === Similarity.annNearestNeighborMultiProbe(corpus)
        .as[(Long, Long, Double)].collect().toSet)
    assert(V.embeddingDuplicates(spark, dir).as[(Long, Long, Double)].collect().toSet
      === Similarity.embeddingDuplicates(corpus).as[(Long, Long, Double)].collect().toSet)
    assert(V.ivfTopK(spark, dir, 0L, 10).as[(Long, Double)].collect().toSeq
      === Similarity.ivfTopK(corpus, 0L, 10).as[(Long, Double)].collect().toSeq)
    assert(V.ivfTopKTrained(spark, dir, 0L, 10).as[(Long, Double)].collect().toSeq
      === Similarity.ivfTopKTrained(corpus, 0L, 10).as[(Long, Double)].collect().toSeq)
  }

  test("knnJoin: past the query-count gate the query side is NOT a forced broadcast") {
    // an explicit broadcast() is honored regardless of size, so an
    // ungated hint would force an unbounded KB-per-row query set
    // through the driver; above the gate no hint may survive in the
    // optimized plan (stats/AQE stay free to choose), and the gated
    // plan must score identically to the hinted one
    val p = Similarity.prepared(emb)
    val qs = p.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"norm".as("qn"))
    val gated = Similarity.knnJoin(p, qs, k = 2, broadcastQueriesMax = 0)
    assert(!gated.queryExecution.optimizedPlan.toString.contains("broadcast"))
    val hinted = Similarity.knnJoin(p, qs, k = 2)
    assert(hinted.queryExecution.optimizedPlan.toString.contains("broadcast"))
    assert(gated.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
      === hinted.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq)
  }

  test("knnJoin: a caller-supplied query bound decides the gate with no count job") {
    val p = Similarity.prepared(emb)
    val qs = p.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"norm".as("qn"))
    // a 2-row query set declared ABOVE the gate must NOT broadcast:
    // observable proof the operator trusted the hint and never ran its
    // own count (a count of 2 would have passed the 10k gate)
    val declared = Similarity.knnJoin(p, qs, k = 2,
      knownQueryCount = Some(20000L))
    assert(!declared.queryExecution.optimizedPlan.toString.contains("broadcast"))
    // declared under the gate: broadcast, same results as the counted path
    val bounded = Similarity.knnJoin(p, qs, k = 2, knownQueryCount = Some(2L))
    assert(bounded.queryExecution.optimizedPlan.toString.contains("broadcast"))
    assert(bounded.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
      === declared.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq)
  }

  test("IVF probe over the persisted store prunes cell partitions at planning time") {
    val dir = "/root/testdata/sf0.001"
    val probe = graft.sources.VectorStore.ivfTopK(spark, dir, queryId = 0L, k = 10)
    probe.collect()
    val plan = probe.queryExecution.executedPlan
    val scans = PlanScans.fileScans(plan)
    val (pruned, unpruned) = scans.partition(_.partitionFilters.nonEmpty)
    // the probe scan carries the literal cell IN (...) as a PARTITION
    // filter; the query-row scan (vec_id filter) reads every cell — the
    // file-count gap is the pruning, measured from the real reader
    assert(pruned.nonEmpty, s"no partition-filtered scan in:\n$plan")
    assert(unpruned.nonEmpty)
    val prunedFiles = pruned.map(_.metrics("numFiles").value).min
    val allFiles = unpruned.map(_.metrics("numFiles").value).max
    assert(prunedFiles < allFiles,
      s"probe read $prunedFiles files vs $allFiles — no partition pruning")
  }
}
