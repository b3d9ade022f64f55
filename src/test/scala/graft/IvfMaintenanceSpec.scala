package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.VectorStore

/** Drift-triggered IVF retrain (`VectorStore.maintainIvf`): the
  * maintenance loop must NOT fire on a stable corpus, MUST fire on a
  * drifted one, and the swapped store must keep serving the trained-IVF
  * query surface. Runs against a throwaway fixture dir so the shared
  * testdata stores are never mutated.
  */
class IvfMaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3 well-separated clusters of 8 vectors each in 4 dims — Lloyd at
  // nCells = 3 recovers them exactly regardless of seeding
  private def mkEmb(shift: Float): org.apache.spark.sql.DataFrame = {
    val rows = for {
      c <- 0 until 3
      i <- 0 until 8
    } yield {
      val base = Array.fill(4)(0f)
      base(c) = 10f + shift
      base((c + 1) % 4) = i * 0.1f
      ((c * 8 + i).toLong, base, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  private lazy val fixtureDir: String = {
    val d = java.nio.file.Files.createTempDirectory("ivf_maint").toString
    mkEmb(0f).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("stable corpus: drift ~ 0, no retrain, store untouched") {
    val before = VectorStore.ivf(spark, fixtureDir, nCells = 3, iters = 2)._2
    val (drift, retrained) =
      VectorStore.maintainIvf(spark, fixtureDir, mkEmb(0f), nCells = 3, iters = 2)
    assert(!retrained, s"stable corpus must not retrain (drift = $drift)")
    assert(drift <= 0.05)
    val after = VectorStore.ivf(spark, fixtureDir, nCells = 3, iters = 2)._2
    assert(after.map(c => (c.id, c.cv)) === before.map(c => (c.id, c.cv)))
  }

  test("drifted corpus: retrain fires and atomically swaps the store") {
    val before = VectorStore.ivf(spark, fixtureDir, nCells = 3, iters = 2)._2
    // rotate every cluster's axis: cluster c now peaks on dim (c+1)%4 —
    // the stored centroids point at the wrong axes entirely
    val drifted = mkEmb(0f).select(col("vec_id"),
      concat(slice(col("embedding"), 2, 3), slice(col("embedding"), 1, 1))
        .as("embedding"),
      col("label"))
    val (drift, retrained) =
      VectorStore.maintainIvf(spark, fixtureDir, drifted, nCells = 3, iters = 2)
    assert(retrained, s"rotated corpus must retrain (drift = $drift)")
    assert(drift > 0.05)
    // the swapped store serves fresh centroids (cache invalidated)...
    val after = VectorStore.ivf(spark, fixtureDir, nCells = 3, iters = 2)._2
    assert(after.map(_.cv) !== before.map(_.cv))
    // ...the assigned partitioning agrees with them (every member's
    // best cell under the NEW centroids is the cell it is stored in)...
    val assigned = VectorStore.ivf(spark, fixtureDir, nCells = 3, iters = 2)._1
    val mismatch = assigned
      .withColumn("best", graft.operators.Similarity.bestCell(after).cast("int"))
      .filter(col("cell") =!= col("best")).count()
    assert(mismatch === 0L)
    // ...and the trained-IVF query surface stays green off the swapped
    // store: top-k from a member vector returns k in-corpus neighbours
    val top = VectorStore.ivfTopKTrained(spark, fixtureDir, queryId = 0L,
      k = 3, nCells = 3, iters = 2)
    assert(top.count() === 3L)
    // no swap residue on disk (both renames completed)
    val root = graft.sources.SessionStores.scopedPath("graft_ivf",
      "ivf_c3_i2_" + graft.sources.SessionStores.tagOf(fixtureDir))
    for (side <- Seq("cents__compacting", "cents__pre_compact",
        "assigned__compacting", "assigned__pre_compact"))
      assert(!new java.io.File(s"$root/$side").exists(), s"residue: $side")
  }

  test("empty current corpus fails loudly instead of retraining over a healthy store") {
    val before = VectorStore.ivf(spark, fixtureDir, nCells = 3, iters = 2)._2
    val ex = intercept[IllegalArgumentException] {
      VectorStore.maintainIvf(spark, fixtureDir,
        mkEmb(0f).filter(col("vec_id") < 0), nCells = 3, iters = 2)
    }
    assert(ex.getMessage.contains("refusing"))
    // the healthy store was NOT overwritten by the garbage input
    val after = VectorStore.ivf(spark, fixtureDir, nCells = 3, iters = 2)
    assert(after._1.count() === 24L)
    assert(after._2.map(c => (c.id, c.cv)) === before.map(c => (c.id, c.cv)))
  }

  test("crash between the two swaps leaves a serveable store the next pass repairs") {
    // fresh fixture dir so the other tests' store state can't interfere
    val d2 = java.nio.file.Files.createTempDirectory("ivf_maint_crash").toString
    mkEmb(0f).write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val root = graft.sources.SessionStores.scopedPath("graft_ivf",
      "ivf_c3_i2_" + graft.sources.SessionStores.tagOf(d2))
    VectorStore.ivf(spark, d2, nCells = 3, iters = 2): Unit
    // simulate maintainIvf dying AFTER the centroid swap and BEFORE the
    // assignment swap: install rotated-corpus centroids at cents/ while
    // assigned/ keeps the original partitioning (plus swap residue)
    val drifted = mkEmb(0f).select(col("vec_id"),
      concat(slice(col("embedding"), 2, 3), slice(col("embedding"), 1, 1))
        .as("embedding"), col("label"))
    val p = graft.operators.Similarity.prepared(drifted)
    val fresh = graft.operators.Similarity.lloydCentroids(p, 3, 2)
    import spark.implicits._
    fresh.map(c => (c.id, c.cv, c.cn)).toDF("cent_id", "cv", "cn")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/cents__compacting")
    p.withColumn("cell", graft.operators.Similarity.bestCell(fresh).cast("int"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/assigned__compacting")
    graft.streaming.StoreMaintenance.swapInto(spark, s"$root/cents")
    // CRASH here: assigned__compacting residue on disk, halves disagree.
    // Simulate the TRUE crash: the process died, so its centroid cache
    // died with it — the restarted process reads the already-swapped
    // FRESH centroids from disk and measures drift ~0 against the very
    // corpus they were trained on. Without the residue gate this state
    // would serve silently-wrong ANN results forever.
    VectorStore.testClearCentroidCache()
    // The store must still SERVE (both directories exist and read)...
    val (assigned, _) = VectorStore.ivf(spark, d2, nCells = 3, iters = 2)
    assert(assigned.count() === 24L)
    // ...and the next maintenance pass must REPAIR it: measured drift is
    // ~0 (fresh centroids vs the corpus that trained them), so ONLY the
    // crash-residue gate can fire the rebuild — this pins the gate, not
    // a drift measurement that a real crash would never produce
    val (drift2, retrained) =
      VectorStore.maintainIvf(spark, d2, drifted, nCells = 3, iters = 2)
    assert(drift2 <= 0.05,
      s"fresh process must measure ~0 drift against swapped centroids ($drift2)")
    assert(retrained, "repair pass must retrain the half-swapped store")
    val (a2, c2) = VectorStore.ivf(spark, d2, nCells = 3, iters = 2)
    val mismatch = a2
      .withColumn("best", graft.operators.Similarity.bestCell(c2).cast("int"))
      .filter(col("cell") =!= col("best")).count()
    assert(mismatch === 0L, "repaired store halves must agree")
    for (side <- Seq("cents__compacting", "cents__pre_compact",
        "assigned__compacting", "assigned__pre_compact"))
      assert(!new java.io.File(s"$root/$side").exists(), s"residue: $side")
  }
}
