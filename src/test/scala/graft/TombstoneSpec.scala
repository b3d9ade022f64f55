package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingEmbed
import graft.operators.{PQ, Similarity}

/** Vector-store TOMBSTONE deletes (r19 VERDICT ask #5): a delete batch
  * through `StreamingEmbed.processDeleteBatch` must make the vector
  * unservable from EVERY ANN path derived from the store (plain IVF,
  * IVF-PQ, OPQ-rotated IVF-PQ), dissolve every verified pair touching
  * it, survive compaction, be replay-idempotent, and lose to a later
  * re-add — tombstones are versions under the same latest-stamp-wins
  * rule as every re-send. Plus the maintenance hook: deletion that
  * shifts the live distribution fires `VectorStore.maintainIvf`'s
  * retrain on the SHRUNK corpus.
  */
class TombstoneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3 clusters of 8 near-identical vectors — cluster members are
  // near-dups (cosine ≈ 1), so the pair store is well-populated
  private def mkEmb(spread: Float = 0.1f) = {
    val rows = for {
      c <- 0 until 3
      i <- 0 until 8
    } yield {
      val base = Array.fill(4)(0f)
      base(c) = 10f
      base((c + 1) % 4) = i * spread
      ((c * 8 + i).toLong, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def freshStore(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tomb_$tag").toString

  test("deleted vector never serves from vectors(), pairs(), or any ANN path; survives compaction; re-add wins") {
    val store = freshStore("ann")
    assert(StreamingEmbed.processBatch(mkEmb(), 0L, store, bits = 4, threshold = 0.9))
    assert(StreamingEmbed.vectors(spark, store).count() === 24L)
    val pairsBefore = StreamingEmbed.pairs(spark, store)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairsBefore.exists(p => p._1 == 0L || p._2 == 0L),
      "fixture must produce pairs touching vec 0")

    // DELETE vec 0 (cluster 0's anchor)
    assert(StreamingEmbed.processDeleteBatch(Seq(0L).toDF("vec_id"), 1L, store))
    // replay of the same delete batch is a no-op
    assert(!StreamingEmbed.processDeleteBatch(Seq(0L).toDF("vec_id"), 1L, store))

    val live = StreamingEmbed.vectors(spark, store)
    assert(live.count() === 23L)
    assert(live.filter(col("vec_id") === 0L).count() === 0L)
    // pairs touching 0 dissolve; every other pair is intact
    val pairsAfter = StreamingEmbed.pairs(spark, store)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairsAfter === pairsBefore.filter(p => p._1 != 0L && p._2 != 0L))

    // EVERY ANN path over the store-derived corpus excludes the deleted id
    val cents = Similarity.collectCentroids(live.select("vec_id", "v", "norm"), 3)
    val assigned = live.select("vec_id", "v", "norm")
      .withColumn("cell", Similarity.bestCell(cents).cast("int"))
    val ivfIds = Similarity.ivfRankAssigned(assigned, cents, queryId = 1L,
      k = 23, nProbe = 3).select("vec_id").as[Long].collect()
    assert(ivfIds.nonEmpty && !ivfIds.contains(0L), s"ivf served deleted id: ${ivfIds.toSeq}")
    val pqIds = PQ.ivfPqTopK(assigned, cents, queryId = 1L, k = 23,
      nProbe = 3, poolSize = 23).select("vec_id").as[Long].collect()
    assert(pqIds.nonEmpty && !pqIds.contains(0L), s"ivfpq served deleted id: ${pqIds.toSeq}")
    val opqIds = PQ.ivfPqTopK(assigned, cents, queryId = 1L, k = 23,
      nProbe = 3, poolSize = 23,
      // a 1-based 4-dim rotation permutation (eigenAllocation is
      // 64-dim-contracted; any valid perm exercises the OPQ path)
      perm = Some(Seq(2, 4, 1, 3)))
      .select("vec_id").as[Long].collect()
    assert(opqIds.nonEmpty && !opqIds.contains(0L), s"opq served deleted id: ${opqIds.toSeq}")

    // compaction: the tombstone row survives physically, the exclusion
    // holds, and dissolved pairs are dropped from disk
    StreamingEmbed.compactStore(spark, store)
    assert(StreamingEmbed.vectors(spark, store).filter(col("vec_id") === 0L).count() === 0L)
    val rawVecs = spark.read.parquet(s"$store/vecs")
    assert(rawVecs.filter(col("vec_id") === 0L && col("v").isNull).count() === 1L,
      "compaction must keep the canonical tombstone row")
    val rawPairs = spark.read.parquet(s"$store/pairs")
    assert(rawPairs.filter(col("vec_a") === 0L || col("vec_b") === 0L).count() === 0L,
      "compaction must physically drop dissolved pairs")
    assert(StreamingEmbed.pairs(spark, store)
      .as[(Long, Long, Double)].collect().toSet === pairsAfter)

    // RE-ADD with a later stamp: the new version beats the tombstone and
    // its pairs regenerate at its own ingest
    assert(StreamingEmbed.processBatch(
      mkEmb().filter(col("vec_id") === 0L), 2L, store, bits = 4, threshold = 0.9))
    val reborn = StreamingEmbed.vectors(spark, store)
    assert(reborn.count() === 24L)
    assert(reborn.filter(col("vec_id") === 0L).count() === 1L)
    assert(StreamingEmbed.pairs(spark, store)
      .as[(Long, Long, Double)].collect().toSet
      .exists(p => p._1 == 0L || p._2 == 0L),
      "re-added vector must regenerate its pairs")
  }

  test("maintainIvf retrains on a deletion-shrunk distribution") {
    // wide in-cluster spread so deleting the high-offset half of every
    // cluster shifts its mean enough to cross the drift threshold
    val d = java.nio.file.Files.createTempDirectory("graft_tomb_maint").toString
    val wide = mkEmb(spread = 1.0f)
    wide.write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val before = graft.sources.VectorStore.ivf(spark, d, nCells = 3, iters = 2)._2
    val shrunk = wide.filter(col("vec_id") % 8 < 4) // drop each cluster's far half
    val (drift, retrained) = graft.sources.VectorStore.maintainIvf(
      spark, d, shrunk, nCells = 3, iters = 2, threshold = 0.01)
    assert(retrained, s"shrunk distribution must fire the retrain (drift = $drift)")
    val (assigned, after) = graft.sources.VectorStore.ivf(spark, d, nCells = 3, iters = 2)
    assert(after.map(_.cv) !== before.map(_.cv), "centroids must re-fit the shrunk corpus")
    // the swapped store is consistent and serves
    val mismatch = assigned
      .withColumn("best", Similarity.bestCell(after).cast("int"))
      .filter(col("cell") =!= col("best")).count()
    assert(mismatch === 0L)
  }
}
