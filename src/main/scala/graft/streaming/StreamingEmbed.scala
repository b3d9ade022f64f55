package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.operators.{Dedup, Similarity}

/** Incremental embedding-cosine near-duplicate detection over a VECTOR
  * STREAM — the streaming twin of the batch
  * `Similarity.embeddingDuplicates` (whose output is the oracle-checked
  * `q_embed_dup`), and the embedding-flavored sibling of
  * `StreamingDedup` (same store/marker/compaction machinery; see that
  * scaladoc for the replay and residual-window contract).
  *
  * Per micro-batch, only the NEW vectors are normalized and
  * sign-bucketed; candidates come from broadcast-joining the batch's
  * (bucket, vector) rows against the accumulated vector store on the
  * bucket key — the store is scanned, never shuffled — and the cosine
  * verify is the same `dot_f64` + round(…, 6) arithmetic as batch, so
  * the accumulated pair store equals `embeddingDuplicates` over the
  * union of all batches (StreamingSpec proves set equality).
  *
  * STORE LAYOUT under `storePath`:
  *   - `vecs/`  (vec_id, v, norm, bucket, ingest_ms): double-cast
  *     vectors with their norm and sign bucket (computed once, at
  *     ingest) and the latest-wins version stamp;
  *   - `pairs/` (vec_a, vec_b, sim): verified near-dup pairs;
  *   - `_graft_commits/<scope>/<batchId>`: commit markers.
  *
  * Input schema: `vec_id LONG, embedding ARRAY<FLOAT|DOUBLE>` (extra
  * columns ignored).
  */
object StreamingEmbed {

  private[graft] def vecsPath(store: String) = s"$store/vecs"
  private[graft] def pairsPath(store: String) = s"$store/pairs"

  /** Largest estimated batch payload (vectors + row overhead) that is
    * force-broadcast to the candidate join — ~32 MB keeps the broadcast
    * comfortably inside a default driver even at 1024-dim embeddings
    * (where it admits ~4k vectors; a 10k-vector backfill at those dims
    * would be ~80 MB and takes the shuffle path once instead).
    */
  private[graft] val MaxBroadcastBytes: Long = 32L << 20

  /** `ingest_ms` mirrors `StreamingDedup`'s hash-row version stamp:
    * latest-wins collapse for re-sent vec_ids, robust to checkpoint-
    * lineage changes (batchIds restart; wall clock doesn't).
    */
  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType)),
    StructField("norm", DoubleType),
    StructField("bucket", StringType),
    StructField("ingest_ms", LongType)))
  private val pairSchema = StructType(Seq(
    StructField("vec_a", LongType),
    StructField("vec_b", LongType),
    StructField("sim", DoubleType)))

  /** Start the incremental embedding near-dup sink. `bits` MUST stay
    * fixed for the lifetime of a store (bucket keys are not comparable
    * across widths).
    */
  def sinkEmbedDup(embeddings: DataFrame, storePath: String, checkpointDir: String,
                   bits: Int = 8, threshold: Double = 0.3): StreamingQuery = {
    val conf = embeddings.sparkSession.sparkContext.hadoopConfiguration
    val scope = StreamingIndex.commitScope(checkpointDir, conf)
    val query = embeddings.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val appended = processBatch(batch, batchId, storePath, scope, bits, threshold)
        if (!appended) StoreMaintenance.noopExecute(batch)
      }
      .start()
    StoreMaintenance.registerIngest(conf, storePath, query)
    query
  }

  /** One idempotent incremental micro-batch (testable replay unit — the
    * `appendBatch` pattern). @return false = replay of a committed
    * batchId, skipped.
    */
  private[graft] def processBatch(batch: DataFrame, batchId: Long, storePath: String,
                                  scope: String = "default", bits: Int = 8,
                                  threshold: Double = 0.3): Boolean = {
    val spark = batch.sparkSession
    StoreMaintenance.runOnce(spark.sparkContext.hadoopConfiguration,
      storePath, scope, batchId) {
      // null embeddings are dropped up front: they carry no signal (the
      // batch path drops them too — a null bucket never joins), and
      // leaving them in would NPE the dims probe below on a batch whose
      // head row is null — a poison-pill that would crash every replay
      val newP = Dedup.materializeOnce(
        Similarity.prepared(batch.select("vec_id", "embedding")
            .filter(col("embedding").isNotNull))
          .withColumn("bucket", Similarity.signBucket(col("v"), bits)))
      val allVecs = StoreMaintenance.readOrEmpty(spark, vecsPath(storePath), vecSchema)
        .select("vec_id", "v", "norm", "bucket")
        .unionByName(newP.select("vec_id", "v", "norm", "bucket"))
      // candidates: new vectors against the whole corpus so far on the
      // bucket key. The new side is micro-batch-sized — broadcast it, so
      // the accumulated store never shuffles; cosine verifies in the same
      // pass (the candidate join IS the verify join here — vectors ride
      // along both sides, no second lookup needed). A new-new pair is
      // discovered twice with the identical rounded sim → dropDuplicates.
      // The broadcast cap is BYTE-based, not row-based: each broadcast row
      // carries the full vector (dims × 8 bytes), so a row-count cap that
      // is fine for StreamingDedup's ~60-byte sig rows would still ship
      // hundreds of MB at high dims. An over-cap backfill batch joins by
      // shuffle once instead of OOMing the driver. dims comes from one
      // driver-side head() on the checkpointed batch (metadata-sized).
      val newSide = newP.select(col("bucket"), col("vec_id").as("_nid"),
        col("v").as("_nv"), col("norm").as("_nn"))
      val nNew = newP.count()
      val dims = if (nNew == 0) 0 else newP.select(size(col("v"))).head().getInt(0)
      val estBytes = nNew * (dims * 8L + 48L)
      val probe = if (estBytes <= MaxBroadcastBytes) broadcast(newSide) else newSide
      val newPairs = allVecs.alias("al")
        .join(probe, Seq("bucket"))
        .filter(col("al.vec_id") =!= col("_nid"))
        .select(least(col("al.vec_id"), col("_nid")).as("vec_a"),
          greatest(col("al.vec_id"), col("_nid")).as("vec_b"),
          Similarity.cosine(col("al.v"), col("al.norm"), col("_nv"), col("_nn")).as("sim"))
        .filter(col("sim") >= threshold)
        // max, not an arbitrary-survivor key dedup: a pair discovered via
        // two versions of a re-sent endpoint emits ONE deterministic sim
        .groupBy("vec_a", "vec_b").agg(max(col("sim")).as("sim"))

      newP.select("vec_id", "v", "norm", "bucket")
        .withColumn("ingest_ms", lit(System.currentTimeMillis()))
        .write.mode(SaveMode.Append)
        .parquet(vecsPath(storePath))
      newPairs.write.mode(SaveMode.Append).parquet(pairsPath(storePath))
    }
  }

  /** The accumulated verified pair relation — exact across the replay
    * residual window, and deterministic under re-sent vec_ids: the max
    * sim over observed versions wins on every read and across compacts.
    */
  def pairs(spark: SparkSession, storePath: String): DataFrame =
    canonicalPairs(StoreMaintenance.readOrEmpty(spark, pairsPath(storePath), pairSchema))

  private def canonicalPairs(p: DataFrame): DataFrame =
    p.groupBy("vec_a", "vec_b").agg(max(col("sim")).as("sim"))

  /** The accumulated (vec_id, v, norm, bucket) store — feed it to batch
    * similarity consumers over a streamed corpus. One row per vec_id:
    * latest ingest stamp wins (`StreamingDedup.canonicalByDoc`'s rule).
    */
  def vectors(spark: SparkSession, storePath: String): DataFrame =
    canonicalVecRows(StoreMaintenance.readOrEmpty(spark, vecsPath(storePath), vecSchema))
      .select("vec_id", "v", "norm", "bucket")

  private def canonicalVecRows(vecs: DataFrame): DataFrame =
    vecs.groupBy("vec_id")
      .agg(max(struct(coalesce(col("ingest_ms"), lit(Long.MinValue)).as("_t"),
        col("v"), col("norm"), col("bucket"))).as("_m"))
      .select(col("vec_id"), col("_m.v").as("v"), col("_m.norm").as("norm"),
        col("_m.bucket").as("bucket"), col("_m._t").as("ingest_ms"))

  /** Collapse replay-residual duplicates and per-batch small files —
    * same contract and crash discipline as `StreamingDedup.compactStore`
    * (ingest-stopped enforced in-process; `recoverStore` finishes or
    * unwinds; each sub-store compacts through its accessor's own
    * deterministic collapse so served rows never flip across a compact).
    */
  def compactStore(spark: SparkSession, storePath: String): Unit = {
    StoreMaintenance.assertIngestStopped(spark.sparkContext.hadoopConfiguration, storePath)
    StoreMaintenance.compactSubWith(spark, vecsPath(storePath), vecSchema, canonicalVecRows)
    StoreMaintenance.compactSubWith(spark, pairsPath(storePath), pairSchema, canonicalPairs)
    val commits = new org.apache.hadoop.fs.Path(s"$storePath/_graft_commits")
    commits.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(commits, true): Unit
  }

  def recoverStore(spark: SparkSession, storePath: String): Unit =
    Seq(vecsPath(storePath), pairsPath(storePath)).foreach { p =>
      StoreMaintenance.recoverSub(spark, p)
    }
}
