package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Incremental EVENT-FACT store — the ingestion half that turns the
  * whole behavioral-analytics family (funnel, retention, transitions,
  * growth accounting, sessionization, SCD2) into streamed twins: facts
  * accumulate idempotently, and each analysis is the IDENTICAL batch
  * declaration over the accumulated relation, hash-checked under the
  * batch query's oracle.
  *
  * CONTRACT — events are immutable FACTS keyed by `event_id`: a
  * re-sent or replay-re-appended event is byte-identical to its first
  * copy, so the read accessor's `dropDuplicates(event_id)` restores
  * exact-once semantics over the at-least-once append (any survivor is
  * THE fact). That makes the store's accumulated relation equal the
  * batch fact table under ANY partition of the stream into batches —
  * the simplest of the store contracts (no supersede rule like
  * `StreamingGraph`'s additive deltas, no verify step like the pair
  * stores), which is exactly why the whole query family can ride on
  * it unchanged.
  *
  * Same marker/compact/recover machinery as the other value stores
  * (`StoreMaintenance`): per-batch commit markers gate replays,
  * `compactStore` collapses residual duplicates and per-batch small
  * files, `recoverStore` heals a crashed compact swap.
  */
object StreamingEvents {

  private[graft] def factsPath(store: String) = s"$store/facts"

  private val factSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("t", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Start the incremental fact sink: `events` must stream rows shaped
    * like `Tables.events` (event_id, t, user_id, event_type, value,
    * props).
    */
  def sinkEvents(events: DataFrame, storePath: String,
                 checkpointDir: String): StreamingQuery = {
    val conf = events.sparkSession.sparkContext.hadoopConfiguration
    val scope = StreamingIndex.commitScope(checkpointDir, conf)
    StoreMaintenance.registeredStart(conf, storePath) {
      events.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val appended = processBatch(batch, batchId, storePath, scope)
          if (!appended) StoreMaintenance.noopExecute(batch)
        }
        .start()
    }
  }

  /** One idempotent incremental micro-batch (testable replay unit).
    * @return false = replay of a committed batchId, skipped.
    */
  private[graft] def processBatch(batch: DataFrame, batchId: Long, storePath: String,
                                  scope: String = "default"): Boolean =
    StoreMaintenance.runOnce(batch.sparkSession.sparkContext.hadoopConfiguration,
      storePath, scope, batchId) {
      batch.select(col("event_id").cast("long"), col("t").cast("timestamp"),
          col("user_id").cast("long"), col("event_type").cast("string"),
          col("value").cast("double"), col("props").cast("string"))
        .coalesce(1) // small per-batch appends: one file, not one per task
        .write.mode(SaveMode.Append).parquet(factsPath(storePath))
    }

  /** The accumulated fact relation — exact-once by event_id across the
    * replay residual window (facts are values; see the contract doc).
    */
  def events(spark: SparkSession, storePath: String): DataFrame =
    StoreMaintenance.readOrEmpty(spark, factsPath(storePath), factSchema)
      .dropDuplicates("event_id")

  /** Collapse replay-residual duplicates and per-batch small files —
    * the collapse is the accessor's own key dedup rule.
    */
  def compactStore(spark: SparkSession, storePath: String): Unit = {
    StoreMaintenance.assertIngestStopped(spark.sparkContext.hadoopConfiguration, storePath)
    StoreMaintenance.compactSub(spark, factsPath(storePath), factSchema, Seq("event_id"))
    val commits = new org.apache.hadoop.fs.Path(s"$storePath/_graft_commits")
    commits.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(commits, true): Unit
  }

  def recoverStore(spark: SparkSession, storePath: String): Unit =
    StoreMaintenance.recoverSub(spark, factsPath(storePath))
}
