package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.Text

/** Streaming index build (SURVEY §2.2): the SAME tokenize → distinct →
  * explode pipeline as the batch `InvertedIndex.postings`, declared over
  * a document stream. Emits the posting relation incrementally in append
  * mode; a downstream `writeStream.format("parquet")` lands it
  * partition-by-partition, and the batch K2 bucketed sink compacts
  * periodically.
  *
  * Cross-batch (term, doc) dedupe uses `dropDuplicatesWithinWatermark`:
  * re-deliveries inside the watermark horizon are dropped and state is
  * EVICTED once the watermark passes — state stays bounded by stream lag
  * (the reference's R3 dedupe assumes a finite batch; an unbounded
  * stream needs exactly this horizon trade-off).
  *
  * Input schema: `doc_id LONG, url STRING, text STRING, ingest_t
  * TIMESTAMP` (arrival time for the watermark).
  */
object StreamingIndex {

  def postingsStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ingest_t", watermark)
      .select(col("doc_id"), col("url"), col("ingest_t"),
        explode(Text.terms(col("text"))).as("term"))
      .dropDuplicatesWithinWatermark("term", "doc_id")
      .select("term", "doc_id", "url")

  /** Land the streaming posting relation in the SAME term-bucketed table
    * layout the batch K2 sink writes (`Sinks.writeIndex`): `foreachBatch`
    * appends each micro-batch with identical bucketing, so point/boolean
    * queries over the growing table keep bucket pruning — the streaming
    * half of "build once, query many". Micro-batch appends accumulate
    * one file per bucket per batch; run the batch sink periodically to
    * compact (the standard streaming-ingest + batch-compaction split).
    *
    * REPLAY SAFETY: `foreachBatch` is at-least-once — after a failure/
    * restart the engine re-delivers the last uncommitted micro-batch, and
    * a blind append would duplicate its (term, doc_id) rows, silently
    * breaking consumers that rely on posting uniqueness (`BooleanQuery
    * .and` counts plain hits). Each appended batch therefore commits a
    * marker under `<path>/_graft_commits/<checkpoint-scope>/<batchId>`
    * AFTER its append job commits; a re-delivered batchId whose marker
    * exists is skipped. Markers are SCOPED by a digest of the
    * checkpoint location because batchIds are only meaningful within
    * one checkpoint lineage — a stream restarted with a FRESH
    * checkpoint (or a second stream ingesting into the same table)
    * restarts batchIds at 0, and unscoped markers would silently drop
    * its first batches as "already committed".
    * Residual window: a crash BETWEEN the append's job commit and the
    * marker write still replays that one batch (exact-once would need a
    * transactional table format); the periodic batch-sink compaction
    * restores uniqueness, and readers that must be exact across an
    * uncompacted window should `dropDuplicates("term", "doc_id")` first.
    */
  def sinkToIndex(postings: DataFrame, tableName: String, path: String,
                  checkpointDir: String, buckets: Int = 32): StreamingQuery =
    postings.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, tableName, path, buckets,
          commitScope(checkpointDir)): Unit
      }
      .start()

  /** Marker namespace for one checkpoint lineage (see `sinkToIndex`). */
  private[graft] def commitScope(checkpointDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  /** One idempotent micro-batch append (factored out of `sinkToIndex` so
    * replay behavior is directly testable). @return whether the batch was
    * appended (false = replay of an already-committed batchId within the
    * same checkpoint scope, skipped).
    */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long, tableName: String,
                                 path: String, buckets: Int,
                                 scope: String = "default"): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(s"$path/_graft_commits/$scope/$batchId")
    val fs = marker.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      batch.write.mode(SaveMode.Append)
        .option("path", path)
        .bucketBy(buckets, "term").sortBy("term")
        .saveAsTable(tableName)
      fs.create(marker, true).close()
      true
    }
  }
}
