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
                  checkpointDir: String, buckets: Int = 32): StreamingQuery = {
    val scope = commitScope(checkpointDir,
      postings.sparkSession.sparkContext.hadoopConfiguration)
    // one-release migration window: marker trees written before scopes
    // were filesystem-qualified hash the RAW checkpoint string. Lookups
    // consult that legacy scope too, so a batch replayed across the
    // upgrade still sees its old marker instead of re-appending. New
    // markers land only in the qualified scope; a compact() clears the
    // lingering legacy tree.
    val legacy = Seq(legacyCommitScope(checkpointDir)).filterNot(_ == scope)
    postings.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, tableName, path, buckets, scope, legacy): Unit
      }
      .start()
  }

  /** Marker namespace for one checkpoint lineage (see `sinkToIndex`).
    * The path is filesystem-QUALIFIED before hashing: equivalent
    * spellings of the same directory (relative vs absolute, trailing
    * slash, scheme-qualified) across a restart must land in the SAME
    * marker scope, or a re-delivered batch would be re-appended — the
    * exact duplication the markers exist to prevent.
    */
  private[graft] def commitScope(checkpointDir: String,
                                 hadoopConf: org.apache.hadoop.conf.Configuration): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir)
    val qualified = p.getFileSystem(hadoopConf).makeQualified(p).toString
    md5Scope(qualified)
  }

  /** Pre-qualification scope (the raw checkpoint string, e.g. '/tmp/ckpt'
    * vs the qualified 'file:/tmp/ckpt') — consulted on marker LOOKUP only,
    * as a migration window for marker trees written by older runs.
    */
  private[graft] def legacyCommitScope(checkpointDir: String): String =
    md5Scope(checkpointDir)

  private def md5Scope(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  /** One idempotent micro-batch append (factored out of `sinkToIndex` so
    * replay behavior is directly testable). @return whether the batch was
    * appended (false = replay of an already-committed batchId within the
    * same checkpoint scope, skipped).
    */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long, tableName: String,
                                 path: String, buckets: Int,
                                 scope: String = "default",
                                 lookupAlso: Seq[String] = Nil): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(s"$path/_graft_commits/$scope/$batchId")
    val fs = marker.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    val committed = fs.exists(marker) || lookupAlso.exists { s =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/_graft_commits/$s/$batchId"))
    }
    if (committed) false
    else {
      batch.write.mode(SaveMode.Append)
        .option("path", path)
        .bucketBy(buckets, "term").sortBy("term")
        .saveAsTable(tableName)
      fs.create(marker, true).close()
      true
    }
  }

  /** Compact a streaming-appended index table (the periodic batch half of
    * the streaming-ingest + batch-compaction split `sinkToIndex`
    * documents): rewrite the accumulated one-file-per-bucket-per-batch
    * table through the batch K2 layout, restoring (term, doc_id)
    * uniqueness across the replay residual window (`url` is functionally
    * dependent on `doc_id`, so dropping duplicate keys loses nothing) and
    * collapsing each bucket to a single file.
    *
    * MUST run while ingest into `tableName` is stopped (stop the
    * `sinkToIndex` query, compact, restart from the same checkpoint) —
    * the standard pause-compact-resume discipline; compacting under a
    * live appender would race the directory swap.
    *
    * The rewrite goes to a side directory, then swaps in via two
    * renames, so the data rewrite and the committed-marker clearing are
    * one directory replacement rather than two windows:
    *   1. write compacted table files to `<path>__compacting`;
    *   2. rename `<path>` → `<path>__pre_compact` (data + marker tree
    *      leave together), rename `<path>__compacting` → `<path>`,
    *      delete `<path>__pre_compact`;
    *   3. re-register `tableName` over `<path>` with the same bucket
    *      spec.
    * A crash between the renames leaves every row recoverable on disk
    * (`__pre_compact` or `__compacting`) — never a half-compacted mix
    * under the live path.
    *
    * Clearing markers establishes a fresh dedup baseline: if the stopped
    * stream later resumes from a micro-batch whose engine checkpoint
    * commit didn't complete, that one batch re-appends (at-least-once)
    * and the NEXT compaction collapses it — the same residual-window
    * contract as `sinkToIndex`, now bounded per compaction cycle instead
    * of accumulating marker files forever.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, tableName: String,
              path: String, buckets: Int = 32): Unit = {
    import org.apache.hadoop.fs.Path
    val tmpTable = tableName + "__compacting"
    val tmpPath = path + "__compacting"
    val oldPath = path + "__pre_compact"
    val compacted = spark.table(tableName).dropDuplicates("term", "doc_id")
    val schemaDdl = compacted.schema.toDDL
    graft.sources.Sinks.writeIndex(compacted, tmpTable, tmpPath, buckets)
    spark.sql(s"DROP TABLE IF EXISTS ${quoteIdent(tmpTable)}") // files stay (external path)
    // Renames FIRST, catalog swap LAST: a crash mid-rename leaves the old
    // catalog entry pointing at whichever complete directory survives
    // (`path` or `__pre_compact`), and a crash before the swap leaves the
    // table registered over the already-compacted files — at no point is
    // the table unregistered while a reader could arrive.
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(oldPath), true) // clear any residue of a crashed compact
    if (!fs.rename(dst, new Path(oldPath)))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(new Path(tmpPath), dst))
      throw new java.io.IOException(s"compact: cannot install $tmpPath at $path")
    fs.delete(new Path(oldPath), true)
    // re-register the table over the compacted files with the identical
    // bucket spec (bucket ids live in the file names, so the new catalog
    // entry keeps bucket pruning over the renamed files). DROP + CREATE is
    // the narrowest remaining window, and runs only after the data swap
    // is durable — recovery from a crash here is re-running this DDL.
    spark.sql(s"DROP TABLE IF EXISTS ${quoteIdent(tableName)}")
    spark.sql(
      s"""CREATE TABLE ${quoteIdent(tableName)} ($schemaDdl) USING PARQUET
         |CLUSTERED BY (term) SORTED BY (term) INTO $buckets BUCKETS
         |LOCATION '${path.replace("'", "''")}'""".stripMargin)
  }

  /** Backtick-quote a (possibly db-qualified) table identifier for
    * interpolation into generated DDL.
    */
  private def quoteIdent(name: String): String =
    name.split('.').map(p => "`" + p.replace("`", "``") + "`").mkString(".")
}
