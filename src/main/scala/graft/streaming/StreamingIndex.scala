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
                  checkpointDir: String, buckets: Int = 32,
                  migrateLegacyMarkers: Boolean = false): StreamingQuery = {
    val conf = postings.sparkSession.sparkContext.hadoopConfiguration
    val scope = commitScope(checkpointDir, conf)
    // EXPLICIT one-time migration: marker trees written before scopes were
    // filesystem-qualified hash the RAW checkpoint string. An upgrading
    // deployment passes migrateLegacyMarkers=true ONCE; the legacy tree is
    // RENAMED into the qualified scope before the stream starts, so a batch
    // replayed across the upgrade still sees its old marker. The default is
    // OFF because the legacy scope does not identify a lineage: a FRESH
    // stream whose raw checkpoint spelling happens to collide with an old
    // run's (relative path from another cwd, same spelling on another
    // filesystem) would otherwise find legacy markers for batchIds 0..N and
    // silently drop its first batches — the exact loss mode qualified
    // scoping exists to prevent. The rename also makes the window expire by
    // construction: after one migrated start the legacy tree is gone.
    if (migrateLegacyMarkers)
      migrateLegacyScope(path, legacyCommitScope(checkpointDir), scope, conf)
    StoreMaintenance.registeredStart(conf, path) {
      postings.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val appended = appendBatch(batch, batchId, tableName, path, buckets, scope)
          // a SKIPPED replay must still EXECUTE the batch plan: the engine
          // validates that every stateful operator in the micro-batch
          // (dropDuplicatesWithinWatermark here) committed its state store,
          // and an unexecuted batch fails with
          // STATE_STORE_COMMIT_VALIDATION_FAILED. The noop sink drives the
          // plan — state advances, nothing is written.
          if (!appended) batch.write.format("noop").mode("overwrite").save()
        }
        .start()
    }
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
    * vs the qualified 'file:/tmp/ckpt') — used only by the OPT-IN one-time
    * migration (`sinkToIndex(migrateLegacyMarkers = true)`) of marker trees
    * written by pre-qualification releases. Never consulted on lookup.
    */
  private[graft] def legacyCommitScope(checkpointDir: String): String =
    md5Scope(checkpointDir)

  private def md5Scope(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  /** One-time marker-tree migration (see `sinkToIndex`): rename the legacy
    * (raw-string-hashed) marker tree into the qualified scope. If the
    * qualified tree already exists — e.g. the stream already ran once
    * post-upgrade — individual markers are moved only where no qualified
    * marker claims that batchId (the qualified marker is newer truth), and
    * the legacy tree is removed either way so the migration never re-runs.
    */
  private[graft] def migrateLegacyScope(path: String, legacyScope: String, scope: String,
                                        hadoopConf: org.apache.hadoop.conf.Configuration): Unit = {
    if (legacyScope == scope) return
    import org.apache.hadoop.fs.Path
    val legacyDir = new Path(s"$path/_graft_commits/$legacyScope")
    val fs = legacyDir.getFileSystem(hadoopConf)
    if (!fs.exists(legacyDir)) return
    val dst = new Path(s"$path/_graft_commits/$scope")
    if (!fs.exists(dst)) {
      fs.mkdirs(dst.getParent)
      if (!fs.rename(legacyDir, dst))
        throw new java.io.IOException(s"migrateLegacyScope: cannot rename $legacyDir to $dst")
    } else {
      // every unclaimed marker must MOVE before the legacy tree goes: a
      // swallowed rename failure followed by the delete would erase a
      // commit marker, and the engine would re-append that batch on
      // replay — the exact duplication the markers prevent
      fs.listStatus(legacyDir).foreach { st =>
        val t = new Path(dst, st.getPath.getName)
        if (!fs.exists(t) && !fs.rename(st.getPath, t))
          throw new java.io.IOException(
            s"migrateLegacyScope: cannot move marker ${st.getPath} to $t")
      }
      fs.delete(legacyDir, true): Unit
    }
  }

  /** One idempotent micro-batch append (factored out of `sinkToIndex` so
    * replay behavior is directly testable). @return whether the batch was
    * appended (false = replay of an already-committed batchId within the
    * same checkpoint scope, skipped).
    */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long, tableName: String,
                                 path: String, buckets: Int,
                                 scope: String = "default"): Boolean = {
    val spark = batch.sparkSession
    StoreMaintenance.runOnce(spark.sparkContext.hadoopConfiguration,
      path, scope, batchId) {
      // Register the external table BEFORE the first append of this
      // session: a table-CREATING `saveAsTable(Append)` is a CTAS, and
      // Spark's CTAS job CLEARS the target location — in a fresh session
      // over an existing on-disk index (catalog entry gone after a JVM
      // restart, files still there) that would silently wipe every
      // committed batch AND the marker tree before writing the new one.
      // Registering first makes the append always take the
      // insert-into-existing-table path, which never clears.
      if (!spark.catalog.tableExists(tableName))
        registerBucketedTable(spark, tableName, path, buckets, batch.schema.toDDL)
      batch.write.mode(SaveMode.Append)
        .option("path", path)
        .bucketBy(buckets, "term").sortBy("term")
        .saveAsTable(tableName)
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
    * live appender would race the directory swap. Enforced in-process:
    * the call REFUSES (throws) while a `sinkToIndex` query registered
    * over `path` is still active (`StoreMaintenance.assertIngestStopped`;
    * `StoreMaintenance.compactAll` runs the whole deployment's
    * compactions behind one such check).
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
    * under the live path; `recoverCompact` finishes or unwinds an
    * interrupted run from any of these states.
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
    StoreMaintenance.assertIngestStopped(spark.sparkContext.hadoopConfiguration, path)
    val tmpTable = tableName + "__compacting"
    val compacted = spark.table(tableName).dropDuplicates("term", "doc_id")
    val schemaDdl = compacted.schema.toDDL
    graft.sources.Sinks.writeIndex(compacted, tmpTable, path + "__compacting", buckets)
    spark.sql(s"DROP TABLE IF EXISTS ${quoteIdent(tmpTable)}") // files stay (external path)
    // Renames FIRST, catalog swap LAST: a crash mid-rename leaves the old
    // catalog entry pointing at whichever complete directory survives
    // (`path` or `__pre_compact`), and a crash before the swap leaves the
    // table registered over the already-compacted files — at no point is
    // the table unregistered while a reader could arrive. The swap itself
    // is the shared StoreMaintenance machinery (same crash windows as the
    // dedup/embed store compacts, recovered by the same recoverSub).
    StoreMaintenance.swapInto(spark, path)
    // re-register the table over the compacted files with the identical
    // bucket spec (bucket ids live in the file names, so the new catalog
    // entry keeps bucket pruning over the renamed files). DROP + CREATE is
    // the narrowest remaining window, and runs only after the data swap
    // is durable — recovery from a crash here is `recoverCompact` (which
    // re-runs this DDL).
    registerBucketedTable(spark, tableName, path, buckets, schemaDdl)
  }

  /** Recover from a compact() interrupted at ANY point — the executable
    * form of the crash-recovery contract compact() documents. Safe to run
    * unconditionally before restarting ingest after an unclean shutdown:
    *   - crash BEFORE the first rename: the live path is intact; the
    *     side-dir rewrite (`__compacting`) is discarded — compact simply
    *     re-runs later;
    *   - crash BETWEEN the renames: the live path is absent and the
    *     compacted files sit complete in `__compacting` — they are
    *     installed at the live path and the pre-compact copy dropped
    *     (falling back to the `__pre_compact` originals if the rewrite
    *     is gone, e.g. manually cleared);
    *   - crash AFTER the swap but before/inside the DDL: the files are
    *     already final — the table is just re-registered.
    * In every case the catalog entry is re-created over the surviving
    * live path with the identical bucket spec, and both side directories
    * are cleared, so a subsequent compact() starts clean. When NO state
    * exists at all (fresh deployment, or a crash before the first batch
    * ever appended) there is nothing to recover and the call is a no-op
    * — "run unconditionally" must hold for a restart script's first run.
    */
  def recoverCompact(spark: org.apache.spark.sql.SparkSession, tableName: String,
                     path: String, buckets: Int = 32): Unit = {
    // the path-level rename-swap recovery is the shared store machinery
    // (install __compacting, else restore __pre_compact, clear side
    // dirs); only the catalog re-registration is index-specific
    StoreMaintenance.recoverSub(spark, path)
    val dst = new org.apache.hadoop.fs.Path(path)
    if (!dst.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(dst))
      return // fresh deployment: nothing to recover, nothing to register
    val schemaDdl = spark.read.parquet(path).schema.toDDL
    registerBucketedTable(spark, tableName, path, buckets, schemaDdl)
  }

  /** (Re-)register `tableName` as an external bucketed parquet table over
    * `path` — the shared final step of compact() and recoverCompact().
    */
  private def registerBucketedTable(spark: org.apache.spark.sql.SparkSession,
                                    tableName: String, path: String, buckets: Int,
                                    schemaDdl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${quoteIdent(tableName)}")
    spark.sql(
      s"""CREATE TABLE ${quoteIdent(tableName)} ($schemaDdl) USING PARQUET
         |CLUSTERED BY (term) SORTED BY (term) INTO $buckets BUCKETS
         |LOCATION '${path.replace("'", "''")}'""".stripMargin): Unit
  }

  /** Backtick-quote a (possibly db-qualified) table identifier for
    * interpolation into generated DDL.
    */
  private def quoteIdent(name: String): String =
    name.split('.').map(p => "`" + p.replace("`", "``") + "`").mkString(".")
}
