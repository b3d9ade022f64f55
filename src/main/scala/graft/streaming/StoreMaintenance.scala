package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared machinery of the streaming stores (`StreamingIndex`,
  * `StreamingDedup`, `StreamingEmbed`): the per-batch commit-marker
  * replay gate, the compact/recover rename-swap discipline for
  * plain-parquet sub-stores, and the pause-compact-resume entry point
  * (`compactAll`) with its ingest-stopped enforcement. One
  * implementation so the three stores' replay and crash contracts
  * cannot silently drift apart.
  */
object StoreMaintenance {

  /** In-process registry of active ingest queries per (qualified) store
    * path — every `sink*` start registers here, and every compact
    * REFUSES while ANY registered query over the path is still active:
    * compacting under a live appender would race the directory swap,
    * silently corrupting the store it claims to maintain. SET-valued:
    * two sinks mistakenly started over one store (exactly the operator
    * error this guard exists to catch) must both stay visible — a
    * last-write-wins slot would let stopping the second unlock a
    * compact while the first still appends. Entries are either live
    * `StreamingQuery`s or PENDING tokens: a sink registers the path
    * BEFORE calling `.start()` (`beginIngest`) and swaps the token for
    * the query afterwards (`completeIngest`), so there is no window in
    * which a compact racing the stream's own startup could pass the
    * guard. In-process scope is the honest contract: a store fed by a
    * query in ANOTHER JVM cannot be detected from here, and the
    * pause-compact-resume discipline for multi-process deployments
    * remains an operational rule.
    */
  private val activeIngest =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Set[AnyRef]]()

  /** Pending-startup token: counts as ACTIVE for the compact guard until
    * the sink swaps it for the started query (or aborts a failed start).
    */
  private[streaming] final class PendingIngest

  private def entryActive(e: AnyRef): Boolean = e match {
    case q: org.apache.spark.sql.streaming.StreamingQuery => q.isActive
    case _: PendingIngest => true
    case _ => false
  }

  /** One spelling per store: equivalent relative/absolute/scheme-
    * qualified paths must collide in the registry, or a compact aimed at
    * `/tmp/store` would miss the query registered over `file:/tmp/store`.
    */
  private def qualified(path: String,
                        conf: org.apache.hadoop.conf.Configuration): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).makeQualified(p).toString
  }

  /** Register a PENDING ingest over `storePath` — call BEFORE
    * `.start()`, then `completeIngest` with the started query (or
    * `abortIngest` if the start threw). The token holds the compact
    * guard closed across the startup window.
    */
  private[graft] def beginIngest(conf: org.apache.hadoop.conf.Configuration,
                                 storePath: String): PendingIngest = {
    // global sweep of stopped queries on every registration: without it a
    // long-lived JVM starting and stopping many streams over paths it
    // never compacts would pin every StreamingQuery ever started
    activeIngest.values.forEach(_.removeIf(e => !entryActive(e)))
    val token = new PendingIngest
    activeIngest.computeIfAbsent(qualified(storePath, conf),
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet()).add(token)
    token
  }

  /** Swap a pending token for its started query: the query is added
    * BEFORE the token is removed, so the guard never sees a gap.
    */
  private[graft] def completeIngest(conf: org.apache.hadoop.conf.Configuration,
                                    storePath: String, token: PendingIngest,
                                    query: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val qs = activeIngest.get(qualified(storePath, conf))
    if (qs != null) { qs.add(query); qs.remove(token): Unit }
  }

  /** Drop a pending token whose `.start()` threw — nothing is appending. */
  private[graft] def abortIngest(conf: org.apache.hadoop.conf.Configuration,
                                 storePath: String, token: PendingIngest): Unit = {
    val qs = activeIngest.get(qualified(storePath, conf))
    if (qs != null) qs.remove(token): Unit
  }

  /** Start a streaming sink with the begin/complete/abort registration
    * bracket — the one spelling all three stores share.
    */
  private[graft] def registeredStart(conf: org.apache.hadoop.conf.Configuration,
                                     storePath: String)(
      start: => org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val token = beginIngest(conf, storePath)
    val query =
      try start
      catch { case t: Throwable => abortIngest(conf, storePath, token); throw t }
    completeIngest(conf, storePath, token, query)
    query
  }

  /** Throw unless EVERY registered ingest query over `storePath` has
    * stopped (a PENDING startup token counts as active). Stopped entries
    * are swept; EMPTY sets are deliberately left in the map — removing
    * one by identity races a concurrent `beginIngest` that just added an
    * active entry to the same set instance, silently unregistering it.
    * An empty key-set per store-path-ever-compacted is a bounded,
    * harmless residue.
    */
  private[graft] def assertIngestStopped(conf: org.apache.hadoop.conf.Configuration,
                                         storePath: String): Unit = {
    val key = qualified(storePath, conf)
    val qs = activeIngest.get(key)
    if (qs != null) {
      qs.forEach {
        case q: org.apache.spark.sql.streaming.StreamingQuery if q.isActive =>
          throw new IllegalStateException(
            s"compact refused: streaming ingest query ${q.id} is still active over " +
              s"$storePath — stop it first (pause-compact-resume), then compact, " +
              "then restart from the same checkpoint")
        case _: PendingIngest =>
          throw new IllegalStateException(
            s"compact refused: a streaming ingest query is STARTING over $storePath " +
              "— wait for its startup to complete, stop it, then compact")
        case _ => ()
      }
      qs.removeIf(e => !entryActive(e)): Unit
    }
  }

  /** Pause-compact-resume over a whole deployment in one call: verify
    * that NO target still has an active ingest query (all checks run
    * before any compaction starts — a refused store must not leave the
    * others half-maintained), RECOVER any store left mid-swap by a
    * crashed previous maintenance run (idempotent), then compact every
    * streaming index table (`(tableName, path, buckets)` triples — the
    * bucket count is PER TABLE: one global value would silently rewrite
    * a 64-bucket table 32-bucketed and crash its resumed ingest on the
    * bucketing mismatch) and every dedup/embed store.
    */
  def compactAll(spark: SparkSession,
                 indexTables: Seq[(String, String, Int)] = Nil,
                 dedupStores: Seq[String] = Nil,
                 embedStores: Seq[String] = Nil): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    (indexTables.map(_._2) ++ dedupStores ++ embedStores)
      .foreach(assertIngestStopped(conf, _))
    indexTables.foreach { case (tbl, path, buckets) =>
      StreamingIndex.recoverCompact(spark, tbl, path, buckets)
      // a provisioned-but-never-ingested table (no first batch = no
      // files) has nothing to compact — compacting it anyway would throw
      // and leave every LATER store unmaintained. Path presence alone is
      // the invariant: recoverCompact above (re-)registered the catalog
      // entry for any existing path.
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        StreamingIndex.compact(spark, tbl, path, buckets)
    }
    dedupStores.foreach { s =>
      StreamingDedup.recoverStore(spark, s) // compactSub also self-heals; explicit for symmetry
      StreamingDedup.compactStore(spark, s)
    }
    embedStores.foreach { s =>
      StreamingEmbed.recoverStore(spark, s)
      StreamingEmbed.compactStore(spark, s)
    }
  }

  /** Strictly-increasing version stamp for store rows (latest-wins
    * collapse): wall-clock ms, bumped past the previous stamp when two
    * calls land in the same millisecond or the clock steps backwards —
    * within one JVM a later batch ALWAYS stamps strictly newer, so a
    * corrective re-send can never tie (and lose) against the version it
    * replaces. ACROSS JVM restarts plain wall clock applies: same-ms
    * ties are impossible (a restart takes far longer), but a clock
    * stepped BACKWARDS across the restart boundary can stamp a newer
    * write older than rows from the previous process — host clock
    * discipline (slewing, not stepping) is an operational requirement
    * of the latest-wins contract, as it is for any wall-clock-versioned
    * store.
    */
  private val lastStamp = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] def nextStamp(): Long =
    lastStamp.updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis()))

  /** Run `body` exactly once per (store, scope, batchId): if the commit
    * marker exists the body is SKIPPED (a replayed batch) and false is
    * returned; otherwise the body runs, the marker is written AFTER it
    * completes (at-least-once — a crash in between re-runs the body on
    * replay, the stores' documented residual window), and true is
    * returned.
    */
  private[graft] def runOnce(hadoopConf: org.apache.hadoop.conf.Configuration, store: String,
              scope: String, batchId: Long)(body: => Unit): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(s"$store/_graft_commits/$scope/$batchId")
    val fs = marker.getFileSystem(hadoopConf)
    if (fs.exists(marker)) false
    else {
      body
      fs.create(marker, true).close()
      true
    }
  }

  /** Execute a SKIPPED replay batch through the noop sink: the engine
    * validates that every stateful operator in the micro-batch committed
    * its state store, and an unexecuted batch fails with
    * STATE_STORE_COMMIT_VALIDATION_FAILED. The noop sink drives the
    * plan — state advances, nothing is written.
    */
  private[graft] def noopExecute(batch: DataFrame): Unit =
    batch.write.format("noop").mode("overwrite").save()

  private[graft] def readOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Collapse a parquet sub-store to key-distinct rows: dedup, rewrite
    * to a side directory, swap via two renames — a crash at any point
    * leaves every row recoverable on disk (`recoverSub` finishes or
    * unwinds), never a half-compacted live store.
    *
    * Recovers FIRST: a previous compact may have crashed between the
    * renames, leaving the rows only in a side directory. A silent no-op
    * on the missing live dir, followed by the caller's commit-marker
    * clear, would report success while this sub-store serves empty reads
    * — so the crashed state is restored (idempotent) before compacting.
    * Only a store with NO live dir and NO side dirs — genuinely never
    * written — is a true no-op.
    */
  private[graft] def compactSub(spark: SparkSession, path: String, schema: StructType,
                 keys: Seq[String]): Unit =
    compactSubWith(spark, path, schema, _.dropDuplicates(keys))

  /** `compactSub` with a caller-supplied collapse (for sub-stores whose
    * read accessors collapse rows by a DETERMINISTIC rule rather than an
    * arbitrary-survivor key dedup — compaction must apply the SAME rule,
    * or the version the accessors serve silently flips across a compact).
    */
  private[graft] def compactSubWith(spark: SparkSession, path: String, schema: StructType,
                                    collapse: DataFrame => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    recoverSub(spark, path) // restores a crashed swap; clears side-dir residue
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return
    collapse(readOrEmpty(spark, path, schema))
      .write.mode(SaveMode.Overwrite).parquet(path + "__compacting")
    swapInto(spark, path)
  }

  /** The two-rename directory swap every compaction ends with: install
    * the completed `<path>__compacting` rewrite at `path`, moving the
    * previous live directory aside as `<path>__pre_compact` and dropping
    * it once the install lands. A crash at any point leaves either the
    * originals or the rewrite complete on disk (`recoverSub`'s crash
    * windows) — shared so the index compact and the sub-store compacts
    * cannot drift.
    */
  private[graft] def swapInto(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val (live, tmp, old) =
      (new Path(path), new Path(path + "__compacting"), new Path(path + "__pre_compact"))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(old, true) // residue of a previous crashed compact
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"swapInto: cannot move $path aside")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"swapInto: cannot install $tmp at $path")
    fs.delete(old, true): Unit
  }

  /** Finish or unwind an interrupted `compactSub`-style rename swap at
    * ANY crash point. A live path survives as-is (pending rewrites
    * discarded); a swapped-out one is restored from whichever complete
    * side directory survives (`__compacting` preferred — it was written
    * complete before the first rename — falling back to the
    * `__pre_compact` originals); nothing at all is a no-op.
    */
  private[graft] def recoverSub(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(path)
    val (tmp, old) = (new Path(path + "__compacting"), new Path(path + "__pre_compact"))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live)) {
      if (fs.exists(tmp)) {
        if (!fs.rename(tmp, live))
          throw new java.io.IOException(s"recoverSub: cannot install $tmp at $path")
      } else if (fs.exists(old)) {
        if (!fs.rename(old, live))
          throw new java.io.IOException(s"recoverSub: cannot restore $old at $path")
      }
    }
    fs.delete(tmp, true); fs.delete(old, true): Unit
  }
}
