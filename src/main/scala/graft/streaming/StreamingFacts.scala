package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Generic incremental KEYED-FACT store — `StreamingEvents`' immutable-
  * fact contract generalized to any row shape: facts accumulate
  * idempotently under a caller-declared key column, and every analysis
  * is the identical batch declaration over the accumulated relation
  * (the `q_quality_gate_streamed` family rides the corpus shaped this
  * way). A re-sent or replay-re-appended fact is byte-identical to its
  * first copy, so the read accessor's `dropDuplicates(key)` restores
  * exact-once semantics over the at-least-once append.
  *
  * The SCHEMA AND KEY ARE STORE STATE, not per-call parameters: the
  * first append persists both in a `_graft_schema` sidecar (key line +
  * DDL line) and accessors resolve from it — the r15 `StreamingGraph`
  * keyType lesson applied from the start. The caller's arguments only
  * matter for a never-written store (empty read / first ingest).
  *
  * Same marker/compact/recover machinery as the other value stores
  * (`StoreMaintenance`).
  */
object StreamingFacts {

  private[graft] def factsPath(store: String) = s"$store/facts"
  private[graft] def schemaPath(store: String) = s"$store/_graft_schema"

  /** (keyCol, schema) — persisted if the store was ever written, the
    * caller's fallback otherwise.
    */
  private[graft] def resolveShape(conf: org.apache.hadoop.conf.Configuration,
                                  storePath: String,
                                  fallback: (String, StructType)): (String, StructType) = {
    val p = new org.apache.hadoop.fs.Path(schemaPath(storePath))
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) fallback
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0L, buf) finally in.close()
      val lines = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
        .split("\n", 2)
      (lines(0).trim, StructType.fromDDL(lines(1).trim))
    }
  }

  /** Start the incremental fact sink: `facts` must stream rows carrying
    * every schema column (extra columns are dropped by the cast-select).
    */
  def sinkFacts(facts: DataFrame, storePath: String, checkpointDir: String,
                keyCol: String, schema: StructType): StreamingQuery = {
    val conf = facts.sparkSession.sparkContext.hadoopConfiguration
    val scope = StreamingIndex.commitScope(checkpointDir, conf)
    StoreMaintenance.registeredStart(conf, storePath) {
      facts.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val appended = processBatch(batch, batchId, storePath, keyCol, schema, scope)
          if (!appended) StoreMaintenance.noopExecute(batch)
        }
        .start()
    }
  }

  /** One idempotent incremental micro-batch (testable replay unit).
    * @param filesPerBatch ≥1 coalesces the append to that many files
    *                      (the SMALL-append default); 0 keeps the
    *                      batch's task parallelism — fact-table-grain
    *                      ingests (r17: the lineitem warehouse store)
    *                      must not funnel a third of the largest table
    *                      through one write task.
    * @return false = replay of a committed batchId, skipped.
    */
  private[graft] def processBatch(batch: DataFrame, batchId: Long, storePath: String,
                                  keyCol: String, schema: StructType,
                                  scope: String = "default",
                                  filesPerBatch: Int = 1): Boolean = {
    val conf = batch.sparkSession.sparkContext.hadoopConfiguration
    val (key, sch) = resolveShape(conf, storePath, (keyCol, schema))
    StoreMaintenance.runOnce(conf, storePath, scope, batchId) {
      // sidecar first: idempotent content, and a crash between sidecar
      // and append leaves only a correct shape record behind
      val p = new org.apache.hadoop.fs.Path(schemaPath(storePath))
      val out = p.getFileSystem(conf).create(p, true)
      try out.write((key + "\n" + sch.toDDL)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val projected = batch.select(sch.fields.toSeq.map(f =>
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType)): _*)
      (if (filesPerBatch >= 1) projected.coalesce(filesPerBatch) else projected)
        .write.mode(SaveMode.Append).parquet(factsPath(storePath))
    }
  }

  /** The accumulated fact relation — exact-once by the store's key
    * across the replay residual window.
    */
  def facts(spark: SparkSession, storePath: String,
            keyCol: String, schema: StructType): DataFrame = {
    val (key, sch) = resolveShape(spark.sparkContext.hadoopConfiguration,
      storePath, (keyCol, schema))
    StoreMaintenance.readOrEmpty(spark, factsPath(storePath), sch)
      .dropDuplicates(key)
  }

  /** Collapse replay-residual duplicates and per-batch small files —
    * the collapse is the accessor's own key dedup rule.
    */
  def compactStore(spark: SparkSession, storePath: String,
                   keyCol: String, schema: StructType): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    StoreMaintenance.assertIngestStopped(conf, storePath)
    val (key, sch) = resolveShape(conf, storePath, (keyCol, schema))
    StoreMaintenance.compactSub(spark, factsPath(storePath), sch, Seq(key))
    val commits = new org.apache.hadoop.fs.Path(s"$storePath/_graft_commits")
    commits.getFileSystem(conf).delete(commits, true): Unit
  }

  def recoverStore(spark: SparkSession, storePath: String): Unit =
    StoreMaintenance.recoverSub(spark, factsPath(storePath))
}
