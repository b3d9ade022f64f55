package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared machinery of the streaming stores (`StreamingIndex`,
  * `StreamingDedup`, `StreamingEmbed`): the per-batch commit-marker
  * replay gate, and the compact/recover rename-swap discipline for
  * plain-parquet sub-stores. One implementation so the three stores'
  * replay and crash contracts cannot silently drift apart.
  */
private[streaming] object StoreMaintenance {

  /** Run `body` exactly once per (store, scope, batchId): if the commit
    * marker exists the body is SKIPPED (a replayed batch) and false is
    * returned; otherwise the body runs, the marker is written AFTER it
    * completes (at-least-once — a crash in between re-runs the body on
    * replay, the stores' documented residual window), and true is
    * returned.
    */
  def runOnce(hadoopConf: org.apache.hadoop.conf.Configuration, store: String,
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
  def noopExecute(batch: DataFrame): Unit =
    batch.write.format("noop").mode("overwrite").save()

  def readOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Collapse a parquet sub-store to key-distinct rows: dedup, rewrite
    * to a side directory, swap via two renames — a crash at any point
    * leaves every row recoverable on disk (`recoverSub` finishes or
    * unwinds), never a half-compacted live store.
    */
  def compactSub(spark: SparkSession, path: String, schema: StructType,
                 keys: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return
    fs.delete(new Path(path + "__compacting"), true) // clear rewrite residue
    readOrEmpty(spark, path, schema).dropDuplicates(keys)
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
  def swapInto(spark: SparkSession, path: String): Unit = {
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
  def recoverSub(spark: SparkSession, path: String): Unit = {
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
