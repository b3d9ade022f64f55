package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.operators.{Dedup, FuzzyJoin}

/** Incremental SymSpell fuzzy matching over a URL STREAM — the
  * streaming twin of the batch `FuzzyJoin.ed1Pairs` (whose output is
  * the oracle-checked `q_fuzzy_urls`), and the crawl-frontier shape
  * the operator exists for: a frontier receives URLs continuously, and
  * re-running the full variant self-join per batch is O(corpus) work
  * per micro-batch.
  *
  * The incremental contract mirrors `StreamingDedup`'s signature
  * store: per micro-batch only the NEW urls' {identity} ∪ {1-deletion}
  * variants are computed; candidates come from an equi-join of the new
  * batch's variants against the accumulated VARIANT STORE (variants
  * are precomputed at ingest, so the store is scanned — two string
  * columns — never recomputed and never shuffled; the micro-batch side
  * broadcasts under the row cap); `levenshtein` verifies candidates
  * only. A pair is found exactly once — in the batch where the LATER
  * endpoint arrives (new×store) or where both arrive (new×new, the
  * new side being part of the accumulated relation by union).
  *
  * EQUIVALENCE: every ED-1 pair shares a variant (the identity entry
  * covers insert/delete pairs — see `FuzzyJoin`), each unordered pair
  * has a unique "later batch", and verification is the identical
  * levenshtein — so the accumulated pair store equals `ed1Pairs` over
  * the union of all batches (FuzzyStreamSpec proves set equality; the
  * `q_fuzzy_urls_streamed` row hash-checks it under the batch oracle).
  *
  * STORE LAYOUT under `storePath`:
  *   - `vars/`  (url, v, ingest_ms): each ingested url's variant rows;
  *   - `pairs/` (url_a, url_b): verified ED-1 pairs;
  *   - `_graft_commits/<scope>/<batchId>`: idempotent-replay markers.
  * URLs are VALUES (no version semantics — a re-sent url is the same
  * url), so the read accessors just distinct; `compactStore` restores
  * key uniqueness across the replay residual window.
  */
object StreamingFuzzy {

  private[graft] def varsPath(store: String) = s"$store/vars"
  private[graft] def pairsPath(store: String) = s"$store/pairs"

  /** Same scale as `StreamingEmbed.MaxBroadcastKeyRows`: variant rows
    * are short strings, a backfill batch over the cap joins by shuffle
    * once instead of OOMing the driver.
    */
  private[graft] val MaxBroadcastVarRows: Long = 240000L

  private val varSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("v", StringType),
    StructField("ingest_ms", LongType)))
  private val pairSchema = StructType(Seq(
    StructField("url_a", StringType),
    StructField("url_b", StringType)))

  /** Start the incremental fuzzy-pair sink: `urls` must stream a
    * `url STRING` column (extra columns ignored).
    */
  def sinkFuzzyPairs(urls: DataFrame, storePath: String,
                     checkpointDir: String): StreamingQuery = {
    val conf = urls.sparkSession.sparkContext.hadoopConfiguration
    val scope = StreamingIndex.commitScope(checkpointDir, conf)
    StoreMaintenance.registeredStart(conf, storePath) {
      urls.writeStream
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
                                  scope: String = "default"): Boolean = {
    val spark = batch.sparkSession
    StoreMaintenance.runOnce(spark.sparkContext.hadoopConfiguration,
      storePath, scope, batchId) {
      val stamp = StoreMaintenance.nextStamp()
      val newV = Dedup.materializeOnce(
        batch.select(col("url")).filter(col("url").isNotNull).distinct()
          .select(col("url"), explode(FuzzyJoin.variants(col("url"))).as("v")))
      val storeVars = StoreMaintenance.readOrEmpty(spark, varsPath(storePath), varSchema)
      val allVars = storeVars.select("url", "v").unionByName(newV)
      val newSide = newV.select(col("v"), col("url").as("_nu"))
      val probe =
        if (newV.count() <= MaxBroadcastVarRows) broadcast(newSide) else newSide
      val newPairs = allVars.join(probe, "v")
        .filter(col("url") =!= col("_nu"))
        .select(least(col("url"), col("_nu")).as("url_a"),
          greatest(col("url"), col("_nu")).as("url_b"))
        .distinct()
        .filter(levenshtein(col("url_a"), col("url_b")) === 1)
      newV.withColumn("ingest_ms", lit(stamp))
        .coalesce(1).write.mode(SaveMode.Append).parquet(varsPath(storePath))
      newPairs.coalesce(1).write.mode(SaveMode.Append).parquet(pairsPath(storePath))
    }
  }

  /** The accumulated verified ED-1 pair relation — exact across the
    * replay residual window and under re-sent urls (urls are values;
    * distinct is the whole collapse).
    */
  def pairs(spark: SparkSession, storePath: String): DataFrame =
    StoreMaintenance.readOrEmpty(spark, pairsPath(storePath), pairSchema)
      .select("url_a", "url_b").distinct()

  /** Every ingested url (the accumulated frontier). */
  def urls(spark: SparkSession, storePath: String): DataFrame =
    StoreMaintenance.readOrEmpty(spark, varsPath(storePath), varSchema)
      .select("url").distinct()

  /** Collapse replay-residual duplicates and per-batch small files —
    * the collapse is the accessors' own distinct rule.
    */
  def compactStore(spark: SparkSession, storePath: String): Unit = {
    StoreMaintenance.assertIngestStopped(spark.sparkContext.hadoopConfiguration, storePath)
    StoreMaintenance.compactSub(spark, varsPath(storePath), varSchema, Seq("url", "v"))
    StoreMaintenance.compactSub(spark, pairsPath(storePath), pairSchema,
      Seq("url_a", "url_b"))
    val commits = new org.apache.hadoop.fs.Path(s"$storePath/_graft_commits")
    commits.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(commits, true): Unit
  }

  def recoverStore(spark: SparkSession, storePath: String): Unit =
    Seq(varsPath(storePath), pairsPath(storePath)).foreach { p =>
      StoreMaintenance.recoverSub(spark, p)
    }
}
