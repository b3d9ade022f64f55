package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SEQUENCE PACKING (concat-and-chunk) — the pretraining batch-prep
  * step: documents are concatenated in a canonical order and the token
  * stream is cut into fixed-budget training sequences; every document
  * needs its global token offsets and the chunk range it lands in.
  *
  * The global prefix sum is the scale problem: a
  * `Window.orderBy(doc_id)` running sum serializes the WHOLE corpus
  * through one task. This operator computes it with the `RangeRank`
  * two-pass shape instead — one `repartitionByRange(doc_id)` exchange
  * (data-sized parallelism, spillable sorts), a TINY per-partition
  * totals relation whose prefix offsets are a #partitions-sized window,
  * and partition-LOCAL running sums (parallel per partition) shifted by
  * the broadcast offsets.
  *
  * The same exchange-reuse invariants as `RangeRank.ranked` apply (the
  * stats and local-sum branches must read ONE materialization of the
  * range exchange): exchange reuse required, cached input lineage
  * refused, and every input column joins the range expression list so
  * column pruning cannot specialize the two subtrees apart. Inputs are
  * pre-projected to exactly (doc_id, n_tok) for that reason.
  */
object Packing {

  /** Global token offsets + chunk assignment for a (doc_id, n_tok)
    * relation in doc_id order. Returns (doc_id, n_tok, start_tok,
    * end_tok, first_chunk, last_chunk); zero-token docs carry NULL
    * chunk bounds (they occupy no tokens).
    */
  def packedOffsets(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"chunk budget must be positive, got $budget")
    globalPrefix(docs.select(col("doc_id").cast("long").as("doc_id"),
        col("n_tok").cast("long").as("n_tok")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("start_tok"), col("end_tok"),
        when(col("n_tok") > 0, floor(col("start_tok") / budget).cast("long"))
          .as("first_chunk"),
        when(col("n_tok") > 0, floor((col("end_tok") - 1) / budget).cast("long"))
          .as("last_chunk"))
  }

  /** `packedOffsets` in md5-SHUFFLED order — the deterministic
    * pseudo-random permutation a training-shard export wants (adjacent
    * doc_ids decorrelate so no shard is a contiguous crawl slice), as a
    * RANK, not an engine-private partitioner state: h = the 48-bit md5
    * prefix of the decimal doc_id, so any engine recomputes the same
    * order (the export-manifest oracle does, as a hex cast). The order
    * key is (h, doc_id) — doc_id breaks the astronomically-unlikely
    * 48-bit tie, keeping the permutation total. Same two-pass
    * prefix-sum shape and exchange-reuse invariants as `packedOffsets`
    * (the scale note in the class doc). Drops nothing: zero-token docs
    * pass through with start_tok = end_tok.
    *
    * Returns (doc_id, n_tok, h, start_tok, end_tok); the caller's
    * shard assignment is `floor(start_tok / shardBudget)`.
    */
  def shuffledOffsets(docs: DataFrame): DataFrame =
    globalPrefix(
      docs.select(col("doc_id").cast("long").as("doc_id"),
          col("n_tok").cast("long").as("n_tok"))
        .withColumn("h",
          conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
            .cast("long")),
      Seq("h", "doc_id"))
      .select(col("doc_id"), col("n_tok"), col("h"),
        col("start_tok"), col("end_tok"))

  /** The shared global-prefix-sum core: exclusive running token sum
    * over `df` ordered by `keys` (unique per row by contract), via ONE
    * `repartitionByRange` exchange, a #partitions-sized totals window,
    * and partition-local running sums — never a single-task global
    * window. EVERY input column joins the range expression list so
    * column pruning cannot specialize the two exchange subtrees apart
    * (the `RangeRank.ranked` invariants).
    */
  private def globalPrefix(df: DataFrame, keys: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    require(spark.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "Packing requires spark.sql.exchange.reuse=true " +
        "(prefix offsets are only valid against a single materialization of the range exchange)")
    require(!df.queryExecution.optimizedPlan.exists {
        case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => true
        case _ => false
      },
      "Packing input lineage contains a cached (persisted) relation, " +
        "which breaks range-exchange reuse and corrupts offsets — materialize it " +
        "to a parquet store (SessionStores.servedPath) or unpersist it first")
    val numParts = spark.sessionState.conf.numShufflePartitions
    // keys lead the range list in order; the rest (n_tok) trail so no
    // prunable column can specialize the two exchange subtrees apart
    val ordered = keys.map(col) ++ df.columns.filterNot(keys.contains).map(col)
    val sorted = df
      .repartitionByRange(numParts, ordered: _*)
      .sortWithinPartitions(ordered: _*)
      .withColumn("_pid", spark_partition_id())
    // per-partition token totals: #partitions rows; the prefix window
    // over them is metadata-sized, never the corpus
    val offsets = sorted.groupBy("_pid").agg(sum(col("n_tok")).as("_psum"))
      .withColumn("_off", coalesce(
        sum(col("_psum")).over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_off"))
    // partition-LOCAL exclusive running sum: parallel per partition
    val local = sorted.withColumn("_lsum", coalesce(
      sum(col("n_tok")).over(
        Window.partitionBy("_pid").orderBy(keys.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)))
    local.join(offsets, "_pid")
      .withColumn("start_tok", col("_off") + col("_lsum"))
      .withColumn("end_tok", col("start_tok") + col("n_tok"))
  }
}
