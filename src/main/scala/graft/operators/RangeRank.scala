package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT per-group rank by RANGE SORT — the shared
  * technique behind `Percentiles.exactQuantiles` and
  * `Mixing.targetMix`'s per-source sampling rank.
  *
  * A `Window.partitionBy(key).orderBy(...)` row_number caps parallelism
  * at the KEY CARDINALITY: with 3 group values, the whole relation
  * external-sorts in 3 tasks — a straggler wall at 100 TB that AQE
  * cannot split (it splits join/agg skew, never window partitions).
  * This formulation keeps parallelism data-sized:
  *
  *   1. `repartitionByRange(key, sort…)` + `sortWithinPartitions` — the
  *      one full-data exchange; a single hot key spans MANY partitions,
  *      each sorted on its value range (Spark's spillable external sort);
  *   2. partition-local positions from `monotonically_increasing_id`,
  *      which encodes (partition id << 33 | consecutive local counter) —
  *      no second full-data shuffle for ranking;
  *   3. a TINY per-(partition, key) stats relation (first local id +
  *      row count — at most #partitions × #keys rows) turns local
  *      positions into global ranks: global rank = local position
  *      − first local id + running offset of earlier partitions. AQE
  *      broadcasts it back whenever it is actually small (no forced
  *      hint: #keys is data-dependent and a forced broadcast of a
  *      high-cardinality key set is a driver OOM at exactly the scale
  *      this operator targets), so the full-data path never re-shuffles.
  *
  * Rank semantics are positional (`row_number`): ties take consecutive
  * ranks in partition-local order. With a TOTAL sort order (a unique
  * tie-break column) the rank is fully deterministic; with ties it is
  * deterministic per range layout — callers needing determinism must
  * supply a total order. NULLs in the sort expressions are NOT handled
  * specially — filter them first if their order matters.
  */
object RangeRank {

  /** Adds `_rn` (1-based rank of the row within `key`, ordered by the
    * already-materialized `sortCols`), `_n` (group size) and `_pid`
    * (the physical partition that ranked the row — exposed for
    * parallelism assertions) to `df`. Every column of `df` must be an
    * ORDERABLE type (no maps): they all join the range-partitioning
    * expression list — see the invariant below — so pre-project
    * unorderable payload away and join it back after ranking.
    */
  private[graft] def ranked(df: DataFrame, key: String, sortCols: Seq[String]): DataFrame = {
    // HARD REQUIREMENT: the stats branch and the rank branch below both
    // reference the same range exchange, and correctness depends on it
    // materializing ONCE (exchange reuse). Without reuse each branch
    // would sample its OWN range boundaries (RangePartitioner seeds from
    // the RDD id), the layouts would diverge, and the offsets joined
    // back by (_pid, key) would describe the wrong partitions — silently
    // wrong ranks. Fail loudly instead.
    require(df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "RangeRank.ranked requires spark.sql.exchange.reuse=true " +
        "(rank offsets are only valid against a single materialization of the range exchange)")
    // A CACHED relation anywhere in the input lineage silently defeats
    // that reuse: the two branch subtrees containing an
    // InMemoryTableScan stop canonicalizing equal, TWO range exchanges
    // materialize with independently sampled boundaries, and the
    // offsets describe the wrong layout (observed: duplicate ranks,
    // max rank > group size, 944 order violations on a 60k-row input).
    // Refuse loudly — serve cached state through a parquet store
    // (`SessionStores.servedPath`), whose scan canonicalizes stably.
    require(!df.queryExecution.optimizedPlan.exists {
        case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => true
        case _ => false
      },
      "RangeRank.ranked input lineage contains a cached (persisted) relation, " +
        "which breaks range-exchange reuse and corrupts ranks — materialize it " +
        "to a parquet store (SessionStores.servedPath) or unpersist it first")
    val inputCols = df.columns.toSeq
    require(sortCols.forall(inputCols.contains),
      s"sort columns must be materialized on the input: ${sortCols.mkString(", ")}")
    // EXPLICIT partition count: both consuming branches below re-evaluate
    // spark_partition_id/monotonically_increasing_id over their own read
    // of the (reused) exchange, so the partition layout MUST be identical
    // across reads. A numbered repartition is exempt from AQE's shuffle-
    // read rewrites (coalescing/skew-split), which pins the layout; the
    // count is the session's shuffle width — the cluster-sizing dial.
    val numParts = df.sparkSession.sessionState.conf.numShufflePartitions
    // EVERY input column joins the range-partitioning expression list,
    // AFTER the (key, sort…) prefix so it can never change the rank
    // order (lexicographic — the prefix dominates; extra columns only
    // break ties, which are rank-interchangeable by contract). This is
    // load-bearing for exchange REUSE, not a style choice: a column the
    // partitioner does not reference is fair game for column pruning,
    // and since the stats branch below needs fewer columns than the
    // rank branch, pruning would specialize the two copies of the
    // exchange subtree differently — they stop canonicalizing equal,
    // TWO range exchanges materialize with independently sampled
    // boundaries, and the offsets silently describe the wrong layout
    // (observed: 15k/20k wrong ranks the moment a prunable column
    // existed).
    val rangeCols = (key +: sortCols) ++ inputCols.diff(key +: sortCols)
    val sorted = df
      .repartitionByRange(numParts, rangeCols.map(col): _*)
      .sortWithinPartitions(rangeCols.map(col): _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", spark_partition_id())
    // per-(partition, key) stats: ≤ #partitions × #keys rows
    val stats = sorted.groupBy(col("_pid"), col(key))
      .agg(min(col("_mid")).as("_m0"), count(lit(1)).as("_c"))
    val wKey = Window.partitionBy(key)
    val offsets = stats
      .withColumn("_off", coalesce(
        sum(col("_c")).over(wKey.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("_n", sum(col("_c")).over(wKey))
      .select(col("_pid"), col(key), col("_m0"), col("_off"), col("_n"))
    // Correctness is join-strategy-independent: _mid/_pid are computed
    // BELOW any join exchange, against the pinned range layout, so even
    // a shuffle join only costs time.
    sorted.join(offsets, Seq("_pid", key))
      .withColumn("_rn", col("_mid") - col("_m0") + col("_off") + 1)
      .select((inputCols.map(col) :+ col("_rn") :+ col("_n") :+ col("_pid")): _*)
  }
}
