package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers: two-phase SALTED aggregation for associative
  * aggregates over hot keys. A single `groupBy(key)` sends every row of
  * a hot key to one reducer; salting splits each key into `salts`
  * sub-groups (phase 1, partial per (key, salt)), then combines the tiny
  * per-salt partials (phase 2, |keys|×salts rows). AQE's skew handling
  * covers JOIN skew at runtime; aggregation skew on a pathological key
  * distribution is the case this addresses explicitly.
  *
  * The salt is deterministic (hash of the full row, mod `salts`) so
  * results are reproducible and oracle-checkable; which salt a row lands
  * on is irrelevant to the final aggregate.
  */
object Skew {

  private def salt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(salts))

  /** COUNT(*) per key, salted. Equivalent to
    * `df.groupBy(key).count()` with the hot-key shuffle split `salts` ways.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(df, salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("count"))

  /** SUM(value) per key, salted. */
  def saltedSum(df: DataFrame, key: String, value: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(df, salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("sum"))

  /** Salted EQUI-JOIN for a skewed probe side: the big (skewed) side gets
    * a deterministic salt, the small side is REPLICATED once per salt
    * (explode of a literal range — `salts`× the small relation, which
    * must therefore be the dimension side), and the join key becomes
    * (key, salt) — a hot key's rows now spread over `salts` tasks
    * instead of funneling into one.
    *
    * This is the explicit fallback for when AQE's runtime skew-join
    * splitting can't apply (e.g. the skewed side already aggregated, or
    * a sort-merge join forced by a non-splittable stage boundary). Join
    * semantics are inner, 1:n preserved — each big-side row matches
    * exactly the small-side rows it would have matched unsalted.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(big, salts))
    val replicated = small
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig
      .join(replicated,
        saltedBig(bigKey) === replicated(smallKey) &&
          saltedBig("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** OBSERVED salt fan: how many salts does this key distribution
    * actually need? One bounded statistics job — sample the key column
    * (fixed seed, so the decision is deterministic and oracle-safe),
    * count per sampled key, take the max — then scale the hottest key's
    * estimated TRUE row count (`maxSampled / fraction`) against
    * `hotKeyRows`, the row count one task is expected to absorb.
    *
    * The test is ABSOLUTE, mirroring AQE's skew-join trigger
    * (`skewedPartitionThresholdInBytes`): a relative max/avg ratio is
    * sampling-noise-bound near its threshold and, more importantly,
    * salting only pays for itself when a single key OVERFLOWS a task —
    * a 100-row "hot" key in a 600k-row table is 4× the mean and still
    * nothing to split. Fan = next-pow-2 of estHot/hotKeyRows, clamped
    * to [1, maxSalts]; 1 means "don't salt" (the plain join is the
    * right plan and the ×fan dimension replication is pure waste).
    *
    * Cost model at 100 TB: the stat job scans ONE column of a sample
    * (column-pruned parquet read, partial-agg'd max) — O(sample), not
    * O(data), and orders of magnitude cheaper than an unconditionally
    * ×8-replicated dimension shuffle.
    */
  /** Fan decisions memoized per (plan, key, params): the decision is a
    * deterministic function of the input relation (fixed seed), so a
    * steady-state workload pays the sampled stat job ONCE per distinct
    * probe relation, not once per execution — the same build-once
    * discipline as the session stores. Keyed by the analyzed plan's
    * semantic hash (two structurally-equal reads of the same table hit
    * the same entry); bounded: one small Int per distinct plan.
    */
  private val fanCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, String, Int, Long, Double, Long), Integer]()

  def observedSaltFan(big: DataFrame, bigKey: String, maxSalts: Int = 16,
                      hotKeyRows: Long = 4L * 1000 * 1000,
                      sampleFraction: Double = 0.02, seed: Long = 42L): Int =
    fanCache.computeIfAbsent(
      (big.queryExecution.analyzed.semanticHash(), bigKey, maxSalts,
        hotKeyRows, sampleFraction, seed),
      _ => Integer.valueOf(
        computeSaltFan(big, bigKey, maxSalts, hotKeyRows, sampleFraction, seed)))
      .intValue()

  private def computeSaltFan(big: DataFrame, bigKey: String, maxSalts: Int,
                             hotKeyRows: Long,
                             sampleFraction: Double, seed: Long): Int = {
    val mx = big.select(col(bigKey))
      .sample(withReplacement = false, sampleFraction, seed)
      .groupBy(col(bigKey)).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx"))
      .head()
    if (mx.isNullAt(0)) 1
    else {
      val estHot = mx.getLong(0).toDouble / sampleFraction
      val want = math.ceil(estHot / hotKeyRows.toDouble).toInt
      if (want <= 1) 1
      else math.min(maxSalts, Integer.highestOneBit(want - 1) << 1)
    }
  }

  /** Salted join with the fan DERIVED from observed skew: fan 1 (the
    * common case — no key overflows a task) degrades to the plain join
    * with zero replication; a genuinely hot key gets exactly the fan
    * its volume demands, capped at `maxSalts`.
    */
  def adaptiveSaltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                         smallKey: String, maxSalts: Int = 16,
                         hotKeyRows: Long = 4L * 1000 * 1000): DataFrame = {
    val fan = observedSaltFan(big, bigKey, maxSalts, hotKeyRows)
    if (fan <= 1) big.join(small, big(bigKey) === small(smallKey))
    else saltedJoin(big, small, bigKey, smallKey, fan)
  }
}
