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
}
