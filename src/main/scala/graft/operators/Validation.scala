package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the pre-training gate a corpus
  * pipeline runs before any expensive job consumes a table (the
  * Deequ-style "unit tests for data" surface: completeness, uniqueness,
  * value compliance, bounds).
  *
  * Scale shape: ALL checks evaluate in ONE aggregate pass over the
  * table — each check contributes aggregate expressions to a single
  * `df.agg(...)`, so Spark computes map-side partials for every metric
  * in the same scan and the final state is one row regardless of table
  * size. The row→per-check explode is driver-trivial (checks-count
  * sized). N checks over 100 TB cost one scan, not N.
  */
object Validation {

  /** One constraint: `metric` is an aggregate Column over the table
    * (must reduce to DOUBLE), `pass` maps the computed metric to the
    * verdict. Names become output rows, so keep them stable.
    */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Fraction of non-null values — 1.0 means the column is complete. */
  def completeness(c: String, atLeast: Double = 1.0): Check =
    Check(s"completeness($c)",
      count(col(c)).cast("double") / count(lit(1)),
      m => m >= atLeast)

  /** distinct/count ratio — 1.0 means the column is a key. */
  def uniqueness(c: String): Check =
    Check(s"uniqueness($c)",
      countDistinct(col(c)).cast("double") / count(lit(1)),
      m => m === 1.0)

  /** Fraction of rows satisfying `predicate` (named for the output). */
  def compliance(name: String, predicate: Column, atLeast: Double = 1.0): Check =
    Check(s"compliance($name)",
      sum(when(predicate, 1L).otherwise(0L)).cast("double") / count(lit(1)),
      m => m >= atLeast)

  /** Minimum value bound. */
  def minBound(c: String, atLeast: Double): Check =
    Check(s"min($c)", min(col(c)).cast("double"), m => m >= atLeast)

  /** Maximum value bound. */
  def maxBound(c: String, atMost: Double): Check =
    Check(s"max($c)", max(col(c)).cast("double"), m => m <= atMost)

  /** Distinct-count ceiling (categorical-domain sanity). */
  def distinctAtMost(c: String, atMost: Long): Check =
    Check(s"approx_domain($c)",
      countDistinct(col(c)).cast("double"), m => m <= atMost.toDouble)

  /** Run the suite: one aggregate pass, one row per check
    * (check_name, metric, passed).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validation suite needs at least one check")
    val aggs = checks.zipWithIndex.map { case (ch, i) => ch.metric.as(s"m$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (ch, i) =>
      struct(lit(ch.name).as("check_name"),
        col(s"m$i").as("metric"),
        ch.pass(col(s"m$i")).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
