package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Approximate aggregates for corpus-scale statistics — the sketch
  * surface (HyperLogLog++, quantile sketches) where exact answers cost a
  * full shuffle of distinct values but a mergeable fixed-size sketch
  * costs one map-side pass. NOT oracle-registered: sketch outputs are
  * engine-specific by construction; tests assert error bounds against
  * exact answers instead.
  */
object Sketches {

  /** Approximate vocabulary size (distinct terms) per source plus exact,
    * using HLL++ (`approx_count_distinct`, default rsd 5%).
    */
  def vocabularyBySource(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs
      .select(col("source"), explode(Text.terms(col("text"))).as("term"))
      .groupBy("source")
      .agg(
        approx_count_distinct(col("term"), rsd).as("approx_vocab"),
        countDistinct(col("term")).as("exact_vocab"))

  /** Token-count distribution quantiles via the Greenwald-Khanna sketch
    * (`percentile_approx`) — p50/p90/p99 of tokens per document.
    */
  def tokenCountQuantiles(docs: DataFrame, accuracy: Int = 10000): DataFrame =
    docs
      .select(size(Text.tokenize(col("text"))).as("n_tokens"))
      .agg(
        percentile_approx(col("n_tokens"), lit(0.5), lit(accuracy)).as("p50"),
        percentile_approx(col("n_tokens"), lit(0.9), lit(accuracy)).as("p90"),
        percentile_approx(col("n_tokens"), lit(0.99), lit(accuracy)).as("p99"),
        count(lit(1)).as("n_docs"))
}
