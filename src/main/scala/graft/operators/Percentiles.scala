package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentiles by SORT, not by buffering.
  *
  * Spark's built-in exact `percentile` aggregate holds every (value,
  * count) pair of a group in an in-memory map buffer — at corpus scale
  * that is an executor-memory bomb and a single-threaded merge per
  * group. The sort-based formulation distributes: one range-sort
  * shuffle keyed on the group, `row_number` + group count over the
  * sorted run, then each requested quantile reduces to AT MOST TWO
  * boundary rows per group (floor/ceil of the interpolation position)
  * aggregated with interpolation weights. Memory per task is O(1); the
  * sort is Spark's spillable external sort.
  *
  * Interpolation is the standard linear rule (DuckDB `quantile_cont`,
  * NumPy `linear`): pos = p·(n-1) zero-based; result = v_lo·(1-frac) +
  * v_hi·frac. When pos is integral the row is its own floor and ceil
  * and the two weighted terms sum to exactly v.
  */
object Percentiles {

  /** @param quantiles (output column name, p) pairs, each 0 ≤ p ≤ 1
    * @return one row per key: key, each quantile column (rounded to 6
    *         decimals for cross-engine float parity), and `n`
    */
  def exactQuantiles(df: DataFrame, key: String, value: String,
                     quantiles: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(key).orderBy("_v")
    val ranked = df
      .select(col(key), col(value).cast("double").as("_v"))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(key)))
    val qCols = quantiles.map { case (name, p) =>
      val pos = lit(p) * (col("_n") - 1) + 1 // 1-based interpolation position
      val lo = floor(pos)
      val hi = ceil(pos)
      val frac = pos - lo
      round(sum(
        when(col("_rn") === lo, col("_v") * (lit(1) - frac)).otherwise(lit(0.0)) +
          when(col("_rn") === hi, col("_v") * frac).otherwise(lit(0.0))), 6).as(name)
    }
    // the groupBy key equals the window partition key, so the aggregation
    // reuses the window's hash partitioning — one exchange total
    ranked.groupBy(key).agg(qCols.head, qCols.tail :+ max("_n").as("n"): _*)
  }
}
