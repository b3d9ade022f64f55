package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the value of the LATEST right
  * row with `rightTime <= leftTime` for the same key (inclusive).
  *
  * Spark has no native as-of join. The naive compositions are a range
  * join (per-key quadratic) or per-left-row subqueries (not planable).
  * The scalable formulation used here is union + ordered window: tag the
  * two sides, union them, and take `last(value, ignoreNulls)` over a
  * per-key window ordered by (time, side) — ONE linear shuffle keyed on
  * the join key, skew handled by AQE like any other exchange. Right rows
  * order before left rows at equal timestamps, making the match
  * inclusive and deterministic.
  *
  * TIE-BREAK CONTRACT: when several right rows share a key's timestamp,
  * the MAXIMUM `rightValue` wins (the window orders `_rv` ascending and
  * takes the last non-null). This is a deliberate, documented choice —
  * engines differ here (DuckDB's ASOF JOIN picks an arbitrary matching
  * row on ties), so any cross-engine comparison must mirror this rule
  * explicitly (see the `q_asof_signup` oracle's window formulation).
  */
object AsOf {

  /** @param as output column name for the matched right value
    * @return `left`'s columns plus `as` (null where no right row is ≤)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, time: String,
               rightValue: String, as: String): DataFrame = {
    val valueType = right.schema(rightValue).dataType
    val leftU = left
      .withColumn("_rv", lit(null).cast(valueType))
      .withColumn("_isL", lit(1))
    val rightCols = left.columns.toSeq.map {
      case c if c == key => col(key)
      case c if c == time => col(time)
      case c => lit(null).cast(left.schema(c).dataType).as(c)
    } :+ col(rightValue).cast(valueType).as("_rv") :+ lit(0).as("_isL")
    val rightU = right.select(rightCols: _*)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("_isL").asc, col("_rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftU.unionByName(rightU)
      .withColumn(as, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_isL") === 1)
      .drop("_rv", "_isL")
  }
}
