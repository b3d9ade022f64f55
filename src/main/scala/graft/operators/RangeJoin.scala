package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows whose `value` falls in a right
  * row's `[lo, hi)` interval.
  *
  * A plain non-equi join plans as a broadcast nested loop — fine only
  * while one side broadcasts. The large×large-safe plan implemented here
  * is the BUCKETED range join: quantize values into fixed-width buckets,
  * expand each interval to every bucket it covers, equi-join on the
  * bucket id (a normal shuffled hash join), and apply the residual
  * interval predicate. Shuffle volume is linear in rows × interval
  * coverage; pick `bucketWidth` near the typical interval width so
  * expansion stays O(1) per interval.
  */
object RangeJoin {

  def byBucket(left: DataFrame, valueCol: String,
               right: DataFrame, loCol: String, hiCol: String,
               bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("_b", floor(col(valueCol) / bucketWidth).cast("long"))
    val rb = right.withColumn("_b",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    lb.join(rb, Seq("_b"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_b")
  }
}
