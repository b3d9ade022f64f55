package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream analytics (SURVEY §2.2 streaming row). The same transform
  * serves batch (`spark.read` → the oracle-checked `q_events_window`) and
  * Structured Streaming (`readStream`/`MemoryStream` → `StreamingSpec`):
  * declare the plan once, let the engine pick micro-batch or batch
  * execution.
  *
  * Scale notes: tumbling windows + watermark bound the state store (late
  * events beyond 10 minutes are dropped); the aggregation is partial
  * (map-side) before the window-key shuffle, and `sum` goes through
  * DECIMAL so window totals are order-independent and exact.
  */
object EventPipeline {

  /** Input schema: `t TIMESTAMP, event_type STRING, value DOUBLE` (plus
    * ignored columns). Output: one row per (hour window, event_type).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("t", "10 minutes")
      .groupBy(window(col("t"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
}
