package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Per-user session summary emitted when a session closes (event-time
  * gap timeout).
  */
case class UserSession(user_id: Long, n_events: Long, total_value: Double,
                       start: Timestamp, end: Timestamp)

private[streaming] case class SessionBuf(n: Long, total: Double, start: Long, last: Long)

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

  /** Stream-static enrichment (SURVEY §2.2 streaming row): join each
    * event to a STATIC dimension and aggregate per (hour window, dim
    * attribute). Stream-static joins are STATELESS on the stream side —
    * the dim is just re-planned per micro-batch (broadcast here: a dim
    * small enough to enrich with should be small enough to broadcast) —
    * so state-store size stays bounded by the windowed agg alone. This is
    * the canonical shape for joining an unbounded event stream to a
    * bounded dimension at scale.
    *
    * Serves batch and streaming identically (same declared plan); the
    * batch instantiation is the oracle-checked `q_events_enriched`.
    */
  def enrichedWindowedTotals(events: DataFrame, dim: DataFrame,
                             dimKey: String, dimValue: String): DataFrame =
    events
      .withWatermark("t", "10 minutes")
      .join(broadcast(dim.select(col(dimKey), col(dimValue))), Seq(dimKey))
      .groupBy(window(col("t"), "1 hour"), col(dimValue))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col(dimValue), col("n_events"), col("sum_value"))

  /** Stream-STREAM interval join (SURVEY §2.2 streaming row): attribute
    * each purchase to the same user's clicks within the preceding hour.
    * Both sides carry watermarks and the join condition bounds event-time
    * skew, so each side's state store retains only the interval window
    * (Spark evicts rows once the other side's watermark passes the bound)
    * — the only state-bounded formulation for joining two UNBOUNDED
    * inputs, vs. the stream-static join (`enrichedWindowedTotals`) whose
    * static side needs no state at all.
    */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("click_user"), col("t").as("click_t"))
      .withWatermark("click_t", "10 minutes")
    val p = purchases
      .select(col("user_id"), col("t").as("purchase_t"), col("value"))
      .withWatermark("purchase_t", "10 minutes")
    p.join(c, expr(
      """user_id = click_user AND
        |click_t >= purchase_t - INTERVAL 1 HOUR AND
        |click_t <= purchase_t""".stripMargin))
      .select("user_id", "purchase_t", "value", "click_t")
  }

  /** LEFT-OUTER stream-stream interval join — the attribution AUDIT
    * shape: EVERY click, with its following-hour purchase or NULL once
    * the watermark proves none can arrive. The outer flavor of
    * [[attributedPurchases]]: matched rows emit eagerly; an unmatched
    * click is held in state until BOTH watermarks pass its join bound,
    * then emits null-padded (the one streaming shape where output
    * EXISTENCE, not just content, depends on the watermark). In batch
    * execution the same declared plan is a plain left outer join, so
    * the `q_attributed_left` oracle row checks the operator's
    * semantics exactly.
    */
  def attributedClicksLeftOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("t").as("click_t"))
      .withWatermark("click_t", "10 minutes")
    val p = purchases
      .select(col("user_id").as("purchase_user"), col("t").as("purchase_t"),
        col("value"))
      .withWatermark("purchase_t", "10 minutes")
    c.join(p, expr(
      """user_id = purchase_user AND
        |purchase_t >= click_t AND
        |purchase_t <= click_t + INTERVAL 1 HOUR""".stripMargin), "left_outer")
      .select("user_id", "click_t", "purchase_t", "value")
  }

  /** Custom streaming state (SURVEY §2.2 "stateful"): sessionization via
    * `flatMapGroupsWithState` with an EVENT-TIME timeout — a session is
    * the run of a user's events with gaps < `gapMinutes`, emitted once
    * the watermark passes the gap. State per key is one fixed-size
    * buffer (count/total/bounds), so state-store size is O(active users),
    * not O(events) — the shape that survives an unbounded stream.
    *
    * Input: `t TIMESTAMP, user_id LONG, value DOUBLE` (watermark is
    * applied here; the caller passes the raw stream).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, rows: Iterator[(Long, Timestamp, Double)],
               state: GroupState[SessionBuf]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(UserSession(userId, s.n, s.total, new Timestamp(s.start), new Timestamp(s.last)))
      } else {
        val sorted = rows.toSeq.sortBy(_._2.getTime)
        var buf = state.getOption.getOrElse(SessionBuf(0, 0.0, Long.MaxValue, Long.MinValue))
        val closed = Seq.newBuilder[UserSession]
        for ((_, t, v) <- sorted) {
          val ts = t.getTime
          if (buf.n > 0 && ts - buf.last > gapMs) {
            closed += UserSession(userId, buf.n, buf.total, new Timestamp(buf.start), new Timestamp(buf.last))
            buf = SessionBuf(0, 0.0, Long.MaxValue, Long.MinValue)
          }
          buf = SessionBuf(buf.n + 1, buf.total + v, math.min(buf.start, ts), math.max(buf.last, ts))
        }
        state.update(buf)
        state.setTimeoutTimestamp(buf.last + gapMs)
        closed.result().iterator
      }
    }

    events
      .withWatermark("t", "10 minutes")
      // keep the watermarked column itself in the typed projection —
      // replacing it (e.g. with unix_millis) drops the watermark and
      // event-time timeout is rejected
      .select(col("user_id"), col("t"), col("value"))
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
