package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table loaders. All engine queries read through here so scan
  * behavior (pushdown-friendly plain parquet reads, the events
  * timestamp normalization) is in one place.
  */
object Tables {

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` has shipped with two physical `ts` encodings across
    * testdata generations, so the loader adapts to whichever it finds and
    * always surfaces a session-tz TimestampType `t` at µs precision:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]) unless read as a raw long via the public
    *    escape hatch `spark.sql.legacy.parquet.nanosAsLong` (SPARK-40819) —
    *    then `ts` is LongType and `div 1000` truncates ns→µs exactly like
    *    DuckDB's conversion, so oracle comparisons line up. Sessions keep
    *    setting the flag (harmless for non-nanos files).
    *  - parquet TIMESTAMP(MICROS): read natively as TIMESTAMP_NTZ (or
    *    TimestampType when NTZ inference is off). The NTZ→session-tz cast is
    *    offset-exact under the pinned UTC session every engine entry point
    *    uses (same precedent as q_trailing_revenue's o_orderdate cast).
    *
    * Downstream µs tie-break/time-key semantics are unchanged either way:
    * the time key is epoch-µs on both engine and oracle sides.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = tbl(s, dir, "events")
    val t: Column = raw.schema("ts").dataType match {
      case LongType         => expr("timestamp_micros(ts div 1000)")
      case TimestampType    => col("ts")
      case TimestampNTZType => col("ts").cast(TimestampType)
      case other => throw new IllegalArgumentException(
        s"events.parquet ts: unsupported type $other (expected nanos-as-long or timestamp)")
    }
    raw.withColumn("t", t).drop("ts")
  }
}
