package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders. All engine queries read through here so scan
  * behavior (pushdown-friendly plain parquet reads, the events
  * nanos workaround) is in one place.
  */
object Tables {

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Public escape hatch: read nanos as a
    * raw long (`spark.sql.legacy.parquet.nanosAsLong`, SPARK-40819) and derive
    * a microsecond TimestampType column. Integer `div 1000` truncates exactly
    * like DuckDB's ns→µs conversion, so oracle comparisons line up.
    *
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true`, set once at
    * session build (Verify/Bench/test session) — a loader must not flip
    * session conf as a read side-effect.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build to read events.parquet")
    tbl(s, dir, "events")
      .withColumn("t", expr("timestamp_micros(ts div 1000)"))
      .drop("ts")
  }
}
