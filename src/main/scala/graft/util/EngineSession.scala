package graft.util

import org.apache.spark.sql.SparkSession

/** The ONE place the engine's session pins live. Every entry point
  * (Verify, Bench, TimeQuery, PlanDump, the test session) builds
  * through here, so a new config pin lands once instead of drifting
  * across N copy-pasted builders (r17 review: the
  * `enablePartialResults` pin had to be added in four places and the
  * fifth builder missed it).
  *
  * Pins and why:
  *   - shuffle.partitions = caller's core count (local mode — 200
  *     default just fragments tiny exchanges);
  *   - UTC session timezone (date/timestamp parity with the DuckDB
  *     oracle);
  *   - autoBucketedScan OFF so term-bucketed index lookups bucket-prune;
  *   - nanosAsLong (events.parquet ships TIMESTAMP(NANOS) in some
  *     generations — see Tables.events);
  *   - json.enablePartialResults OFF (r16 ADVICE: a jar bump that
  *     retains partially-parsed fields on malformed records would
  *     silently flip the q_bad_records quarantine masses);
  *   - the engine's Catalyst extensions (native codegen expressions).
  */
object EngineSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.json.enablePartialResults", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
}
