package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Both branches of the schema-adaptive events loader must stay alive:
  * the driver's testdata currently ships TIMESTAMP(MICROS) (the
  * TestdataCanarySpec pins that), which leaves the nanos-as-long branch
  * — the escape hatch for a TIMESTAMP(NANOS) generation — dead code in
  * CI unless exercised here. Each branch writes a synthetic
  * events.parquet and asserts the SAME logical rows come back: a
  * session-tz TimestampType `t` at exact µs, `ts` dropped.
  */
class EventsLoaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // 2024-01-01 00:00:00 UTC in micros, plus a sub-millisecond tail to
  // prove the ns→µs truncation arithmetic
  private val baseUs = 1704067200000000L
  private val rows = Seq(
    (1L, baseUs + 1L, 10L, "click", 1.5, """{"k":1}"""),
    (2L, baseUs + 999L, 11L, "view", 2.5, """{"k":2}"""))

  private def assertLoaded(dir: String): Unit = {
    import spark.implicits._
    val got = Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("t")).as("us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .as[(Long, Long, Long, String, Double, String)].collect().sortBy(_._1)
    assert(got.toSeq === rows.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)))
    assert(!Tables.events(spark, dir).columns.contains("ts"), "raw ts must be dropped")
  }

  test("micros generation: TIMESTAMP column taken directly (NTZ cast)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-events-us-").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertLoaded(dir)
  }

  test("nanos generation: LongType ts divides to exact micros") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-events-ns-").toString
    // nanos-as-long surfacing of TIMESTAMP(NANOS): a raw INT64 column.
    // +500 ns tails must TRUNCATE away (DuckDB epoch_ns semantics).
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("us") * 1000L + 500L).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertLoaded(dir)
  }

  test("an unsupported ts type fails loud, naming the type") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-events-bad-").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("us").cast("string")).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("StringType"))
  }
}
