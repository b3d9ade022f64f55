package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingEvents

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private lazy val facts = (0L until 90L)
    .map(i => (i, ts(i.toInt), i % 7,
      Seq("view", "click", "purchase")(i.toInt % 3), (i % 13).toDouble, s"""{"k": $i}"""))
    .toDF("event_id", "t", "user_id", "event_type", "value", "props")

  private def freshStore(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_events_$tag").toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("event_id", "t", "user_id", "event_type", "value", "props")
      .as[(Long, Timestamp, Long, String, Double, String)].collect().toSet

  test("accumulated facts equal the batch relation under any batching") {
    val store = freshStore("accum")
    for (b <- 0 until 3)
      assert(StreamingEvents.processBatch(
        facts.filter(col("event_id") % 3 === b), b, store))
    assert(rows(StreamingEvents.events(spark, store)) === rows(facts))
  }

  test("replayed batchId is skipped; a residual-window re-append dedupes by event_id") {
    val store = freshStore("replay")
    assert(StreamingEvents.processBatch(facts, 0L, store))
    assert(!StreamingEvents.processBatch(facts, 0L, store)) // marker gate
    // crash window: append landed, marker write did not — the re-run
    // re-appends, and the read's event_id dedup restores exact-once
    val marker = new java.io.File(s"$store/_graft_commits/default/0")
    assert(marker.exists && marker.delete())
    assert(StreamingEvents.processBatch(facts, 0L, store))
    assert(rows(StreamingEvents.events(spark, store)) === rows(facts))
    // compaction physically drops the duplicates and preserves the relation
    StreamingEvents.compactStore(spark, store)
    assert(rows(StreamingEvents.events(spark, store)) === rows(facts))
  }

  test("sinkEvents end-to-end: MemoryStream micro-batches accumulate the fact table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_events_sink").toString
    val input = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = StreamingEvents.sinkEvents(
      input.toDF().toDF("event_id", "t", "user_id", "event_type", "value", "props"),
      s"$dir/store", s"$dir/ckpt")
    try {
      (0 until 3).foreach { b =>
        input.addData(facts.filter(col("event_id") % 3 === b)
          .as[(Long, Timestamp, Long, String, Double, String)].collect().toSeq)
        q.processAllAvailable()
      }
      assert(rows(StreamingEvents.events(spark, s"$dir/store")) === rows(facts))
    } finally q.stop()
  }

  test("ANY batching accumulates the same facts — randomized partition assignments") {
    // the store contract claims batching-invariance; mod-3 alone could
    // mask an assignment-shape dependence, so randomize the partition
    // (deterministic seeds — reproducible failures)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val nBatches = 1 + rnd.nextInt(5)
      val assign = (0L until 90L).map(id => id -> rnd.nextInt(nBatches)).toMap
      val store = freshStore(s"anybatch$trial")
      for (b <- 0 until nBatches) {
        val ids = assign.collect { case (id, bb) if bb == b => id }.toSeq
        StreamingEvents.processBatch(
          facts.filter(col("event_id").isin(ids: _*)), b, store): Unit
      }
      assert(rows(StreamingEvents.events(spark, store)) === rows(facts),
        s"trial $trial ($nBatches batches)")
    }
  }

  test("behavioral twins over the store equal the batch queries on the real corpus") {
    // the six registered *_streamed twins hash-check under the batch
    // oracles in Verify; this pins the sharper claim directly — the
    // store-served DataFrames are row-identical to the batch ones
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q_funnel", "q_transitions", "q_scd2")) {
      val batch = SparkEntry.queries(q)(spark, dir).collect().map(_.toString).sorted
      val streamed = SparkEntry.queries(q + "_streamed")(spark, dir).collect().map(_.toString).sorted
      assert(batch.sameElements(streamed), q)
    }
  }
}
