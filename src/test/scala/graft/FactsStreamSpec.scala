package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingFacts

class FactsStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  private def freshStore(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_facts_$tag").toString

  private lazy val facts = (0L until 30L)
    .map(i => (i, s"s${i % 3}", s"text $i"))
    .toDF("doc_id", "source", "text")

  private def served(store: String): Set[(Long, String, String)] =
    StreamingFacts.facts(spark, store, "doc_id", schema)
      .as[(Long, String, String)].collect().toSet

  test("accumulated facts equal the batch relation; replayed batchIds are skipped") {
    val store = freshStore("accum")
    for (b <- 0 until 3)
      assert(StreamingFacts.processBatch(
        facts.filter(col("doc_id") % 3 === b), b, store, "doc_id", schema))
    val expect = facts.as[(Long, String, String)].collect().toSet
    assert(served(store) === expect)
    assert(!StreamingFacts.processBatch(facts, 0L, store, "doc_id", schema))
    assert(served(store) === expect)
  }

  test("residual-window replay dedupes by key; compaction collapses physically") {
    val store = freshStore("residual")
    assert(StreamingFacts.processBatch(facts, 0L, store, "doc_id", schema))
    val expect = served(store)
    val marker = new java.io.File(s"$store/_graft_commits/default/0")
    assert(marker.exists && marker.delete())
    assert(StreamingFacts.processBatch(facts, 0L, store, "doc_id", schema))
    assert(served(store) === expect)
    StreamingFacts.compactStore(spark, store, "doc_id", schema)
    assert(served(store) === expect)
    // physically one row per key after the compact
    assert(spark.read.parquet(s"$store/facts").count() === 30L)
  }

  test("sinkFacts end-to-end: MemoryStream batches accumulate the fact relation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_facts_sink").toString
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingFacts.sinkFacts(
      input.toDF().toDF("doc_id", "source", "text"),
      s"$dir/store", s"$dir/ckpt", "doc_id", schema)
    try {
      (0 until 3).foreach { b =>
        input.addData(facts.filter(col("doc_id") % 3 === b)
          .as[(Long, String, String)].collect().toSeq)
        q.processAllAvailable()
      }
      assert(served(s"$dir/store") === facts.as[(Long, String, String)].collect().toSet)
    } finally q.stop()
  }

  test("shape is store state: accessors resolve the persisted sidecar over caller defaults") {
    val store = freshStore("sidecar")
    assert(StreamingFacts.processBatch(facts, 0L, store, "doc_id", schema))
    // wrong fallback shape — sidecar must win
    val bogus = StructType(Seq(StructField("x", LongType)))
    assert(StreamingFacts.facts(spark, store, "x", bogus)
      .as[(Long, String, String)].collect().toSet
      === facts.as[(Long, String, String)].collect().toSet)
  }
}
