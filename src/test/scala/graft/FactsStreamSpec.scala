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

  test("lineitem warehouse store: accumulated relation equals batch, content key loses no rows") {
    // the fixture carries NO surrogate key — even the (orderkey,
    // linenumber, partkey, suppkey) tuple collides once at sf0.001
    // with different content — so the store keys on the FULL-ROW
    // digest; equal counts prove both that no row was dropped at the
    // exact-once dedup AND that the fixture still has no identical
    // full rows (a regeneration that introduces one fails here)
    val dir = "/root/testdata/sf0.001"
    val batch = graft.sources.Tables.tbl(spark, dir, "lineitem")
    val streamed = graft.queries.RelationalQueries.LineitemStores
      .streamedLineitem(spark, dir)
    assert(streamed.count() === batch.count(),
      "composite-key store must keep every lineitem row")
    assert(streamed.columns.sorted.toSeq === batch.columns.sorted.toSeq)
    // full-relation parity (row multiset) via a count over the join key
    val b = batch.groupBy("l_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t = streamed.groupBy("l_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t === b)
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
