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

  test("compacted store serves raw (no dedup exchange) and a new append restores dedup") {
    val store = freshStore("clean")
    assert(StreamingFacts.processBatch(
      facts.filter(col("doc_id") < 15), 0L, store, "doc_id", schema))
    val clean = new java.io.File(s"$store/_graft_clean")
    assert(!clean.exists, "an appended-to store must not carry the clean marker")
    // dedup-at-serve path plans an exchange for the key dedup
    assert(StreamingFacts.facts(spark, store, "doc_id", schema)
      .queryExecution.executedPlan.toString.contains("Exchange"))
    StreamingFacts.compactStore(spark, store, "doc_id", schema)
    assert(clean.exists, "compaction must settle the store")
    // compacted ≡ dedup-at-serve: same relation, but served RAW — the
    // plan is a bare scan with no dedup exchange
    val compacted = StreamingFacts.facts(spark, store, "doc_id", schema)
    assert(compacted.as[(Long, String, String)].collect().toSet
      === facts.filter(col("doc_id") < 15).as[(Long, String, String)].collect().toSet)
    assert(!compacted.queryExecution.executedPlan.toString.contains("Exchange"),
      "a settled store must not re-pay the dedup exchange at serve time")
    // the next append unsettles the store BEFORE its rows land
    assert(StreamingFacts.processBatch(
      facts.filter(col("doc_id") >= 15), 1L, store, "doc_id", schema))
    assert(!clean.exists, "an append must clear the clean marker")
    assert(served(store) === facts.as[(Long, String, String)].collect().toSet)
  }

  test("factsAsOf time-travels by ingest batch and survives compaction") {
    val store = freshStore("asof")
    for (b <- 0 until 3)
      assert(StreamingFacts.processBatch(
        facts.filter(col("doc_id") % 3 === b), b, store, "doc_id", schema))
    def asOf(n: Long): Set[(Long, String, String)] =
      StreamingFacts.factsAsOf(spark, store, n, "doc_id", schema)
        .as[(Long, String, String)].collect().toSet
    def slice(n: Long): Set[(Long, String, String)] =
      facts.filter(col("doc_id") % 3 <= n).as[(Long, String, String)].collect().toSet
    assert(asOf(0L) === slice(0L))
    assert(asOf(1L) === slice(1L))
    // high-water read ≡ the plain accessor
    assert(asOf(2L) === served(store))
    // a replay residual in batch 1 must not duplicate the slice
    val marker = new java.io.File(s"$store/_graft_commits/default/1")
    assert(marker.exists && marker.delete())
    assert(StreamingFacts.processBatch(
      facts.filter(col("doc_id") % 3 === 1), 1L, store, "doc_id", schema))
    assert(asOf(1L) === slice(1L))
    // compaction preserves the stamps: every as-of read is unchanged,
    // and the high-water contract asOf(max) ≡ facts still holds
    StreamingFacts.compactStore(spark, store, "doc_id", schema)
    assert(asOf(0L) === slice(0L))
    assert(asOf(1L) === slice(1L))
    assert(asOf(2L) === served(store))
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

  test("factsAsOf stamp probe re-arms when the store content changes after the first pass") {
    val store = freshStore("rearm")
    assert(StreamingFacts.processBatch(facts, 0L, store, "doc_id", schema))
    // first read memoizes the non-null-stamp proof for this content
    assert(StreamingFacts.factsAsOf(spark, store, 0L, "doc_id", schema).count() === 30L)
    // an EXTERNAL append without a batch stamp (the exact corruption the
    // guard exists to catch) changes the content signature, so the next
    // factsAsOf must re-probe and fail LOUDLY — a path-keyed memo would
    // silently drop the unstamped row instead
    Seq((999L, "sX", "unstamped")).toDF("doc_id", "source", "text")
      .write.mode("append").parquet(s"$store/facts")
    val ex = intercept[IllegalArgumentException] {
      StreamingFacts.factsAsOf(spark, store, 0L, "doc_id", schema).count()
    }
    assert(ex.getMessage.contains("NULL"))
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
