package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FuzzyJoin
import graft.streaming.StreamingFuzzy

class FuzzyStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ED-1 families split so pairs CROSS batches: substitution pair
  // (a/1, a/2) lands in batches 0+1, insert/delete pair (b/1, b/1/)
  // in batches 0+2, same-batch pair (c/7, c/8) in batch 1, and an
  // unrelated url in batch 2
  private lazy val batches = Seq(
    Seq("doc://a/1", "doc://b/1"),
    Seq("doc://a/2", "doc://c/7", "doc://c/8"),
    Seq("doc://b/1/", "doc://zzz/999"))
  private lazy val allUrls = batches.flatten

  private def freshStore(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fuzzy_$tag").toString

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.select("url_a", "url_b").as[(String, String)].collect().toSet

  test("accumulated pair store equals the batch ed1Pairs over the union") {
    val store = freshStore("accum")
    batches.zipWithIndex.foreach { case (urls, b) =>
      assert(StreamingFuzzy.processBatch(urls.toDF("url"), b, store))
    }
    val batch = pairSet(FuzzyJoin.ed1Pairs(allUrls.toDF("url"), "url"))
    assert(pairSet(StreamingFuzzy.pairs(spark, store)) === batch)
    // the fixture genuinely exercises cross-batch discovery (both edit
    // classes) and the same-batch path
    assert(batch.contains(("doc://a/1", "doc://a/2")))
    assert(batch.contains(("doc://b/1", "doc://b/1/")))
    assert(batch.contains(("doc://c/7", "doc://c/8")))
    assert(StreamingFuzzy.urls(spark, store).count() === allUrls.length.toLong)
  }

  test("a replayed batchId is skipped and a re-sent url adds no pairs") {
    val store = freshStore("replay")
    assert(StreamingFuzzy.processBatch(batches(0).toDF("url"), 0L, store))
    val before = pairSet(StreamingFuzzy.pairs(spark, store))
    assert(!StreamingFuzzy.processBatch(batches(0).toDF("url"), 0L, store))
    assert(pairSet(StreamingFuzzy.pairs(spark, store)) === before)
    // a NEW batchId re-sending an already-stored url: the url is a
    // value, so the pair set is unchanged and reads stay distinct
    assert(StreamingFuzzy.processBatch(batches(0).take(1).toDF("url"), 9L, store))
    assert(pairSet(StreamingFuzzy.pairs(spark, store)) === before)
    assert(StreamingFuzzy.urls(spark, store).count() === batches(0).length.toLong)
  }

  test("sinkFuzzyPairs end-to-end: MemoryStream micro-batches accumulate the batch pair set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy_sink").toString
    val input = MemoryStream[String]
    val q = StreamingFuzzy.sinkFuzzyPairs(
      input.toDF().toDF("url"), s"$dir/store", s"$dir/ckpt")
    try {
      batches.foreach { urls =>
        input.addData(urls)
        q.processAllAvailable()
      }
      val got = pairSet(StreamingFuzzy.pairs(spark, s"$dir/store"))
      assert(got === pairSet(FuzzyJoin.ed1Pairs(allUrls.toDF("url"), "url")))
    } finally q.stop()
  }

  test("compaction preserves served pairs and urls") {
    val store = freshStore("compact")
    batches.zipWithIndex.foreach { case (urls, b) =>
      StreamingFuzzy.processBatch(urls.toDF("url"), b, store)
    }
    val pairsBefore = pairSet(StreamingFuzzy.pairs(spark, store))
    val urlsBefore = StreamingFuzzy.urls(spark, store).as[String].collect().toSet
    StreamingFuzzy.compactStore(spark, store)
    assert(pairSet(StreamingFuzzy.pairs(spark, store)) === pairsBefore)
    assert(StreamingFuzzy.urls(spark, store).as[String].collect().toSet === urlsBefore)
  }
}
