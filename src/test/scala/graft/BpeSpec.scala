package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mergeOf(word: String, l: String, r: String): Seq[String] =
    Seq(word).toDF("w")
      .select(Bpe.applyMerge(Bpe.charSyms(col("w")), l, r).as("m"))
      .as[Seq[String]].head()

  test("applyMerge is the greedy left-to-right scan, incl. same-symbol runs") {
    // same-symbol runs are where a naive pair-replace diverges: greedy
    // keeps every other match of the run
    assert(mergeOf("aaaa", "a", "a") === Seq("aa", "aa"))
    assert(mergeOf("aaa", "a", "a") === Seq("aa", "a"))
    assert(mergeOf("aaaaa", "a", "a") === Seq("aa", "aa", "a"))
    assert(mergeOf("abab", "a", "b") === Seq("ab", "ab"))
    assert(mergeOf("aab", "a", "b") === Seq("a", "ab"))
    assert(mergeOf("xyz", "a", "b") === Seq("x", "y", "z"))
    assert(mergeOf("a", "a", "a") === Seq("a"))
  }

  // the Sennrich toy corpus shape: merges hand-computed, ties broken
  // lexicographically ((e,s) beats (s,t) at count 9; (l,o) beats (o,w)
  // at count 7)
  private lazy val words = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    .toDF("word", "wc")
  private val expect3 = Seq(
    (1L, "e", "s", "es", 9L),
    (2L, "es", "t", "est", 9L),
    (3L, "l", "o", "lo", 7L))

  test("train learns the hand-computed merge table with deterministic tie-breaks") {
    assert(Bpe.train(words, 3)
      .as[(Long, String, String, String, Long)].collect().toSeq === expect3)
  }

  test("the learned table is identical under repartitioning") {
    assert(Bpe.train(words.repartition(7), 3)
      .as[(Long, String, String, String, Long)].collect().toSeq === expect3)
  }

  test("charSyms of the empty word is the empty array, not two empty symbols") {
    // sequence(1, 0) defaults its step to -1 and yields [1, 0] — unguarded,
    // '' would decompose into two ''-symbols and poison train/encode
    assert(Seq("", "ab").toDF("w")
      .select(Bpe.charSyms(col("w")).as("s")).as[Seq[String]]
      .collect().toSet === Set(Seq.empty[String], Seq("a", "b")))
    // and training over a state containing an empty word is unaffected by it
    val withEmpty = Seq(("", 100L), ("ab", 2L)).toDF("word", "wc")
    assert(Bpe.train(withEmpty, 3)
      .as[(Long, String, String, String, Long)].collect().toSeq ===
      Seq((1L, "a", "b", "ab", 2L)))
  }

  test("q_bpe_sweep: fertility is non-increasing and vocab non-decreasing along the merge grid") {
    // each extra merge prefix can only shorten encodings (every merge
    // strictly reduces some word's token count) and add symbol types
    val rows = graft.SparkEntry.queries("q_bpe_sweep")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0L, 2L, 4L, 6L, 8L))
    assert(rows.map(_._3).distinct.length === 1, "n_words must be grid-invariant")
    // the fused one-pass form counts n_words on each word's pos-0
    // subword row — which silently couples the total to encodeSyms
    // never emitting an empty array; pin it against the INDEPENDENT
    // corpus word count so that invariant breaking fails here, not as
    // a confusing every-grid-row oracle mismatch
    val independentTotal = graft.sources.Corpus
      .documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.Text.tokenize(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .count()
    assert(rows.head._3 === independentTotal,
      s"n_words ${rows.head._3} != independent corpus word count $independentTotal")
    assert(rows.map(_._4).sliding(2).forall(p => p.head >= p.last),
      s"n_bpe must fall with more merges: ${rows.map(_._4).toSeq}")
    // FIXTURE property, not a theorem (r17 ADVICE): a merge whose
    // constituent symbol is fully absorbed everywhere SHRINKS the
    // emergent vocabulary (corpus {"ab"}: k=0 vocab {a,b} = 2, one
    // merge → {ab} = 1). On this corpus no merge retires a constituent
    // — every merged pair's parts survive in other contexts — so vocab
    // grows along the grid. If a fixture regeneration trips this,
    // re-check the property and re-tune the expectation; the
    // engine-vs-oracle parity in CORRECTNESS is the correctness check.
    assert(rows.map(_._2).sliding(2).forall(p => p.head <= p.last),
      s"vocab should grow along the grid ON THIS FIXTURE (see comment): ${rows.map(_._2).toSeq}")
    // and the k=0 row is the raw character encoding: strictly worse
    // fertility than the full 8-merge vocabulary on any real corpus
    assert(rows.head._5 > rows.last._5)
  }

  test("training stops early when the pair mass dries up") {
    val singles = Seq(("a", 3L), ("b", 2L)).toDF("word", "wc")
    assert(Bpe.train(singles, 5).count() === 0)
    // two-char vocab dries after every word is one symbol
    val tiny = Seq(("ab", 2L)).toDF("word", "wc")
    assert(Bpe.train(tiny, 5)
      .as[(Long, String, String, String, Long)].collect().toSeq ===
      Seq((1L, "a", "b", "ab", 2L)))
  }
}
