package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Doc, DocRef, Posting}
import graft.operators.{InvertedIndex, Skew}
import graft.sources.Corpus

class TypedApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    Doc(1L, "u1", "the cat sat"),
    Doc(2L, "u2", "the dog ran"),
    Doc(3L, "u3", "cat and dog played")).toDS()

  test("typed postings mirror the DataFrame pipeline") {
    val typed = InvertedIndex.typedPostings(docs).collect().toSet
    assert(typed === Set(
      Posting("cat", 1L, "u1"), Posting("sat", 1L, "u1"),
      Posting("dog", 2L, "u2"), Posting("ran", 2L, "u2"),
      Posting("cat", 3L, "u3"), Posting("dog", 3L, "u3"), Posting("played", 3L, "u3")))
  }

  test("Aggregator-built typed index equals the built-in collect_list path") {
    val viaAgg = InvertedIndex.typedIndex(docs).collect()
      .map(pl => pl.term -> pl.postings).toMap
    val viaBuiltin = InvertedIndex.index(docs.toDF())
      .as[(String, Seq[(Long, String)])].collect()
      .map { case (t, ps) => t -> ps.map(p => DocRef(p._1, p._2)).toSeq }.toMap
    assert(viaAgg === viaBuiltin)
  }

  test("PostingListAgg dedupes by doc_id with min-url tie-break") {
    val dup = Seq(
      Posting("cat", 1L, "ub"), Posting("cat", 1L, "ua"), Posting("cat", 2L, "uc")).toDS()
    val idx = graft.functions.PostingListAgg.buildIndex(dup).collect().head
    assert(idx.postings === Seq(DocRef(1L, "ua"), DocRef(2L, "uc")))
  }

  test("FirstUrlPostingListAgg keeps the first-arrival url (reference R3 parity)") {
    // single ordered partition = the reference's sequential reducer runtime
    val dup = Seq(
      Posting("cat", 1L, "ub"), Posting("cat", 1L, "ua"), Posting("cat", 2L, "uc")
    ).toDS().coalesce(1)
    val strict = graft.functions.FirstUrlPostingListAgg.buildIndex(dup).collect().head
    assert(strict.postings === Seq(DocRef(1L, "ub"), DocRef(2L, "uc"))) // ub arrived first
    val canonical = graft.functions.PostingListAgg.buildIndex(dup).collect().head
    assert(canonical.postings === Seq(DocRef(1L, "ua"), DocRef(2L, "uc"))) // min url
  }

  test("salted aggregation matches direct groupBy on skewed data") {
    val skewed = Seq.fill(500)(("hot", 1.0)) ++ Seq(("a", 2.0), ("b", 3.0), ("b", 4.0))
    val df = skewed.toDF("k", "v").repartition(7)
    val counts = Skew.saltedCount(df, "k").as[(String, Long)].collect().toMap
    assert(counts === Map("hot" -> 500L, "a" -> 1L, "b" -> 2L))
    val sums = Skew.saltedSum(df, "k", "v").as[(String, Double)].collect().toMap
    assert(sums === Map("hot" -> 500.0, "a" -> 2.0, "b" -> 7.0))
  }

  test("salted join matches the plain join on skewed keys, 1:n preserved") {
    val big = (Seq.fill(300)((7L, "hot")) ++ Seq((1L, "a"), (2L, "b"), (9L, "c")))
      .toDF("k", "tag").repartition(5)
    val small = Seq((7L, "dim7"), (1L, "dim1"), (2L, "dim2"), (8L, "dim8"))
      .toDF("sk", "name")
    val salted = Skew.saltedJoin(big, small, "k", "sk", salts = 4)
      .select("k", "tag", "name")
    val plain = big.join(small, big("k") === small("sk")).select("k", "tag", "name")
    assert(salted.count() === plain.count()) // 302 matches incl. 300 hot
    assert(salted.except(plain).count() === 0 && plain.except(salted).count() === 0)
  }

  test("S1: fromCategoryHtml assigns dense ids across pages in order") {
    val p1 = """<ul><li><a href="/wiki/A">A</a></li><li><a href="/wiki/B">B</a></li></ul>"""
    val p2 = """<ul><li><a href="/wiki/C">C</a></li></ul>"""
    val got = Corpus.fromCategoryHtml(spark, Seq(p1, p2)).as[(Long, String)].collect().toSeq
    assert(got === Seq((0L, "/wiki/A"), (1L, "/wiki/B"), (2L, "/wiki/C")))
  }
}
