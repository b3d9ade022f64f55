package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.functions.Text
import graft.operators.InvertedIndex

/** SURVEY §5.3 property invariants, generated corpora (noise included:
  * punctuation, digits, unicode, empty docs, stopwords):
  *   (a) (term, doc) ∈ index  ⇔  term ∈ tokenize(doc) \ stopwords
  *   (b) posting lists strictly doc_id-sorted, duplicate-free
  *   (c) index invariant under corpus permutation + repartitioning
  *   (d) union of per-partition posting builds ≡ whole-corpus build
  *       (the map-side-combine / partial-final agg contract G1/R1)
  *
  * The check oracle is an INDEPENDENT plain-Scala tokenizer, not the
  * engine's column pipeline.
  */
object IndexProperties extends Properties("InvertedIndex") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  lazy val spark = SparkTestSession.spark

  private val word = Gen.oneOf(
    "spark", "data", "the", "and", "cat-dog", "Zebra!", "fast", "row42",
    "über", "mixED", "a", "", "sort;merge")
  private val textGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val docsGen: Gen[List[(Long, String, String)]] =
    Gen.choose(1, 10)
      .flatMap(n => Gen.listOfN(n, textGen))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, s"u$i", t) })

  /** Independent reimplementation of P1+F1+D1 (reference
    * `mapper/src/processor.py:163-169,190`).
    */
  private def refTerms(text: String): Set[String] =
    text.toLowerCase.replaceAll("[^a-z\\s]", "").split("\\s+")
      .filter(_.nonEmpty).filterNot(Text.EffectiveStopwords.contains).toSet

  private def toDf(docs: List[(Long, String, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "url", "text")
  }

  property("(a) index pairs ⇔ independent tokenizer membership") = forAll(docsGen) { docs =>
    import spark.implicits._
    val got = InvertedIndex.postings(toDf(docs))
      .select("term", "doc_id").as[(String, Long)].collect().toSet
    val expected = docs.flatMap { case (id, _, t) => refTerms(t).map(_ -> id) }.toSet
    got == expected
  }

  property("(b) posting lists strictly sorted and duplicate-free") = forAll(docsGen) { docs =>
    import spark.implicits._
    val lists = InvertedIndex.index(toDf(docs))
      .select($"term", org.apache.spark.sql.functions.transform($"postings", p => p("doc_id")))
      .as[(String, Seq[Long])].collect()
    lists.forall { case (_, ids) => ids.sorted == ids && ids.distinct == ids }
  }

  property("(c) invariant under permutation + repartitioning") = forAll(docsGen) { docs =>
    import spark.implicits._
    def canon(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Long, String)]] =
      df.select($"term", $"postings").as[(String, Seq[(Long, String)])].collect().toMap
    val base = canon(InvertedIndex.index(toDf(docs)))
    val permuted = canon(InvertedIndex.index(toDf(docs.reverse).repartition(5)))
    base == permuted
  }

  property("(e) R3 tie-break modes agree whenever urls are unique per doc") = forAll(docsGen) { docs =>
    import spark.implicits._
    // one url per doc_id (the docsGen invariant) → no tie to break, so the
    // strict first-url-wins mode and the canonical min-url mode must agree
    val typed = InvertedIndex.postings(toDf(docs)).as[graft.model.Posting]
    val strict = graft.functions.FirstUrlPostingListAgg.buildIndex(typed)
      .collect().map(pl => pl.term -> pl.postings).toMap
    val canonical = graft.functions.PostingListAgg.buildIndex(typed)
      .collect().map(pl => pl.term -> pl.postings).toMap
    strict == canonical
  }

  property("(f) strict R3 mode ≡ sequential reference reducer on ordered input") = forAll(docsGen) { docs =>
    import spark.implicits._
    // plant url ties: every doc contributes its posting twice under two
    // urls, arrival order (uB before uA) differing from lexical order
    val tied = docs.flatMap { case (id, _, t) =>
      Seq((id, s"uB$id", t), (id, s"uA$id", t))
    }
    val seqPostings = tied.flatMap { case (id, u, t) => refTerms(t).map(term => (term, id, u)) }
    val expected = seqPostings.groupBy(_._1).map { case (term, ps) =>
      term -> ps.distinctBy(_._2).map(p => graft.model.DocRef(p._2, p._3))
        .sortBy(r => (r.doc_id, r.url))
    }
    val ds = seqPostings.map(p => graft.model.Posting(p._1, p._2, p._3))
      .toDS().coalesce(1) // sequential runtime, like the reference reducer
    val got = graft.functions.FirstUrlPostingListAgg.buildIndex(ds)
      .collect().map(pl => pl.term -> pl.postings.toList).toMap
    got == expected.map { case (k, v) => k -> v.toList }
  }

  property("(d) union of partition builds ≡ whole build") = forAll(docsGen) { docs =>
    import spark.implicits._
    val (g1, g2) = docs.partition(_._1 % 2 == 0)
    val partials = InvertedIndex.postings(toDf(g1)).union(InvertedIndex.postings(toDf(g2)))
    val whole = InvertedIndex.postings(toDf(docs))
    partials.select("term", "doc_id").as[(String, Long)].collect().toSet ==
      whole.select("term", "doc_id").as[(String, Long)].collect().toSet &&
      partials.count() == whole.count()
  }
}
