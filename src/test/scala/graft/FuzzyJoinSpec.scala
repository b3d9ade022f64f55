package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairs(urls: Seq[String]): Set[(String, String)] =
    FuzzyJoin.ed1Pairs(urls.toDF("url"), "url")
      .as[(String, String)].collect().toSet

  test("insert/delete ED-1 pairs are caught (trailing-slash twins)") {
    // lengths n vs n+1 — a deletions-only block (the r12 scheme) can
    // NEVER match these: the shorter's deletions have length n−1, the
    // longer's have length n; only the identity variant collides
    val got = pairs(Seq("/wiki/X", "/wiki/X/", "doc://web/1", "doc://web/12"))
    assert(got.contains(("/wiki/X", "/wiki/X/")))
    assert(got.contains(("doc://web/1", "doc://web/12")))
  }

  test("substitution ED-1 pairs are caught via the shared deletion") {
    assert(pairs(Seq("doc://web/7", "doc://web/9")) ===
      Set(("doc://web/7", "doc://web/9")))
  }

  test("ED-2 candidates that share a deletion variant are filtered out") {
    // "ab"/"ba" share both 1-deletion variants but are at distance 2;
    // transposed middle chars likewise
    assert(pairs(Seq("xaby", "xbay")) === Set.empty)
    assert(pairs(Seq("ab", "ba")) === Set.empty)
  }

  test("ed1Pairs equals brute-force levenshtein on a mixed fixture") {
    val urls = Seq(
      "doc://a/1", "doc://a/12", "doc://a/2", "doc://b/1", "doc://b/1/",
      "doc://ab/3", "doc://ba/3", "x", "xy", "xyz")
    val brute = (for {
      a <- urls; b <- urls if a < b
    } yield (a, b)).filter { case (a, b) =>
      // tiny strings: classic DP edit distance
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length) == 1
    }.toSet
    assert(pairs(urls) === brute)
  }

  test("ed1Matches finds substitution AND insertion dictionary neighbors") {
    val dict = Seq("part", "spark", "park", "stream", "parking", "pork")
      .toDF("term")
    // probe absent from the dictionary: matches via substitution
    // ("pork"→"park" would be probe-side), insertion ("spark"), identity
    val got = FuzzyJoin.ed1Matches(dict, "term", "park")
      .as[String].collect().toSet
    assert(got === Set("park", "part", "spark", "pork"))
    // "parking" is at distance 3 — length band alone must not admit it
    val far = FuzzyJoin.ed1Matches(dict, "term", "parkin")
      .as[String].collect().toSet
    assert(far === Set("parking"))
  }

  test("variantsOf mirrors the column form") {
    val s = "abc"
    val fromCol = Seq(s).toDF("u").select(FuzzyJoin.variants(col("u")))
      .as[Seq[String]].head()
    assert(fromCol === FuzzyJoin.variantsOf(s))
    assert(FuzzyJoin.variantsOf(s) === Seq("abc", "bc", "ac", "ab"))
  }
}
