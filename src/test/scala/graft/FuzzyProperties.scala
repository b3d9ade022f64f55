package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.FuzzyJoin

/** Property invariants for the SymSpell fuzzy family, checked against
  * a plain-Scala DP edit-distance oracle on generated string sets —
  * short strings over a tiny alphabet maximize accidental collisions,
  * transpositions, and length-gap (insert/delete) pairs, the shapes
  * the r12 blocking silently dropped.
  */
object FuzzyProperties extends Properties("FuzzyJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  lazy val spark = SparkTestSession.spark

  private val strGen: Gen[String] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))).map(_.mkString)
  private val setGen: Gen[List[String]] =
    Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, strGen)).map(_.distinct)

  private def ed(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("ed1Pairs ≡ brute-force DP edit distance on any string set") =
    forAll(setGen) { strs =>
      import spark.implicits._
      val got = FuzzyJoin.ed1Pairs(strs.toDF("url"), "url")
        .as[(String, String)].collect().toSet
      val want = (for (a <- strs; b <- strs if a < b && ed(a, b) == 1)
        yield (a, b)).toSet
      got == want
    }

  property("ed1Matches ≡ brute-force neighbors of any probe") =
    forAll(setGen, strGen) { (dict, probe) =>
      import spark.implicits._
      val got = FuzzyJoin.ed1Matches(dict.toDF("term"), "term", probe)
        .as[String].collect().toSet
      val want = dict.filter(t => ed(t, probe) <= 1).toSet
      got == want
    }
}
