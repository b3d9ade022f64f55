package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.Stats

/** Property pins for the statistical operators against INDEPENDENT
  * plain-Scala formulations over generated data — the
  * `FuzzyProperties` discipline: the oracle must not mirror the
  * operator's own decomposition, or a hole in the decomposition
  * passes unseen. In particular `jsDivergence`'s inner-join-only
  * algebra (one-sided mass = shared-mass complement) is checked
  * against the textbook full-union JSD.
  */
object StatsProperties extends Properties("Stats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  lazy val spark = SparkTestSession.spark

  private val cohortGen: Gen[(List[Double], List[Double])] = for {
    na <- Gen.choose(2, 12)
    nb <- Gen.choose(2, 12)
    a <- Gen.listOfN(na, Gen.choose(0, 9999).map(_ / 100.0)) // 2-dp values
    b <- Gen.listOfN(nb, Gen.choose(0, 9999).map(_ / 100.0))
  } yield (a, b)

  private def varOf(x: Seq[Double]): Double = {
    val m = x.sum / x.size
    x.map(v => (v - m) * (v - m)).sum / (x.size - 1)
  }

  property("welchTTest ≡ direct mean/variance formulation on generated cohorts") =
    forAll(cohortGen) { case (a, b) =>
      import spark.implicits._
      // a zero-variance-both-sides pair divides by zero in t (NaN both
      // ways, but non-finite equality through round() is brittle) —
      // the statistic is only defined past it
      (varOf(a) <= 1e-9 && varOf(b) <= 1e-9) || {
        val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
        val row = Stats.welchTTest(df, "g", "v", "a", "b")
          .as[(String, String, Long, Long, Double, Double, Double, Double)].head()
        val (ma, mb) = (a.sum / a.size, b.sum / b.size)
        val (sea, seb) = (varOf(a) / a.size, varOf(b) / b.size)
        val tRef = (ma - mb) / math.sqrt(sea + seb)
        val dfRef = (sea + seb) * (sea + seb) /
          (sea * sea / (a.size - 1) + seb * seb / (b.size - 1))
        row._3 == a.size.toLong && row._4 == b.size.toLong &&
          math.abs(row._5 - ma) < 1e-6 && math.abs(row._6 - mb) < 1e-6 &&
          math.abs(row._7 - tRef) < 1e-5 && math.abs(row._8 - dfRef) < 1e-5
      }
    }

  private val countsGen: Gen[(List[(String, Long)], List[(String, Long)])] = for {
    nTerms <- Gen.choose(1, 8)
    aCounts <- Gen.listOfN(nTerms, Gen.choose(0L, 20L))
    bCounts <- Gen.listOfN(nTerms, Gen.choose(0L, 20L))
  } yield {
    val terms = (0 until nTerms).map(i => s"t$i").toList
    (terms.zip(aCounts).filter(_._2 > 0), terms.zip(bCounts).filter(_._2 > 0))
  }

  property("jsDivergence's inner-join decomposition ≡ full-union JSD on generated tables") =
    forAll(countsGen) { case (ac, bc) =>
      import spark.implicits._
      ac.isEmpty || bc.isEmpty || {
        val counts = (ac.map { case (t, n) => ("s1", t, n) } ++
          bc.map { case (t, n) => ("s2", t, n) }).toDF("g", "term", "c")
        val aTot = ac.map(_._2).sum.toDouble
        val bTot = bc.map(_._2).sum.toDouble
        val p = ac.map { case (t, n) => t -> n / aTot }.toMap
        val q = bc.map { case (t, n) => t -> n / bTot }.toMap
        val m = (p.keySet ++ q.keySet).map(t =>
          t -> (p.getOrElse(t, 0.0) + q.getOrElse(t, 0.0)) / 2).toMap
        def kl(d: Map[String, Double]): Double =
          d.map { case (t, pv) => pv * math.log(pv / m(t)) }.sum
        val ref = (kl(p) + kl(q)) / 2
        val rows = Stats.jsDivergence(counts, "g", "term", "c")
          .as[(String, String, Long, Double)].collect()
        val shared = p.keySet.intersect(q.keySet)
        if (shared.isEmpty)
          // disjoint vocabularies never join; by the decomposition their
          // JSD is exactly ln 2 and the pair is absent from the output
          rows.isEmpty && math.abs(ref - math.log(2.0)) < 1e-9
        else
          rows.length == 1 && rows.head._3 == shared.size.toLong &&
            math.abs(rows.head._4 - ref) < 1e-5
      }
    }
}
