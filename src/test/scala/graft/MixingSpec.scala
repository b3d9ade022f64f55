package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mixing

class MixingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = (
    (1 to 6).map(i => (s"a", i.toLong, s"doc a$i")) ++
      (1 to 4).map(i => ("b", 100L + i, s"doc b$i")) ++
      (1 to 10).map(i => ("c", 200L + i, s"doc c$i"))
  ).toDF("source", "doc_id", "text")

  test("targetMix: scarcest source caps the total, quotas hit the exact mix") {
    // K = min(floor(6/0.5), floor(4/0.5)) = 8 → quotas 4 and 4
    val got = Mixing.targetMix(corpus, Seq("a" -> 0.5, "b" -> 0.5))
      .as[(String, Long, Long)].collect()
    assert(got.length === 8)
    assert(got.count(_._1 == "a") === 4 && got.count(_._1 == "b") === 4)
    assert(!got.exists(_._1 == "c"), "non-targeted source must be dropped")
    assert(got.forall(_._3 <= 4), "rank never exceeds the quota")
  }

  test("targetMix: skewed weights derive proportional quotas") {
    // K = min(floor(6/0.75), floor(4/0.25)) = 8 → quotas floor(6)=6, floor(2)=2
    val got = Mixing.targetMix(corpus, Seq("a" -> 0.75, "b" -> 0.25))
      .as[(String, Long, Long)].collect()
    assert(got.count(_._1 == "a") === 6 && got.count(_._1 == "b") === 2)
  }

  test("targetMix: a targeted source with no corpus rows empties the result, loudly not silently") {
    val got = Mixing.targetMix(corpus, Seq("a" -> 0.5, "zz" -> 0.5))
    assert(got.count() === 0)
  }

  test("targetMix: deterministic — identical selection across runs") {
    val a = Mixing.targetMix(corpus, Seq("a" -> 0.6, "c" -> 0.4))
      .as[(String, Long, Long)].collect().toSet
    val b = Mixing.targetMix(corpus, Seq("a" -> 0.6, "c" -> 0.4))
      .as[(String, Long, Long)].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("targetMix: rejects empty, non-positive, and duplicate targets") {
    intercept[IllegalArgumentException](Mixing.targetMix(corpus, Seq.empty))
    intercept[IllegalArgumentException](Mixing.targetMix(corpus, Seq("a" -> 0.0)))
    intercept[IllegalArgumentException](Mixing.targetMix(corpus, Seq("a" -> 0.5, "a" -> 0.5)))
  }
}
