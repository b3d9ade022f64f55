package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.AnalysisQueries

/** Stupid-backoff bigram perplexity (q_ppl) on a crafted corpus: pins
  * the seen-bigram path, the backoff path (unseen bigram AND unseen
  * word), and the DIVERGENCE from a unigram-only model — the reason a
  * bigram gate exists.
  */
class PplSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // training slice (src0): ONE doc "x y x y" → unigrams x:2 y:2 (N=4,
  // V=2); bigrams "x y":2 "y x":1. Scoring docs: doc1 all-seen, doc2
  // hits an unseen bigram whose second word is ALSO unseen.
  private lazy val out = {
    val d = Seq(
      (0L, "src0", "x y x y"),
      (1L, "src9", "x y"),
      (2L, "src9", "y q")
    ).toDF("doc_id", "source", "text")
    AnalysisQueries.pplOf(d)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("seen bigrams score as conditional counts (no backoff)") {
    // doc1 "x y": S(y|x) = c2(xy)/c1(x) = 2/2 = 1 → ln = 0 → ppl = 1
    assert(out(1L) === ((1L, 0L, 1.0)))
    // doc0 "x y x y": grams (x y)×2 at ln 1 = 0, (y x)×1 at ln(1/2);
    // ppl = exp(−(2·0 + ln .5)/3)
    val (n0, bk0, ppl0) = out(0L)
    assert(n0 === 3L && bk0 === 0L)
    assert(ppl0 === r6(math.exp(-(r6(math.log(1.0 / 2)) * 1) / 3)))
  }

  test("unseen bigram backs off to the add-one unigram floor") {
    // doc2 "y q": "y q" unseen → S = 0.4·(c1(q)+1)/(N+V) = 0.4·(1/6)
    val (n2, bk2, ppl2) = out(2L)
    assert(n2 === 1L && bk2 === 1L)
    assert(ppl2 === r6(math.exp(-r6(math.log(0.4 * (1.0 / 6))))))
  }

  test("bigram model diverges from unigram-only scoring") {
    // a unigram LM gives doc1 "x y" P = p(x)·p(y) = .5·.5 → per-token
    // ppl 2; the bigram model credits the SEEN transition: ppl exactly 1
    assert(out(1L)._3 === 1.0)
    assert(out(1L)._3 !== 2.0)
    // and the unseen-transition doc prices ~15× worse than the seen one
    assert(out(2L)._3 > 10 * out(1L)._3)
  }
}
