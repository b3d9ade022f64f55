package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Unigram

class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def words(dir: String = "/root/testdata/sf0.001") =
    graft.sources.Corpus.documents(spark, dir)
      .select(explode(graft.functions.Text.tokenize(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))

  test("compositions enumerate every segmentation shape exactly once") {
    // tetranacci: 1, 2, 4, 8, 15, 29, 56, 108 for n = 1..8
    assert(Seq(1, 2, 3, 4, 5, 6, 7, 8).map(Unigram.compositions(_).size)
      === Seq(1, 2, 4, 8, 15, 29, 56, 108))
    val c5 = Unigram.compositions(5)
    assert(c5.distinct.size === c5.size)
    assert(c5.forall(c => c.sum == 5 && c.forall(l => l >= 1 && l <= 4)))
  }

  test("a word over the composition bound fails loudly, never silently vanishes") {
    val long = Seq(("prefixsuffixplus", 1L)).toDF("word", "wc")
    val e = intercept[Exception] {
      Unigram.segTable(long).count()
    }
    assert(e.getMessage.contains("composition bound") ||
      Option(e.getCause).exists(_.getMessage.contains("composition bound")))
  }

  test("EM is partitioning-invariant (exact-integer counts, 6dp grid)") {
    val w = words()
    val a = Unigram.fit(w.coalesce(1), multiBudget = 12, rounds = 3)
    val b = Unigram.fit(w.repartition(7), multiBudget = 12, rounds = 3)
    assert(a.vocab === b.vocab)
    assert(a.history === b.history)
    assert(a.counts === b.counts)
  }

  test("Viterbi likelihood is non-decreasing across the EM rounds") {
    val w = words()
    val f = Unigram.fit(w, multiBudget = 12, rounds = 3)
    val seg = Unigram.segTable(w).persist()
    try {
      // corpus Viterbi log-likelihood under each round's probabilities
      // (ln only in the SPEC — the trained state itself has none)
      val lls = f.history.map { probs =>
        Unigram.bestSegs(seg, probs)
          .select((col("wc") * log(col("cost"))).as("ll"))
          .agg(sum("ll")).collect()(0).getDouble(0)
      }
      assert(lls.sliding(2).forall(p => p(1) >= p(0) - 1e-9),
        s"hard-EM should not decrease the Viterbi likelihood: $lls")
      assert(lls.last > lls.head, "training should actually improve the fit")
    } finally { seg.unpersist(); () }
  }

  test("prune cycle: chars survive, exactly keepBudget multi pieces remain, re-EM improves the restricted fit") {
    val w = words().persist()
    try {
      val pre = Unigram.fit(w, multiBudget = 16, rounds = 2)
      val pruned = Unigram.fitPruned(w, seedBudget = 16, preRounds = 2,
        keepBudget = 12, postRounds = 1)
      val chars = pre.vocab.filter(_.length == 1)
      assert(pruned.vocab.filter(_.length == 1) === chars,
        "pruning must never drop a character piece — segmentation stays total")
      assert(pruned.vocab.count(_.length > 1) === 12)
      assert(pruned.vocab.toSet.subsetOf(pre.vocab.toSet))
      // the dropped pieces are exactly the weakest by trained prob
      val trained = pre.history.last
      val kept = pre.vocab.filter(_.length > 1).sortBy(p => (-trained(p), p)).take(12)
      assert(pruned.vocab.filter(_.length > 1).sorted === kept.sorted)
      // hard-EM monotonicity WITHIN the restricted vocabulary: the
      // re-EM round must not decrease the Viterbi likelihood relative
      // to serving the pruned selection probabilities directly
      val seg = Unigram.segTable(w).persist()
      try {
        def ll(probs: Map[String, Double]): Double =
          Unigram.bestSegs(seg, probs)
            .select((col("wc") * log(col("cost"))).as("ll"))
            .agg(sum("ll")).collect()(0).getDouble(0)
        assert(ll(pruned.history.last) >= ll(pruned.history.head) - 1e-9,
          "post-prune re-EM must not decrease the restricted Viterbi likelihood")
      } finally { seg.unpersist(); () }
    } finally { w.unpersist(); () }
  }

  test("fertility comparison row: unigram and BPE both beat the char baseline") {
    val w = words().persist()
    try {
      val nTokens = w.agg(sum("wc")).collect()(0).getLong(0)
      // char baseline = average word length
      val charPieces = w.agg(sum(col("wc") * length(col("word"))))
        .collect()(0).getLong(0)
      val uni = Unigram.sweep(w, budgets = Seq(12))
        .select("fertility").as[Double].collect()(0)
      val bpeMerges = graft.operators.Bpe.train(w, rounds = 8)
        .select("left", "right").as[(String, String)].collect().toSeq
      val bpePieces = w.select(col("wc"),
          size(graft.operators.Bpe.encodeSyms(col("word"), bpeMerges)).as("n"))
        .agg(sum(col("wc") * col("n"))).collect()(0).getLong(0)
      val comparison = Seq((
        uni,
        BigDecimal(bpePieces.toDouble / nTokens).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(charPieces.toDouble / nTokens).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble
      )).toDF("fertility_unigram", "fertility_bpe", "fertility_chars")
      val row = comparison.collect()(0)
      assert(row.getDouble(0) < row.getDouble(2),
        s"a trained unigram vocab must encode denser than characters: $row")
      assert(row.getDouble(1) < row.getDouble(2),
        s"8 BPE merges must encode denser than characters: $row")
    } finally { w.unpersist(); () }
  }
}
