package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // crafted linearly-separable seed: positives live at x1 ≈ +1,
  // negatives at x1 ≈ −1, with a nuisance feature x2 that carries no
  // signal (symmetric across classes)
  private def crafted = Seq(
    (1.0, 1.2, 0.3), (1.0, 0.8, -0.3), (1.0, 1.1, 0.1), (1.0, 0.9, -0.1),
    (0.0, -1.2, 0.3), (0.0, -0.8, -0.3), (0.0, -1.1, 0.1), (0.0, -0.9, -0.1)
  ).toDF("y", "x1", "x2")

  test("fit separates a crafted linearly-separable seed") {
    val w = Classifier.fitLogReg(crafted, Seq("x1", "x2"), "y", rounds = 8, lr = 2.0)
    // the signal feature dominates; the nuisance feature stays small
    assert(w(1) > 0.5, s"signal weight should be strongly positive: ${w.toSeq}")
    assert(math.abs(w(2)) < math.abs(w(1)) / 4,
      s"nuisance weight should stay small: ${w.toSeq}")
    // 100% seed accuracy: margin sign matches the label on every row
    val z = Classifier.margin(w.toSeq, Seq(col("x1"), col("x2")))
    val wrong = crafted.filter((z >= 0.0) =!= (col("y") === 1.0)).count()
    assert(wrong === 0L, s"separable seed must classify cleanly, weights ${w.toSeq}")
  }

  test("fit is partitioning-invariant (exact DECIMAL gradient protocol)") {
    val one = Classifier.fitLogReg(crafted.coalesce(1), Seq("x1", "x2"), "y", 6, 2.0)
    val many = Classifier.fitLogReg(crafted.repartition(7), Seq("x1", "x2"), "y", 6, 2.0)
    assert(one.toSeq === many.toSeq,
      "weights must be identical under any partitioning")
  }

  test("score is the algebraic sigmoid: monotone in the margin, gate at 0.5 ⇔ margin at 0") {
    val pts = Seq((-3.0), (-0.5), (0.0), (0.5), (3.0)).toDF("x")
    val s = Classifier.score(Seq(0.0, 1.0), Seq(col("x")))
    val got = pts.select(col("x"), s.as("p")).orderBy("x")
      .as[(Double, Double)].collect()
    assert(got.map(_._2).sliding(2).forall(p => p(0) < p(1)), "monotone")
    assert(got.forall { case (x, p) => (p >= 0.5) == (x >= 0.0) },
      "p ≥ 0.5 must coincide with margin ≥ 0")
    assert(got.forall { case (_, p) => p > 0.0 && p < 1.0 }, "open unit range")
  }

  test("real-fixture seed: the trained gate is live (keeps most, not all)") {
    val d = graft.sources.Corpus.documents(spark, "/root/testdata/sf0.001")
    val out = SparkEntry.queries("q_quality_clf")(spark, "/root/testdata/sf0.001")
      .select(sum("n_docs"), sum("n_kept")).as[(Long, Long)].collect()(0)
    assert(out._2 > 0L, "gate must keep some documents")
    assert(out._2 < out._1, "gate must reject some documents — a keep-all " +
      "gate means the trained threshold is decorative")
    assert(d.count() === out._1)
  }
}
