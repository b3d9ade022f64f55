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

  test("targetMix: scarcest source caps the batches, proportions exact at every K") {
    // K = min(floor(6/1), floor(4/1)) = 4 batches → quotas 4 and 4
    val got = Mixing.targetMix(corpus, Seq("a" -> 1, "b" -> 1))
      .as[(String, Long, Long)].collect()
    assert(got.length === 8)
    assert(got.count(_._1 == "a") === 4 && got.count(_._1 == "b") === 4)
    assert(!got.exists(_._1 == "c"), "non-targeted source must be dropped")
    assert(got.forall(_._3 <= 4), "rank never exceeds the quota")
  }

  test("targetMix: skewed integer weights give exact-ratio quotas") {
    // 3:1 over counts (6, 4): K = min(floor(6/3), floor(4/1)) = 2 → 6 and 2
    val got = Mixing.targetMix(corpus, Seq("a" -> 3, "b" -> 1))
      .as[(String, Long, Long)].collect()
    assert(got.count(_._1 == "a") === 6 && got.count(_._1 == "b") === 2)
    // exactness under a non-divisible count: 5:2 over (6, 4) → K=1 → 5 and 2
    val got2 = Mixing.targetMix(corpus, Seq("a" -> 5, "b" -> 2))
      .as[(String, Long, Long)].collect()
    assert(got2.count(_._1 == "a") === 5 && got2.count(_._1 == "b") === 2)
  }

  test("targetMix: a targeted source that cannot fill one batch FAILS the job, naming it") {
    val e = intercept[Exception] {
      Mixing.targetMix(corpus, Seq("a" -> 1, "zz" -> 1)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("targetMix") && m.contains("zz")),
      s"error must name the offending source: $e")
    // same for a present-but-too-small source: weight 5 > 4 docs of b
    val e2 = intercept[Exception] {
      Mixing.targetMix(corpus, Seq("a" -> 1, "b" -> 5)).collect()
    }
    assert(messages(e2).exists(m => m.contains("targetMix") && m.contains("'b'")))
  }

  test("targetMix: deterministic — identical selection across runs") {
    val a = Mixing.targetMix(corpus, Seq("a" -> 3, "c" -> 2))
      .as[(String, Long, Long)].collect().toSet
    val b = Mixing.targetMix(corpus, Seq("a" -> 3, "c" -> 2))
      .as[(String, Long, Long)].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("targetMix: caller columns named like the working columns cannot collide") {
    import org.apache.spark.sql.functions.lit
    val noisy = corpus
      .withColumn("rk", lit(999L)).withColumn("quota", lit(-1L)).withColumn("n", lit(0L))
    val got = Mixing.targetMix(noisy, Seq("a" -> 1, "b" -> 1))
      .as[(String, Long, Long)].collect()
    assert(got.length === 8 && got.forall(_._3 <= 4),
      "operator-owned rk/quota must win over caller payload")
  }

  test("targetMix: rejects empty, non-positive, and duplicate targets") {
    intercept[IllegalArgumentException](Mixing.targetMix(corpus, Seq.empty))
    intercept[IllegalArgumentException](Mixing.targetMix(corpus, Seq("a" -> 0)))
    intercept[IllegalArgumentException](Mixing.targetMix(corpus, Seq("a" -> 1, "a" -> 2)))
  }

  /** Driver-side mirror of hashUniform/weightedPriority for oracle-style
    * cross-checks: md5 of the id string, first 8 hex chars → v,
    * u = (v + 0.5)/2^32, priority = round(u^(1/w), 6).
    */
  private def refPriority(id: Long, w: Double): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val v = java.lang.Long.parseLong(hex, 16)
    val u = (v + 0.5) / 4294967296.0
    BigDecimal(math.pow(u, 1.0 / w))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("weightedSample: top-k matches the A-ES reference computed driver-side") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 300L).map(i => (i, (i % 7 + 1) * 50L)).toDF("doc_id", "n_chars")
    val got = Mixing.weightedSample(df, col("n_chars"), 25)
      .as[(Long, Double)].collect().toSeq
    val want = (1L to 300L).map(i => (i, refPriority(i, ((i % 7) + 1) * 50.0)))
      .sortBy { case (id, p) => (-p, id) }.take(25)
    assert(got === want)
  }

  test("weightedSample: deterministic across runs and partitionings") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 500L).map(i => (i, i % 13 + 1L)).toDF("doc_id", "n_chars")
    val a = Mixing.weightedSample(df.repartition(3), col("n_chars"), 40)
      .as[(Long, Double)].collect().toSeq
    val b = Mixing.weightedSample(df.repartition(11), col("n_chars"), 40)
      .as[(Long, Double)].collect().toSeq
    assert(a === b)
  }

  test("weightedSample: weight dominance — a vastly heavier doc is always selected") {
    import org.apache.spark.sql.functions.col
    // w=1e6 vs w=1: u^(1e-6) is ~1 for ANY u, u^1 is uniform — the heavy
    // doc outranks 400 light docs (deterministic here, and overwhelmingly
    // probable under true A-ES semantics)
    val df = ((1L to 400L).map(i => (i, 1L)) :+ (999L, 1000000L)).toDF("doc_id", "n_chars")
    val ids = Mixing.weightedSample(df, col("n_chars"), 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.contains(999L), "heaviest doc missing from the sample")
  }

  test("weightedSample: plans TakeOrdered, never a global sort of the corpus") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Corpus.documents(spark, "/root/testdata/sf0.001")
    val p = Mixing.weightedSample(docs, col("n_chars"), 100)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
    assert(!"Exchange rangepartitioning".r.findFirstIn(p).isDefined,
      s"global sort exchange in a top-k sample:\n$p")
  }
}
