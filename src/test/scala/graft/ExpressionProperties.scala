package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.plans.RollingHashes

/** Property invariants for the native Catalyst expressions, checked
  * against independent plain-Scala reference implementations (never the
  * expression's own code paths).
  */
object ExpressionProperties extends Properties("Expressions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  lazy val spark = SparkTestSession.spark

  private val asciiStr = Gen.choose(0, 40)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf(('a' to 'z') :+ ' ')))
    .map(_.mkString)
  private val width = Gen.choose(1, 8)

  private def directRolling(s: String, w: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    val cs = RollingHashes.coefficients(w)
    (0 to bytes.length - w).map { i =>
      cs.zipWithIndex.map { case (c, j) => (bytes(i + j) & 0xff) * c }.sum % RollingHashes.Modulus
    }
  }

  property("rolling_hashes ≡ direct polynomial sum on random strings") =
    forAll(asciiStr, width) { (s, w) =>
      import spark.implicits._
      val got = Seq(s).toDF("s")
        .select(RollingHashes.rollingHashes($"s", w).as("h"))
        .as[Seq[Long]].head()
      got == directRolling(s, w)
    }

  private val hexStr = Gen.choose(1, 16)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf("0123456789abcdef".toSeq)))
    .map(_.mkString)

  private def refHamming(a: String, b: String): Int =
    a.zip(b).map { case (x, y) =>
      Integer.bitCount(Integer.parseInt(x.toString, 16) ^ Integer.parseInt(y.toString, 16))
    }.sum

  property("hamming_hex ≡ nibble-wise bit count on equal-length hex strings") =
    forAll(hexStr, hexStr) { (a0, b0) =>
      import spark.implicits._
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.plans.HammingHex.hammingHex($"a", $"b").as("d"))
        .as[Int].head()
      got == refHamming(a, b)
    }

  // small alphabet ⇒ dense collisions ⇒ real runs after the internal
  // sort; "🙂🙂" (length 4 UTF-16 units, 2 codepoints) pins the
  // codepoint-counting contract the ASCII grams can't distinguish
  private val gramArray = Gen.choose(0, 30)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf("aa", "bb b", "c", "dd", "e e e", "🙂🙂")))

  private def refRunStats(grams: Seq[String]): (Long, Long) = {
    def cpLen(g: String): Long = g.codePointCount(0, g.length).toLong
    val hist = grams.groupBy(identity).map { case (g, occ) => (g, occ.size) }
    val top =
      if (hist.isEmpty) 0L
      else {
        val mc = hist.values.max
        hist.collect { case (g, c) if c == mc => c * cpLen(g) }.max
      }
    val dup = hist.collect { case (g, c) if c >= 2 => c * cpLen(g) }.sum
    (top, dup)
  }

  property("run_stats ≡ histogram reference on random gram arrays") =
    forAll(gramArray) { grams =>
      import spark.implicits._
      val got = Seq(Tuple1(grams)).toDF("gs")
        .select(graft.plans.RunStats.runStats($"gs").as("r"))
        .select($"r.top_chars", $"r.dup_chars")
        .as[(Long, Long)].head()
      got == refRunStats(grams)
    }

  property("run_stats ≡ retained aggregate() fold (bit identity)") =
    forAll(gramArray) { grams =>
      import spark.implicits._
      val df = Seq(Tuple1(grams)).toDF("gs").select(
        graft.plans.RunStats.runStats($"gs").as("n"),
        graft.functions.TextAnalysis.runStatsViaColumns(
          org.apache.spark.sql.functions.array_sort($"gs")).as("c"))
      df.select($"n.top_chars", $"n.dup_chars", $"c.top_chars", $"c.dup_chars")
        .as[(Long, Long, Long, Long)].head() match {
          case (nt, nd, ct, cd) => nt == ct && nd == cd
        }
    }

  // small alphabet ⇒ real repeat runs; the histogram reference computes
  // the micro-nat sum independently (Map-based, no sorting)
  private val tokArray = Gen.choose(0, 30)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "bb", "c", "dd", "e", "f")))

  private def refEntropyStats(toks: Seq[String]): (Long, Long, Long) = {
    val hist = toks.groupBy(identity).map { case (_, occ) => occ.size.toLong }
    val sm = hist.map(c => c * Math.round(Math.log(c.toDouble) * 1000000.0)).sum
    (toks.size.toLong, hist.size.toLong, sm)
  }

  property("entropy_stats ≡ histogram reference on random token arrays") =
    forAll(tokArray) { toks =>
      import spark.implicits._
      val got = Seq(Tuple1(toks)).toDF("ts")
        .select(graft.plans.EntropyStats.entropyStats($"ts").as("r"))
        .select($"r.dl", $"r.n_terms", $"r.s_micros")
        .as[(Long, Long, Long)].head()
      got == refEntropyStats(toks)
    }

  property("entropy_stats ≡ retained aggregate() fold (bit identity)") =
    forAll(tokArray) { toks =>
      import spark.implicits._
      val df = Seq(Tuple1(toks)).toDF("ts").select(
        graft.plans.EntropyStats.entropyStats($"ts").as("n"),
        graft.functions.TextAnalysis.entropyStatsViaColumns(
          org.apache.spark.sql.functions.array_sort($"ts")).as("c"))
      df.select($"n.dl", $"n.n_terms", $"n.s_micros",
          $"c.dl", $"c.n_terms", $"c.s_micros")
        .as[(Long, Long, Long, Long, Long, Long)].head() match {
          case (nd, nt, ns, cd, ct, cs) => nd == cd && nt == ct && ns == cs
        }
    }
}
