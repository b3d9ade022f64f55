package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala references for the r15 wave-2 audit
  * operators — the StatsSpec discipline: each check recomputes the
  * answer with direct arithmetic over raw values (no DECIMAL protocol,
  * no shared code path), so an engine-side protocol bug cannot hide
  * behind a mirrored oracle.
  */
class AuditQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("dsirWeights matches a hand-computed two-word fixture") {
    // corpus: docA(target) = "x x y", docB = "x y y y"
    // counts: cT(x)=2, cT(y)=1, NT=3; cC(x)=3, cC(y)=4, NC=7; V=2
    val tfAll = Seq((1L, "x", 2L), (1L, "y", 1L), (2L, "x", 1L), (2L, "y", 3L))
      .toDF("doc_id", "term", "tf")
    val cRel = Seq(("x", 3L), ("y", 4L)).toDF("term", "c")
    val nCorpus = Seq(Tuple1(7L)).toDF("n_corpus")
    val tgt = Seq(("x", 2L), ("y", 1L)).toDF("term", "ct")
    val nT = Seq(Tuple1(3L)).toDF("n_t")
    val v = Seq(Tuple1(2.0)).toDF("v")
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    def w(ct: Long, c: Long) =
      r6(math.log((ct + 1.0) / (3L + 2.0))) - r6(math.log((c + 1.0) / (7L + 2.0)))
    val refA = r6((2 * w(2, 3) + 1 * w(1, 4)) / 3.0)
    val refB = r6((1 * w(2, 3) + 3 * w(1, 4)) / 4.0)
    val got = graft.operators.TermScoring
      .dsirWeights(tfAll, cRel, nCorpus, tgt, nT, v)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(got(0) === ((1L, 3L, refA)))
    assert(got(1) === ((2L, 4L, refB)))
    // the target doc leans toward x (over-represented in target) → higher
    assert(refA > refB)
  }

  test("q_int8_quant: codes bound the reconstruction error by scale/2") {
    // theorem: code = round((x−mn)/scale) ⇒ |x − (mn + code·scale)| ≤
    // scale/2 (+ float slack); v_min/v_max bracket every recon
    val rows = SparkEntry.queries("q_int8_quant")(spark, dir)
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(rows.length > 0)
    rows.foreach { case (id, mn, mx, mae, maxAe) =>
      val scale = (mx - mn) / 255.0
      // + 5e-7: max_ae is reported on the 6-dp grid, half-ulp slack
      assert(maxAe <= scale / 2.0 + 5e-7, s"vec $id: $maxAe > ${scale / 2}")
      assert(mae <= maxAe + 1e-9 && mae >= 0.0)
    }
  }

  test("q_mixture: temperature shares sum to 1 and upweight small sources") {
    val rows = SparkEntry.queries("q_mixture")(spark, dir)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    val (sumRaw, sumTemp) = (rows.map(_._4).sum, rows.map(_._5).sum)
    assert(math.abs(sumRaw - 1.0) < 1e-3, s"p_raw sums to $sumRaw")
    assert(math.abs(sumTemp - 1.0) < 1e-3, s"p_temp sums to $sumTemp")
    // α < 1 flattens: the smallest source's share must not shrink and
    // the largest must not grow
    val smallest = rows.minBy(_._3)
    val largest = rows.maxBy(_._3)
    assert(smallest._6 >= 1.0 - 1e-6, s"smallest source boost ${smallest._6} < 1")
    assert(largest._6 <= 1.0 + 1e-6, s"largest source boost ${largest._6} > 1")
  }

  test("piiScan counts a synthetic fixture exactly") {
    // doc 0 hits all three enrichments (0 mod 7/11/13); doc 1 none
    val got = SparkEntry.queries("q_pii_scan")(spark, dir)
      .agg(sum("n_emails").cast("long"), sum("n_ipv4").cast("long"),
        sum("n_phones").cast("long"), sum("n_pii_docs").cast("long"))
      .as[(Long, Long, Long, Long)].head()
    // exact expected counts from the enrichment rule over dense ids 0..N−1
    val n = graft.sources.Corpus.documents(spark, dir).count()
    val ids = 0L until n
    val (e, i, p) =
      (ids.count(_ % 7 == 0), ids.count(_ % 11 == 0), ids.count(_ % 13 == 0))
    val withAny = ids.count(d => d % 7 == 0 || d % 11 == 0 || d % 13 == 0)
    assert(got === ((e.toLong, i.toLong, p.toLong, withAny.toLong)))
  }

  test("entropy matches a direct histogram reference on the corpus") {
    // direct double-arithmetic reference (no micro-nat protocol): for a
    // doc with counts c_i, H = ln(n) − Σ c·r6(ln c)/1e0.. — reference
    // uses the SAME rounding of ln c (the engine contract) but computes
    // everything else independently in plain Scala over collected tokens
    val docs = graft.sources.Corpus.documents(spark, dir)
      .select(col("doc_id"), graft.functions.Text.tokenize(col("text")).as("ts"))
      .as[(Long, Seq[String])].collect().toMap
    val got = SparkEntry.queries("q_entropy")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect()
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    got.foreach { case (id, dl, nTerms, ttr, h) =>
      val toks = docs(id)
      val hist = toks.groupBy(identity).map(_._2.size)
      assert(dl === toks.size.toLong && nTerms === hist.size.toLong)
      if (toks.nonEmpty) {
        val s = hist.map(c => c.toLong * math.round(math.log(c) * 1e6)).sum
        val ref = r6(math.log(toks.size.toDouble) - (s / 1e6) / toks.size)
        assert(math.abs(h - ref) < 1e-9, s"doc $id: $h vs $ref")
        assert(math.abs(ttr - r6(nTerms.toDouble / dl)) < 1e-9)
        // entropy is bounded by ln of the support size (+ the 6-dp
        // grid's half-ulp: a uniform doc reports round(ln n, 6) ≥ ln n)
        assert(h >= -1e-9 && h <= math.log(nTerms.toDouble) + 5e-7)
      }
    }
  }

  test("q_yield stages are monotone non-increasing and start at n_docs") {
    val rows = SparkEntry.queries("q_yield")(spark, dir)
      .orderBy("stage").as[(String, Long, Double)].collect()
    assert(rows.map(_._1).toSeq ===
      Seq("0_raw", "1_lang", "2_quality", "3_dedup", "4_decontam"))
    assert(rows.head._2 === graft.sources.Corpus.documents(spark, dir).count())
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"stage ${b._1} grew: ${a._2} -> ${b._2}")
    }
    assert(math.abs(rows.head._3 - 1.0) < 1e-9)
  }

  test("q_curriculum selects exactly the quality-ordered budget prefix") {
    // independent reference: sort collected (quality desc, doc_id),
    // walk until the exclusive running total reaches the budget
    val d = graft.sources.Corpus.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.qualityScore(col("text")).as("q"),
        size(graft.functions.Text.tokenize(col("text"))).cast("long").as("nt"))
      .as[(Long, Double, Long)].collect()
      .sortBy { case (id, q, _) => (-q, id) }
    val budget = 16384L
    var cum = 0L
    val ref = d.takeWhile { case (_, _, nt) =>
      val keep = cum < budget; cum += nt; keep
    }.map(_._1).toSet
    val got = SparkEntry.queries("q_curriculum")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(got === ref)
  }

  test("q_span_dups pairs share a verbatim 8-token window (sampled re-check)") {
    val pairs = SparkEntry.queries("q_span_dups")(spark, dir)
      .as[(Long, Long, Long)].collect()
    if (pairs.nonEmpty) {
      val docs = graft.sources.Corpus.documents(spark, dir)
        .select(col("doc_id"), graft.functions.Text.tokenize(col("text")).as("ts"))
        .as[(Long, Seq[String])].collect().toMap
      def windows(id: Long): Set[String] =
        docs(id).sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSet
      pairs.take(5).foreach { case (a, b, n) =>
        val shared = windows(a) intersect windows(b)
        assert(shared.nonEmpty, s"pair ($a,$b) shares no verbatim window")
        assert(n >= 1L && n <= shared.size.toLong,
          s"pair ($a,$b): reported $n vs ${shared.size} actual (df band may drop some)")
      }
    }
  }

  test("q_dup_weights: weights sum to 1 per cluster, singletons weigh 1") {
    val rows = SparkEntry.queries("q_dup_weights")(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.filter(_._2 === 1L).foreach { case (id, _, w) =>
      assert(w === 1.0, s"singleton $id weight $w")
    }
    // grouped mass: sum of (1/size) over each size-k family = 1 (±6dp grid)
    rows.filter(_._2 > 1L).groupBy(_._2).foreach { case (sz, fam) =>
      val mass = fam.map(_._3).sum
      val nFamilies = fam.length / sz.toDouble
      assert(math.abs(mass - nFamilies) < 1e-4 * fam.length,
        s"size-$sz families: mass $mass for $nFamilies families")
    }
  }

  test("q_hard_negatives never returns the query's own label") {
    val lab = graft.sources.Tables.tbl(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val bad = SparkEntry.queries("q_hard_negatives")(spark, dir)
      .join(lab.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
      .join(lab, "vec_id")
      .filter(col("label") === col("ql"))
      .count()
    assert(bad === 0L)
  }
}
