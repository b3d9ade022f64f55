package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.Dedup

/** Property invariants for the dedup operators, checked against
  * independent plain-Scala oracles on generated corpora.
  */
object DedupProperties extends Properties("Dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")
  private val textGen = Gen.choose(4, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  /** Corpus with a planted exact duplicate (same text, different case and
    * punctuation) of doc 0.
    */
  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 8)
    texts <- Gen.listOfN(n, textGen)
  } yield {
    val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val noisyDup = (n.toLong, texts.head.toUpperCase + "!!!")
    base :+ noisyDup
  }

  private def toDf(docs: List[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  property("native word_shingles ≡ the lambda slice/concat formulation, bit-identical") = forAll(corpusGen) { docs =>
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def canon(shingleCol: org.apache.spark.sql.Column) =
      toDf(docs)
        .select(col("doc_id"), graft.functions.Text.tokenize(col("text")).as("ts"))
        .select(col("doc_id"), shingleCol.as("sh"))
        .as[(Long, Seq[String])].collect().toMap
    canon(graft.functions.Text.shinglesFromTokens(col("ts"), 3)) ==
      canon(graft.functions.Text.shinglesFromTokensViaColumns(col("ts"), 3))
  }

  property("native md5_prefix32 ≡ the nested-lambda hex decode, bit-identical") = forAll(corpusGen) { docs =>
    import spark.implicits._
    val sh = Dedup.shingleSets(toDf(docs), 3)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "hv").as[(Long, Seq[Long])].collect().toMap
    canon(Dedup.hashValues(sh)) == canon(Dedup.hashValuesViaColumns(sh))
  }

  property("native minhash_sigs ≡ the pure-column band formulation, bit-identical") = forAll(corpusGen) { docs =>
    import spark.implicits._
    val hv = Dedup.hashValues(Dedup.shingleSets(toDf(docs), 3))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, String)].collect().toSet
    canon(Dedup.minhashBands(hv, 8, 3)) == canon(Dedup.minhashBandsViaColumns(hv, 8, 3))
  }

  property("exact dedup flags every normalized-identical doc, keeps min id") = forAll(corpusGen) { docs =>
    import spark.implicits._
    val got = Dedup.exact(toDf(docs))
      .select("doc_id", "canonical_id", "is_dup")
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    def norm(t: String) = t.toLowerCase.replaceAll("[^a-z\\s]", "")
    val byFp = docs.groupBy(d => norm(d._2))
    docs.forall { case (id, t) =>
      val canonical = byFp(norm(t)).map(_._1).min
      got(id) == ((canonical, id != canonical))
    }
  }

  property("near-dup pairs all meet the Jaccard threshold (no false positives)") = forAll(corpusGen) { docs =>
    import spark.implicits._
    val pairs = Dedup.nearDuplicates(toDf(docs))
      .as[(Long, Long, Double)].collect()
    def shingleSet(t: String): Set[String] = {
      val toks = t.toLowerCase.replaceAll("[^a-z\\s]", "").split("\\s+").filter(_.nonEmpty)
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    pairs.forall { case (a, b, j) =>
      val truth = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      j >= 0.5 && math.abs(j - truth) < 1e-6 && a < b
    }
  }

  property("planted exact dup is always found by near-dup LSH (J=1 recall)") = forAll(corpusGen) { docs =>
    import spark.implicits._
    val dupId = docs.last._1
    // the planted dup shares doc 0's shingle set exactly → J=1.0, which
    // collides in EVERY band — recall 1.0 regardless of band luck
    val pairs = Dedup.nearDuplicates(toDf(docs))
      .as[(Long, Long, Double)].collect()
    docs.head._2.split("\\s+").length < 3 ||
      pairs.exists(p => p._2 == dupId && p._3 == 1.0)
  }

  property("dedup output invariant under corpus repartitioning") = forAll(corpusGen) { docs =>
    import spark.implicits._
    val a = Dedup.nearDuplicates(toDf(docs)).as[(Long, Long, Double)].collect().toSet
    val b = Dedup.nearDuplicates(toDf(docs).repartition(5)).as[(Long, Long, Double)].collect().toSet
    a == b
  }
}
