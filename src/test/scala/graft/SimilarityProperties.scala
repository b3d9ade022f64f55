package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.Similarity

/** Property invariants for similarity search over generated embeddings. */
object SimilarityProperties extends Properties("Similarity") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)).map(_.toArray)
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3)) // no zero vectors

  private val embGen: Gen[List[(Long, Array[Float], Int)]] = for {
    n <- Gen.choose(3, 12)
    vs <- Gen.listOfN(n, vecGen)
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }

  private def toDf(e: List[(Long, Array[Float], Int)]) = {
    import spark.implicits._
    e.toDF("vec_id", "embedding", "label")
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dot = ad.zip(bd).map(p => p._1 * p._2).sum
    dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  property("brute-force topK matches an independent Scala ranking") = forAll(embGen) { emb =>
    import spark.implicits._
    val k = 3
    val got = Similarity.topK(toDf(emb), 0L, k).as[(Long, Double)].collect().toSeq
    val expected = emb.tail
      .map { case (id, v, _) =>
        (id, BigDecimal(cosine(emb.head._2, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, sim) => (-sim, id) }
      .take(k)
    got == expected
  }

  property("topK(k) is a prefix of topK(k+1)") = forAll(embGen) { emb =>
    import spark.implicits._
    val k2 = Similarity.topK(toDf(emb), 0L, 4).as[(Long, Double)].collect().toSeq
    val k1 = Similarity.topK(toDf(emb), 0L, 3).as[(Long, Double)].collect().toSeq
    k2.startsWith(k1)
  }

  private val dvecGen: Gen[List[Double]] =
    Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, Gen.choose(-10.0, 10.0)))

  property("native dot_f64 is bit-identical to the aggregate/zip_with column form") =
    forAll(dvecGen, dvecGen) { (a0, b0) =>
      import spark.implicits._
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val df = Seq((a, b)).toDF("a", "b")
      // java.lang.Double equality (not ==) so NaN==NaN and -0.0 != 0.0:
      // "bit-identical" is the claim
      val native = df.select(graft.plans.DotF64.dotF64($"a", $"b")).as[Double].head()
      val viaCols = df.select(Similarity.dotViaColumns($"a", $"b")).as[Double].head()
      java.lang.Double.valueOf(native).equals(java.lang.Double.valueOf(viaCols))
    }

  property("ANN neighbors share the query's sign bucket and sim is exact") = forAll(embGen) { emb =>
    import spark.implicits._
    val byId = emb.map(e => e._1 -> e._2).toMap
    def bucket(v: Array[Float]) = v.take(4).map(x => if (x >= 0) '1' else '0').mkString
    val nn = Similarity.annNearestNeighbor(toDf(emb), bits = 4)
      .as[(Long, Long, Double)].collect()
    nn.forall { case (a, b, sim) =>
      bucket(byId(a)) == bucket(byId(b)) &&
        math.abs(sim - BigDecimal(cosine(byId(a), byId(b)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9
    }
  }
}
