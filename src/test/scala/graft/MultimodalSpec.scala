package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val bin = Seq(
    (1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2, 3, 4, 5, 6)),
    (2L, "plain text bytes here".getBytes("UTF-8")),
    (3L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 9, 9))
  ).toDF("doc_id", "payload")

  test("withMeta sniffs magic bytes and records size + digest") {
    val m = Multimodal.withMeta(bin, $"payload")
      .select($"doc_id", $"meta.format", $"meta.n_bytes")
      .as[(Long, String, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(1L) === (("jpeg", 10L)))
    assert(m(2L)._1 === "unknown")
    assert(m(3L) === (("png", 6L)))
  }

  test("frameSample yields k fixed-width evenly spaced slices") {
    val frames = bin.filter($"doc_id" === 1L)
      .select(Multimodal.frameSample($"payload", k = 3, frameBytes = 2).as("f"))
      .as[Seq[Array[Byte]]].head()
    assert(frames.length === 3)
    assert(frames.forall(_.length === 2))
    assert(frames.head.toSeq === Seq(0xFF.toByte, 0xD8.toByte)) // start
    assert(frames(2).toSeq === Seq(5.toByte, 6.toByte)) // end
  }

  test("decodeFeaturesStub: fixed dims, deterministic, normalized") {
    val f1 = Multimodal.decodeFeaturesStub(bin).orderBy("doc_id")
      .as[(Long, Seq[Float])].collect()
    val f2 = Multimodal.decodeFeaturesStub(bin.repartition(3)).orderBy("doc_id")
      .as[(Long, Seq[Float])].collect()
    assert(f1.toSeq === f2.toSeq) // partitioning-invariant
    assert(f1.forall(_._2.length === 16))
    assert(math.abs(f1.head._2.sum - 1.0f) < 1e-6) // histogram normalized
  }
}
