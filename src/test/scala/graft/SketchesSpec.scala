package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{InvertedIndex, Sketches}
import graft.sources.Corpus

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("HLL vocabulary estimate is within the declared error of exact") {
    val docs = Corpus.documents(spark, "/root/testdata/sf0.001")
    val rows = Sketches.vocabularyBySource(docs, rsd = 0.05)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.15,
        s"approx=$approx exact=$exact exceeds 3x rsd")
    }
  }

  test("token-count quantiles are ordered and bounded by observed range") {
    val docs = Corpus.documents(spark, "/root/testdata/sf0.001")
    val (p50, p90, p99, n) = Sketches.tokenCountQuantiles(docs)
      .as[(Int, Int, Int, Long)].head()
    assert(n === 500)
    assert(p50 <= p90 && p90 <= p99)
    assert(p50 > 0 && p99 < 1000)
  }

  test("CSV and JSONL corpus loaders feed the same index pipeline") {
    val dir = Files.createTempDirectory("graft_src")
    val csv = dir.resolve("docs.csv")
    Files.writeString(csv,
      "doc_id,text,source\n1,the cat sat,s1\n2,the dog ran,s1\n")
    val jsonl = dir.resolve("docs.jsonl")
    Files.writeString(jsonl,
      """{"doc_id": 1, "text": "the cat sat", "source": "s1"}
        |{"doc_id": 2, "text": "the dog ran", "source": "s1"}
        |""".stripMargin)
    val fromCsv = InvertedIndex.postings(Corpus.documentsFromCsv(spark, csv.toString))
      .as[(String, Long, String)].collect().toSet
    val fromJsonl = InvertedIndex.postings(Corpus.documentsFromJsonl(spark, jsonl.toString))
      .as[(String, Long, String)].collect().toSet
    assert(fromCsv === fromJsonl)
    assert(fromCsv.map(_._1) === Set("cat", "sat", "dog", "ran"))
  }
}
