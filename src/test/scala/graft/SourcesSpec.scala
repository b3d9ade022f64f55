package graft

import java.nio.file.Files
import scala.io.Source
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Corpus, Html}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("S2: fromUrlList parses a JSON array of bare strings with dense positional ids") {
    val f = Files.createTempFile("urls", ".json")
    Files.writeString(f,
      """["https://example.org/wiki/A",
        | "https://example.org/wiki/B",
        | "https://example.org/wiki/C"]""".stripMargin)
    val got = Corpus.fromUrlList(spark, f.toString).as[(Long, String)].collect().toSeq
    assert(got === Seq(
      (0L, "https://example.org/wiki/A"),
      (1L, "https://example.org/wiki/B"),
      (2L, "https://example.org/wiki/C")))
  }

  test("S3: fetchText builds one client per partition and keeps failed rows with empty text") {
    val urls = Seq((0L, "u0"), (1L, "FAIL"), (2L, "u2")).toDF("doc_id", "url").repartition(2)
    val fetched = Corpus.fetchText(urls, () => {
      // a partition-local "client"
      val client = new java.util.concurrent.atomic.AtomicLong()
      url => { client.incrementAndGet(); if (url == "FAIL") sys.error("boom") else s"body of $url" }
    }).as[(Long, String, String)].collect().sortBy(_._1)
    assert(fetched.map(_._1).toSeq === Seq(0L, 1L, 2L)) // no dropped rows
    assert(fetched(1)._3 === "") // failure → empty text, id gap preserved
    assert(fetched(0)._3 === "body of u0")
  }

  test("S1: category link filter keeps li-nested /wiki/ links without colons, in order") {
    val links = Html.wikiLinks(fixture("category_page.html"))
    assert(links === Seq("/wiki/Alpha_Band", "/wiki/Beta_Singer", "/wiki/Delta_Duo"))
  }

  test("S1: pagination anchor is found by its text") {
    assert(Html.nextPageLink(fixture("category_page.html"))
      === Some("/w/index.php?title=Category:Example&pagefrom=Delta"))
    assert(Html.nextPageLink(fixture("article.html")) === None)
  }

  test("S3: extractText takes the content div, drops table/script/style, joins text") {
    val text = Html.extractText(fixture("article.html"))
    assert(text === "The Alpha Band was a rock & roll group formed in 1976. They released three albums <fast>.")
    assert(!text.contains("nested table"))
    assert(!text.contains("Footer"))
    assert(Html.extractText("<div>no content div</div>") === "")
  }
}
