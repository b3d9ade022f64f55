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

  test("withDenseIds mints gap-free 0..n-1 ids, stable under input partitioning") {
    val rows = ('a' to 'j').map(c => (s"u$c", s"text $c"))
    def load(parts: Int) =
      Corpus.withDenseIds(rows.toDF("url", "text").repartition(parts), orderBy = Seq("url"))
        .as[(Long, String, String)].collect().sortBy(_._1)
    val one = load(1)
    // dense, gap-free, starts at 0
    assert(one.map(_._1).toSeq === (0L until 10L))
    // same (id → url) assignment no matter how the input was partitioned
    assert(load(7).toSeq === one.toSeq)
    assert(load(3).toSeq === one.toSeq)
    // ids follow the natural-key order
    assert(one.map(_._2).toSeq === rows.map(_._1))
  }

  test("withDenseIds without orderBy is still dense and gap-free") {
    val ids = Corpus.withDenseIds(Seq("x", "y", "z", "w").toDF("text").repartition(3))
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq === (0L until 4L))
  }

  test("raw-text ingestion: one doc per file, url = path, ids in url order") {
    val dir = Files.createTempDirectory("graft_txt")
    Seq("b" -> "second file content", "a" -> "first file content", "c" -> "third")
      .foreach { case (n, t) => Files.writeString(dir.resolve(s"$n.txt"), t) }
    val got = Corpus.documentsFromTextFiles(spark, dir.toString)
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(got.map(_._2).toSeq.map(u => u.substring(u.length - 5)) === Seq("a.txt", "b.txt", "c.txt"))
    assert(got(0)._3 === "first file content")
  }

  test("id-less JSONL ingestion: dense ids in line order, malformed lines keep their slot") {
    val f = Files.createTempFile("docs", ".jsonl")
    Files.writeString(f,
      """{"text": "doc zero", "source": "s1"}
        |{"text": "doc one", "source": "s2"}
        |not valid json
        |{"text": "doc three", "source": "s1"}""".stripMargin)
    val got = Corpus.documentsFromJsonlNoIds(spark, f.toString)
      .select("doc_id", "text").as[(Long, Option[String])].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(got(1)._2 === Some("doc one"))
    assert(got(2)._2 === None) // malformed line: id gap preserved, not dropped
    assert(got(3)._2 === Some("doc three"))
  }

  test("S1: crawlCategory follows next-page links with politeness delays, guards cycles") {
    val page1 = """<ul><li><a href="/wiki/A">A</a></li></ul>
                  |<a href="/w/page2">next page</a>""".stripMargin
    val page2 = """<ul><li><a href="/wiki/B">B</a></li></ul>
                  |<a href="/w/page1">next page</a>""".stripMargin // cycle back
    val served = Map(
      "https://ex.org/w/page1" -> page1,
      "https://ex.org/w/page2" -> page2)
    val fetched = scala.collection.mutable.ArrayBuffer[String]()
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val pages = Corpus.crawlCategory(
      url => { fetched += url; served(url) },
      "https://ex.org/w/page1", maxPages = 10, delayMs = 1234L, sleep = sleeps += _)
    assert(pages === Seq(page1, page2)) // cycle stopped the crawl
    assert(fetched.toSeq === Seq("https://ex.org/w/page1", "https://ex.org/w/page2"))
    assert(sleeps.toSeq === Seq(1234L)) // one delay between the two fetches, none after
    // the crawl feeds the standard dense-id corpus builder
    val corpus = Corpus.fromCategoryHtml(spark, pages).as[(Long, String)].collect().toSeq
    assert(corpus === Seq((0L, "/wiki/A"), (1L, "/wiki/B")))
  }

  test("crawlCategory respects maxPages") {
    val page = """<a href="/w/next">next page</a>"""
    var n = 0
    val pages = Corpus.crawlCategory(
      _ => { n += 1; page.replace("/w/next", s"/w/p$n") },
      "https://ex.org/w/p0", maxPages = 3, sleep = _ => ())
    assert(pages.length === 3 && n === 3)
  }

  test("fetcherFactory is config-gated: stub by default") {
    // no egress here — the default factory must be the deterministic stub
    val fetch = Corpus.fetcherFactory(spark)()
    assert(fetch("https://EX.org/x") === "stub content for https://ex.org/x")
  }

  test("fetchText with no explicit factory takes the config-gated transport") {
    val urls = Seq((0L, "uA")).toDF("doc_id", "url")
    val got = Corpus.fetchText(urls).as[(Long, String, String)].head()
    assert(got._3 === "stub content for ua")
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

  test("S3: live HTTP transport end-to-end against a local server — failures keep id gaps") {
    import spark.implicits._
    // test-scoped JDK HttpServer, no new dependency; one good page, one
    // 404, one connection-refused port — the three live failure shapes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handle(path: String, status: Int, body: String): Unit =
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    handle("/doc0", 200, "alpha page body")
    handle("/missing", 404, "not found page must never become text")
    server.start()
    val port = server.getAddress.getPort
    try {
      val urls = Seq(
        (0L, s"http://127.0.0.1:$port/doc0"),
        (1L, s"http://127.0.0.1:$port/missing"),     // HTTP-level failure
        (2L, s"http://127.0.0.1:1/doc2"))            // transport-level failure
        .toDF("doc_id", "url")
      val got = Corpus.fetchText(urls, Corpus.httpFetcherFactory(timeoutMs = 3000L))
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L)) // every id kept, gaps preserved
      assert(got(0)._3 === "alpha page body")
      assert(got(1)._3 === "" && got(2)._3 === "")    // failures -> empty text, not rows lost
    } finally server.stop(0)
  }

  test("S1: live-transport crawl soak — crawlToCorpus over HTTP equals the offline parse") {
    // the whole S1 stack with NOTHING stubbed: a localhost JDK HttpServer
    // serves the category_page.html fixture chain (page 2 = the fixture
    // with its pagination anchor removed, i.e. the last page), the crawl
    // client is the REAL config-gated HttpClient (spark.graft.fetch.live
    // flipped for the duration), pagination follows the fixture's
    // entity-decoded relative href resolved against the live base URL,
    // and the politeness delay fires exactly once between the two pages.
    // Hermetic: 127.0.0.1 only, no egress needed.
    val page1 = fixture("category_page.html")
    val page2 = page1.replaceAll("""<a href="/w/index\.php[^>]*>next page</a>""", "")
    assert(Html.nextPageLink(page2) === None) // the chain really ends at page 2
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, body: String): Unit =
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    serve("/w/category", page1)
    serve("/w/index.php", page2) // matches the ?title=...&pagefrom=Delta next link
    server.start()
    val port = server.getAddress.getPort
    spark.conf.set("spark.graft.fetch.live", "true")
    try {
      val fetch = Corpus.fetcherFactory(spark)() // must be the REAL client under the flag
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val crawled = Corpus.crawlToCorpus(spark, fetch,
          s"http://127.0.0.1:$port/w/category", delayMs = 777L, sleep = sleeps += _)
        .as[(Long, String)].collect().toSeq
      assert(sleeps.toSeq === Seq(777L)) // politeness: one delay between two pages
      // parity with the offline-parsed corpus over the same page HTMLs
      val offline = Corpus.fromCategoryHtml(spark, Seq(page1, page2))
        .as[(Long, String)].collect().toSeq
      assert(crawled === offline)
      assert(crawled.map(_._2) ===
        Seq("/wiki/Alpha_Band", "/wiki/Beta_Singer", "/wiki/Delta_Duo",
            "/wiki/Alpha_Band", "/wiki/Beta_Singer", "/wiki/Delta_Duo"))
    } finally {
      spark.conf.set("spark.graft.fetch.live", "false")
      server.stop(0)
    }
  }

  test("S3: extractText takes the content div, drops table/script/style, joins text") {
    val text = Html.extractText(fixture("article.html"))
    assert(text === "The Alpha Band was a rock & roll group formed in 1976. They released three albums <fast>.")
    assert(!text.contains("nested table"))
    assert(!text.contains("Footer"))
    assert(Html.extractText("<div>no content div</div>") === "")
  }
}
