package graft.sources

import scala.collection.mutable

/** Offline HTML operators mirroring the reference's scraping semantics —
  * pure functions, testable hermetically against checked-in fixtures.
  *
  * - `extractText` reproduces the mapper's content extraction
  *   (`mapper/src/processor.py:135-161`): take `div#mw-content-text`,
  *   drop `table`/`script`/`style` subtrees, whitespace-join the text.
  * - `wikiLinks` reproduces the master's category-page link filter
  *   (`master/src/master.py:63-69`): `<li>`-nested anchors whose href
  *   starts with `/wiki/` and contains no `:` (drops namespace pages).
  * - `nextPageLink` reproduces the pagination step
  *   (`master/src/master.py:71-79`): the anchor whose text is
  *   "next page".
  *
  * Implementation is a small hand-rolled scanner (no HTML lib ships in
  * this environment); it handles well-formed markup, nested divs/tables,
  * and the common entities — the scope the reference's bs4 calls actually
  * exercise.
  */
object Html {

  private val TagRe = "(?s)<[^>]*>".r
  private val EntityMap = Map(
    "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")

  private def decodeEntities(s: String): String =
    EntityMap.foldLeft(s) { case (acc, (k, v)) => acc.replace(k, v) }

  /** The substring spanned by the element that starts at `openIdx`
    * (index of its `<`), tracking nesting of the same tag name. Returns
    * (contentStart, endOfElement) or None if unbalanced.
    */
  private def elementSpan(html: String, openIdx: Int, tag: String): Option[(Int, Int)] = {
    val lower = html.toLowerCase
    val openTok = s"<$tag"
    val closeTok = s"</$tag"
    val contentStart = html.indexOf('>', openIdx)
    if (contentStart < 0) return None
    var depth = 1
    var i = contentStart + 1
    while (depth > 0 && i < html.length) {
      val nextOpen = lower.indexOf(openTok, i)
      val nextClose = lower.indexOf(closeTok, i)
      if (nextClose < 0) return None
      if (nextOpen >= 0 && nextOpen < nextClose) { depth += 1; i = nextOpen + openTok.length }
      else { depth -= 1; i = nextClose + closeTok.length }
    }
    val end = html.indexOf('>', i - 1)
    if (end < 0) None else Some((contentStart + 1, end + 1))
  }

  /** Remove every `<tag>...</tag>` subtree (nesting-aware). */
  private def dropElements(html: String, tag: String): String = {
    val sb = new StringBuilder
    val lower = html.toLowerCase
    var i = 0
    while (i < html.length) {
      val open = lower.indexOf(s"<$tag", i)
      // require the tag name to terminate (e.g. `<table>` or `<table class=`)
      val isTag = open >= 0 && {
        val after = open + tag.length + 1
        after < html.length && !Character.isLetterOrDigit(html.charAt(after))
      }
      if (!isTag) {
        if (open < 0) { sb.append(html.substring(i)); i = html.length }
        else { sb.append(html.substring(i, open + 1)); i = open + 1 }
      } else {
        sb.append(html.substring(i, open))
        elementSpan(html, open, tag) match {
          case Some((_, end)) => i = end
          case None => i = html.length // unbalanced: drop the tail like bs4 would
        }
      }
    }
    sb.toString
  }

  /** Main-content text of a wiki-style page; "" when the content div is
    * absent or the input is malformed (the reference returns "" on any
    * failure — doc_ids keep their gaps).
    */
  def extractText(html: String): String = {
    val lower = html.toLowerCase
    val marker = lower.indexOf("id=\"mw-content-text\"")
    if (marker < 0) return ""
    val open = lower.lastIndexOf("<div", marker)
    if (open < 0) return ""
    elementSpan(html, open, "div") match {
      case None => ""
      case Some((start, end)) =>
        val content = html.substring(start, math.max(start, end - "</div>".length))
        val cleaned = Seq("script", "style", "table")
          .foldLeft(content)((acc, t) => dropElements(acc, t))
        decodeEntities(TagRe.replaceAllIn(cleaned, " "))
          .split("\\s+").filter(_.nonEmpty).mkString(" ")
    }
  }

  private val AnchorRe = """(?is)<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>""".r

  /** Article links from a category listing page, in document order. */
  def wikiLinks(html: String): Seq[String] = {
    val links = mutable.ArrayBuffer[String]()
    for (m <- AnchorRe.findAllMatchIn(html)) {
      val href = decodeEntities(m.group(1))
      // reference filter: li-nested, /wiki/ prefix, no namespace colon
      val before = html.substring(math.max(0, m.start - 120), m.start).toLowerCase
      val inLi = before.lastIndexOf("<li") > before.lastIndexOf("</li>")
      if (inLi && href.startsWith("/wiki/") && !href.contains(":"))
        links += href
    }
    links.toSeq
  }

  /** href of the "next page" pagination anchor, if any. */
  def nextPageLink(html: String): Option[String] =
    AnchorRe.findAllMatchIn(html)
      .find(m => TagRe.replaceAllIn(m.group(2), "").trim.equalsIgnoreCase("next page"))
      .map(m => decodeEntities(m.group(1)))
}
