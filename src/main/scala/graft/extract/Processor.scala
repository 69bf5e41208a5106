package graft.extract

import graft.html.HtmlParser
import graft.url.GoUrl

/** Extracted page record — the reference's PageData
  * (/root/reference/processor.go:15-21).
  */
final case class PageData(
    title: String,
    url: String,
    markdown: String,
    rawHtml: String,
    articleHtml: String)

/** H6 — the processHTML composite (/root/reference/processor.go:23-115):
  *
  *   1. contentSelector != "": slice to `Find(sel).First().OuterHtml`; on
  *      miss or parse failure fall back to the FULL raw HTML (no pre-filter).
  *   2. contentSelector == "": pre-filter by removing script/style/link/img/
  *      video; use the modified HTML only if its serialized length differs
  *      from the raw length AND at least one selector had hits
  *      (processor.go:74-81).
  *   3. readability over the chosen HTML with the page URL.
  *   4. HTML→Markdown (GFM), TrimSpace'd.
  *
  * Pure function — the engine runs it as a typed Dataset map over the html
  * column (BASELINE.json north_star).
  */
object Processor {

  private val preFilterSelectors = Seq("script", "style", "link", "img", "video")

  def processHTML(
      pageUrl: String,
      rawHtml: String,
      contentSelector: String): Either[String, PageData] = {
    val parsedUrl = GoUrl.parse(pageUrl) match {
      case Right(u) => u
      case Left(e)  => return Left(s"failed to parse page URL $pageUrl: $e")
    }

    var htmlToProcess = rawHtml

    if (contentSelector.nonEmpty) {
      val doc = HtmlParser.parse(rawHtml)
      doc.findFirst(contentSelector) match {
        case Some(sel) => htmlToProcess = sel.outerHtml
        case None      => // selector miss → full raw HTML, no pre-filter
      }
    } else {
      val doc = HtmlParser.parse(rawHtml)
      var removedAny = false
      preFilterSelectors.foreach { sel =>
        if (doc.removeAll(sel) > 0) removedAny = true
      }
      val modified = doc.outerHtml
      if (rawHtml.length != modified.length && removedAny)
        htmlToProcess = modified
    }

    val (article, resultEl) = Readability.parseToDom(htmlToProcess, parsedUrl)
    // consume the readability DOM directly — no serialize→re-parse round trip
    val markdown =
      (if (resultEl != null) Markdown.convertElement(resultEl)
       else Markdown.convert(article.content)).trim

    Right(
      PageData(
        title = article.title,
        url = pageUrl,
        markdown = markdown,
        rawHtml = rawHtml,
        articleHtml = article.content))
  }
}
