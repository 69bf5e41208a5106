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

  private val preFilterTags = Set("script", "style", "link", "img", "video")

  def processHTML(
      pageUrl: String,
      rawHtml: String,
      contentSelector: String): Either[String, PageData] =
    processParsed(pageUrl, rawHtml, HtmlParser.parse(rawHtml), contentSelector)

  /** processHTML over an already-parsed tree of rawHtml — the crawl loop
    * parses each page exactly once and shares the tree with link extraction
    * (which must run first: the pre-filter MUTATES `doc`).
    */
  /** @param needArticleHtml false → PageData.articleHtml is "" and the
    *   article is never re-serialized (the crawl path with
    *   keepArticleHtml=false; title+markdown consume the DOM directly).
    */
  def processParsed(
      pageUrl: String,
      rawHtml: String,
      doc: graft.html.HDocument,
      contentSelector: String,
      needArticleHtml: Boolean = true): Either[String, PageData] = {
    val parsedUrl = GoUrl.parse(pageUrl) match {
      case Right(u) => u
      case Left(e)  => return Left(s"failed to parse page URL $pageUrl: $e")
    }

    // (htmlToProcess, tree-of-it-or-null): the tree feeds readability's first
    // attempt directly; the string remains the retry source, so retry
    // semantics are byte-identical to the serialize→re-parse formulation.
    val chosen: (String, graft.html.HDocument) =
      if (contentSelector.nonEmpty) {
        doc.findFirst(contentSelector) match {
          case Some(sel) => (sel.outerHtml, null) // sliced fragment: re-parse
          case None      => (rawHtml, doc) // selector miss → full raw, no pre-filter
        }
      } else {
        // one fused traversal instead of five selector passes
        val removed = doc.removeTags(preFilterTags)
        if (removed > 0) doc.mergeAdjacentText() // = serialize→re-parse text adjacency
        val modified = doc.outerHtml
        if (rawHtml.length != modified.length && removed > 0) (modified, doc)
        else if (removed == 0) (rawHtml, doc) // doc is still the pristine tree
        else (rawHtml, null) // mutated but rejected (length tie) → re-parse raw
      }

    val htmlToProcess = chosen._1
    val preparsed = chosen._2
    val (article, resultEl) =
      if (preparsed != null)
        Readability.parseToDom(htmlToProcess, parsedUrl, preparsed, needContent = needArticleHtml)
      else Readability.parseToDom(htmlToProcess, parsedUrl, needContent = needArticleHtml)
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
