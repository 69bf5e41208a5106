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

  /** The pre-filter tag set (script/style/link/img/video) as a
    * string-literal match — runs per element of every page's pre-filter
    * traversal (and the retry re-derivation).
    */
  private def isPreFilterTag(t: String): Boolean = t match {
    case "script" | "style" | "link" | "img" | "video" => true
    case _ => false
  }

  /** Page-level robots meta directives (the publicly documented REP
    * `<meta name="robots">` extension): returns (noindex, nofollow).
    * Name matching is case-insensitive, content is a comma-separated
    * token list (tokens trimmed, case-insensitive), `none` is the
    * documented shorthand for both, multiple robots metas union (the
    * most-restrictive-wins practice), and agent-specific metas
    * (`name="somebot"`) are ignored — this engine keys on the generic
    * token only. Must run BEFORE the pre-filter mutates the tree (head
    * tags survive it, but the crawl kernel reads flags off the shared
    * parse like link extraction does).
    */
  def metaRobots(doc: graft.html.HDocument): (Boolean, Boolean) = {
    var ni = false
    var nf = false
    doc.root.foreachElement { e =>
      if (e.tag == "meta") {
        val n = e.attrOrNull("name")
        if (n != null && n.equalsIgnoreCase("robots")) {
          val c = e.attrOrNull("content")
          if (c != null) c.split(',').foreach { tok =>
            tok.trim.toLowerCase match {
              case "noindex"  => ni = true
              case "nofollow" => nf = true
              case "none"     => ni = true; nf = true
              case _          =>
            }
          }
        }
      }
    }
    (ni, nf)
  }

  /** Meta-refresh redirect target (the `<meta http-equiv="refresh">`
    * pattern — an HTML-standard attribute a production crawler must treat
    * as a redirect): the FIRST refresh meta's raw url, or None. Grammar:
    * http-equiv matched case-insensitively; content is `delay; url=TARGET`
    * with optional whitespace around `;`, `url`, `=`; the url key is
    * case-insensitive; the target may be wrapped in single or double
    * quotes; any delay value counts (crawlers follow delayed refreshes
    * too). A refresh with no url clause refreshes in place — not a
    * redirect.
    */
  def metaRefresh(doc: graft.html.HDocument): Option[String] = {
    var found: String = null
    doc.root.foreachElement { e =>
      if (found == null && e.tag == "meta") {
        val he = e.attrOrNull("http-equiv")
        if (he != null && he.equalsIgnoreCase("refresh")) {
          val c = e.attrOrNull("content")
          if (c != null) {
            val semi = c.indexOf(';')
            if (semi >= 0) {
              val rest = c.substring(semi + 1).trim
              if (rest.length >= 4 && rest.substring(0, 3).equalsIgnoreCase("url")) {
                val afterKey = rest.substring(3).trim
                if (afterKey.startsWith("=")) {
                  var t = afterKey.substring(1).trim
                  if (t.length >= 2 &&
                    ((t.head == '\'' && t.last == '\'') ||
                      (t.head == '"' && t.last == '"')))
                    t = t.substring(1, t.length - 1).trim
                  if (t.nonEmpty) found = t
                }
              }
            }
          }
        }
      }
    }
    Option(found)
  }

  /** `<link rel="canonical">` target (the publicly documented canonical
    * link relation, RFC 6596): the FIRST canonical link's raw href, or
    * None. The rel value is matched as a case-insensitive whitespace-
    * separated token list (rel="Canonical alternate" counts), hrefs are
    * taken raw for the caller to resolve. Stylesheet and other link
    * relations are ignored.
    */
  def canonicalOf(doc: graft.html.HDocument): Option[String] = {
    var found: String = null
    doc.root.foreachElement { e =>
      if (found == null && e.tag == "link") {
        val rel = e.attrOrNull("rel")
        if (rel != null &&
          rel.split("\\s+").exists(_.equalsIgnoreCase("canonical"))) {
          val href = e.attrOrNull("href")
          if (href != null && href.trim.nonEmpty) found = href.trim
        }
      }
    }
    Option(found)
  }

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

    // (htmlToProcess, tree-or-null, retry-reparse-or-null): the tree feeds
    // readability's first attempt directly; retries re-parse the string —
    // or, for the accepted pre-filtered tree, RE-DERIVE it (parse raw +
    // removeTags + mergeAdjacentText, which is byte-equivalent to parsing
    // its serialization — the serializer/parser round-trip property pinned
    // by SerializerLengthSpec), so the modified document's full string is
    // never built: its serialized LENGTH alone decides acceptance.
    val chosen: (String, graft.html.HDocument, () => graft.html.HDocument) =
      if (contentSelector.nonEmpty) {
        doc.findFirst(contentSelector) match {
          case Some(sel) => (sel.outerHtml, null, null) // sliced fragment: re-parse
          case None      => (rawHtml, doc, null) // selector miss → full raw, no pre-filter
        }
      } else {
        // one fused traversal instead of five selector passes
        val removed = doc.removeTags(isPreFilterTag _)
        if (removed > 0) doc.mergeAdjacentText() // = serialize→re-parse text adjacency
        if (removed == 0) (rawHtml, doc, null) // doc is still the pristine tree
        else if (rawHtml.length != doc.outerHtmlLength)
          (rawHtml, doc, () => {
            val d2 = HtmlParser.parse(rawHtml)
            val r2 = d2.removeTags(isPreFilterTag _)
            if (r2 > 0) d2.mergeAdjacentText()
            d2
          })
        else (rawHtml, null, null) // mutated but rejected (length tie) → re-parse raw
      }

    val htmlToProcess = chosen._1
    val preparsed = chosen._2
    val (article, resultEl) =
      if (preparsed != null)
        Readability.parseToDom(htmlToProcess, parsedUrl, preparsed,
          needContent = needArticleHtml, reparse = chosen._3)
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
