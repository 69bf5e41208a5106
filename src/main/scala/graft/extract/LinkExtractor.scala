package graft.extract

import graft.glob.{CompiledGlob, GlobSet}
import graft.html.HtmlParser
import graft.url.{GoUrl, UrlNorm}

/** H1 — the link generator (SURVEY.md §2.9): parse HTML, iterate `a[href]`
  * in document order, resolve each href against the page URL (F2), normalize
  * (F1), apply the scheme / same-host / follow-match predicates (P2/P3/P5),
  * and first-wins dedup in page order (A2).
  *
  * Parity target: /root/reference/crawler.go:486-546, pinned by the 24 cases
  * of /root/reference/crawler_test.go:507-768.
  *
  * Pure and deterministic — used from `Dataset.flatMap` on executors.
  */
object LinkExtractor {

  /** Extract links exactly as the reference's crawl mode does.
    *
    * @param pageUrlStr  normalized page URL (the frontier row)
    * @param startHost   Hostname() of the crawl's start URL (P3 gate)
    * @param html        raw page HTML
    * @param followGlobs compiled --follow-match patterns (empty → follow all)
    * @return normalized link strings, first-occurrence order
    */
  def extract(
      pageUrlStr: String,
      startHost: String,
      html: String,
      followGlobs: Seq[CompiledGlob],
      allHosts: Boolean = false): Vector[String] = {
    val doc =
      try HtmlParser.parse(html)
      catch { case _: Throwable => return Vector.empty }
    extractFromDoc(pageUrlStr, startHost, doc, followGlobs, allHosts)
  }

  /** Same, over an already-parsed document (the crawl loop parses each page
    * once and shares the tree between link extraction and content
    * extraction). Must run BEFORE any mutating extraction step.
    */
  /** @param allHosts multi-host (Common-Crawl-shaped) frontier mode: drop
    *   the P3 same-host gate, keep the scheme + follow-match predicates.
    *   The reference is strictly same-host (crawler.go:516-518); this is a
    *   north-rule scale extension, oracle-checked against the corpus
    *   `xlinks` ground truth.
    */
  def extractFromDoc(
      pageUrlStr: String,
      startHost: String,
      doc: graft.html.HDocument,
      followGlobs: Seq[CompiledGlob],
      allHosts: Boolean = false): Vector[String] = {
    GoUrl.parse(pageUrlStr) match {
      case Left(_) => Vector.empty
      case Right(pageUrl) =>
        val seen = scala.collection.mutable.HashSet[String]()
        val out = Vector.newBuilder[String]
        // a[href] in document order — direct pre-order walk, no selector engine
        doc.root.foreachElement { a =>
          val href = if (a.tag == "a") a.attrOrNull("href") else null
          if (href != null) {
            val norm = acceptedOrNull(pageUrl, href, startHost, followGlobs, allHosts)
            if (norm != null && !seen.contains(norm)) {
              seen += norm
              out += norm
            }
          }
        }
        out.result()
    }
  }

  /** H1 variant that also captures the FIRST-anchor text per kept link —
    * the anchor-text signal every web-search / host-graph stack indexes
    * (the dst page is described by what its in-links call it). Same
    * predicates, same first-wins order; text is the anchor element's
    * descendant text with whitespace runs collapsed and trimmed. Kept
    * separate from [[extractFromDoc]] so the BFS hot path pays nothing.
    */
  def extractWithText(
      pageUrlStr: String,
      startHost: String,
      html: String,
      followGlobs: Seq[CompiledGlob],
      allHosts: Boolean = false): Vector[(String, String)] = {
    val doc =
      try HtmlParser.parse(html)
      catch { case _: Throwable => return Vector.empty }
    GoUrl.parse(pageUrlStr) match {
      case Left(_) => Vector.empty
      case Right(pageUrl) =>
        val seen = scala.collection.mutable.HashSet[String]()
        val out = Vector.newBuilder[(String, String)]
        doc.root.foreachElement { a =>
          val href = if (a.tag == "a") a.attrOrNull("href") else null
          if (href != null) {
            val norm = acceptedOrNull(pageUrl, href, startHost, followGlobs, allHosts)
            if (norm != null && !seen.contains(norm)) {
              seen += norm
              out += ((norm, collapseWs(a.text)))
            }
          }
        }
        out.result()
    }
  }

  /** Resolve + normalize one href and run the P2/P3/P5 predicate chain;
    * null when the link is dropped. Predicates run on the parsed normal
    * form directly — no serialize→reparse round trip per href (FuzzSpec
    * pins parse(toUrlString(u)) ≡ u on the adversarial grid); the string
    * is only built for links that pass.
    */
  /** Resolve + normalize ONE raw link target against its page url with the
    * standard scheme / same-host predicates (no follow-globs) — the
    * redirect follower runs a meta-refresh target through exactly the
    * pipeline an anchor href gets.
    */
  def resolveAccepted(
      pageUrlStr: String,
      href: String,
      startHost: String,
      allHosts: Boolean): Option[String] =
    GoUrl.parse(pageUrlStr) match {
      case Left(_)   => None
      case Right(pu) => Option(acceptedOrNull(pu, href, startHost, Nil, allHosts))
    }

  private def acceptedOrNull(
      pageUrl: GoUrl,
      href: String,
      startHost: String,
      followGlobs: Seq[CompiledGlob],
      allHosts: Boolean): String =
    pageUrl.parseRef(href) match {
      case Left(_) => null // unparseable href → skipped (crawler.go:503)
      case Right(abs) =>
        UrlNorm.normalizeResolved(abs) match {
          case Left(_) => null // normalize error → skipped (crawler.go:509)
          case Right(resolved) =>
            val ok =
              (resolved.scheme == "http" || resolved.scheme == "https") &&
                (allHosts || resolved.hostname == startHost) &&
                GlobSet.shouldFollow(followGlobs, resolved.path)
            if (ok) resolved.toUrlString else null
        }
    }

  /** Trim + collapse internal whitespace runs to single spaces. */
  def collapseWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.nonEmpty) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
