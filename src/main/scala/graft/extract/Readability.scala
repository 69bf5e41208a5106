package graft.extract

import graft.html._
import graft.url.GoUrl
import scala.collection.mutable
import scala.util.matching.Regex

/** Readability-style main-content extraction (H4 in SURVEY.md §2.9).
  *
  * A from-scratch Scala implementation of the Mozilla Readability.js
  * algorithm as used via go-shiori/go-readability in the reference
  * (/root/reference/processor.go:86-95): candidate scoring (comma count +
  * text length), ancestor score propagation, class weighting, link-density
  * scaling, top-candidate + sibling assembly, conditional cleaning, H1→H2
  * conversion, and relative-URI fixups against the page URL. Behavior is
  * pinned by the reference's own assertions (processor_test.go:8-225) and by
  * golden fixtures in src/test/resources/golden/.
  */
final case class Article(title: String, byline: String, content: String, textContent: String)

object Readability {

  private val rxUnlikelyCandidates: Regex =
    ("(?i)-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|disqus|extra|footer|gdpr|header|" +
      "legends|menu|related|remark|replies|rss|shoutbox|sidebar|skyscraper|social|sponsor|supplemental|" +
      "ad-break|agegate|pagination|pager|popup|yom-remote").r
  private val rxOkMaybeCandidate: Regex =
    "(?i)and|article|body|column|content|main|mathjax|shadow".r
  private val rxPositive: Regex =
    "(?i)article|body|content|entry|hentry|h-entry|main|page|pagination|post|text|blog|story".r
  private val rxNegative: Regex =
    ("(?i)-ad-|hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|contact|footer|gdpr|masthead|media|" +
      "meta|outbrain|promo|related|scroll|share|shoutbox|sidebar|skyscraper|sponsor|shopping|tags|widget").r
  private val rxShare: Regex = "(?i)(\\b|_)(share|sharedaddy)(\\b|_)".r
  private val rxTitleSeparator: Regex = " [\\|\\-\\\\/>»] ".r
  private val rxTitleHierarchySep: Regex = " [\\\\/>»] ".r
  private val rxByline: Regex = "(?i)byline|author|dateline|writtenby|p-author".r

  // membership tests are string-literal matches (hashCode lookupswitch + one
  // equals) — these run per element in the grab walk and sibling assembly;
  // behavior stays pinned by the byte-exact goldens + real-world specs
  private def isDefaultTagToScore(t: String): Boolean = t match {
    case "section" | "h2" | "h3" | "h4" | "h5" | "h6" | "p" | "td" | "pre" => true
    case _ => false
  }
  private def isDivToPElem(t: String): Boolean = t match {
    case "blockquote" | "dl" | "div" | "img" | "ol" | "p" | "pre" | "table" | "ul" => true
    case _ => false
  }
  private def isPhrasingElem(t: String): Boolean = t match {
    case "abbr" | "audio" | "b" | "bdo" | "br" | "button" | "cite" | "code" |
        "data" | "datalist" | "dfn" | "em" | "embed" | "i" | "img" | "input" |
        "kbd" | "label" | "mark" | "math" | "meter" | "noscript" | "object" |
        "output" | "progress" | "q" | "ruby" | "samp" | "script" | "select" |
        "small" | "span" | "strong" | "sub" | "sup" | "textarea" | "time" |
        "var" | "wbr" => true
    case _ => false
  }
  private def isAlterToDivException(t: String): Boolean = t match {
    case "div" | "article" | "section" | "p" | "ol" | "ul" => true
    case _ => false
  }

  private val CharThreshold = 500

  // flag bits for the retry loop
  private val FlagStripUnlikelys = 1
  private val FlagWeightClasses = 2
  private val FlagCleanConditionally = 4

  def parse(rawHtml: String, pageUrl: GoUrl): Article =
    parseToDom(rawHtml, pageUrl)._1

  /** Like [[parse]] but also returns the result content element so callers
    * (Markdown conversion) can consume the DOM without a serialize→re-parse
    * round trip.
    */
  /** @param preparsed optional already-parsed tree OF rawHtml — used for the
    *                   first (read-only-until-grab) attempt so the caller's
    *                   parse is not repeated; retries still re-parse rawHtml.
    */
  /** @param needContent serialize Article.content / walk Article.textContent
    *                     — skipped (both "") when the caller consumes only
    *                     the DOM + title (the crawl path with
    *                     keepArticleHtml=false): one full article serialize
    *                     and one text walk per page saved.
    */
  /** @param reparse optional factory for the retry attempts' fresh tree —
    *                  must produce a tree ≡ HtmlParser.parse(rawHtml). The
    *                  crawl path passes a re-derivation of the pre-filtered
    *                  tree (parse raw + removeTags + mergeAdjacentText) so
    *                  the pre-filtered document never needs serializing at
    *                  all; null ⇒ parse rawHtml (unchanged behavior).
    */
  def parseToDom(rawHtml: String, pageUrl: GoUrl,
      preparsed: HDocument = null, needContent: Boolean = true,
      reparse: () => HDocument = null): (Article, HElement) = {
    // metadata title is read from the pristine document — metas and the
    // first <title> collected in ONE walk (was two-three full find() walks)
    val metaDoc = if (preparsed != null) preparsed else HtmlParser.parse(rawHtml)
    val metasB = Vector.newBuilder[HElement]
    var titleEl: HElement = null
    metaDoc.root.foreachElement { e =>
      if (e.tag == "meta") metasB += e
      else if (titleEl == null && e.tag == "title") titleEl = e
    }
    val metaTitle = getArticleMetadataTitle(metasB.result())
    val articleTitle =
      if (metaTitle.nonEmpty) metaTitle else getArticleTitle(metaDoc, titleEl)

    var flags = FlagStripUnlikelys | FlagWeightClasses | FlagCleanConditionally
    val attempts = mutable.ArrayBuffer[(HElement, Int)]()
    var result: HElement = null
    var done = false
    var firstAttempt = true
    // Readability.js keeps _articleByline across grab attempts: only the
    // FIRST matching byline node is ever captured+removed
    val byline = new BylineState
    while (!done) {
      // the first attempt reuses the (read-only-so-far) metadata tree; later
      // attempts re-parse because grabArticle mutates the document
      val doc =
        if (firstAttempt) metaDoc
        else if (reparse != null) reparse()
        else HtmlParser.parse(rawHtml)
      firstAttempt = false
      prepDocument(doc)
      val content = grabArticle(doc, flags, articleTitle, byline)
      val textLen = content.map(normTextLen).getOrElse(0)
      if (content.isDefined && textLen >= CharThreshold) {
        result = content.get
        done = true
      } else {
        content.foreach(c => attempts += ((c, textLen)))
        if ((flags & FlagStripUnlikelys) != 0) flags &= ~FlagStripUnlikelys
        else if ((flags & FlagWeightClasses) != 0) flags &= ~FlagWeightClasses
        else if ((flags & FlagCleanConditionally) != 0) flags &= ~FlagCleanConditionally
        else {
          // keep the longest attempt (may be empty)
          if (attempts.nonEmpty) {
            val best = attempts.maxBy(_._2)
            result = best._1
          }
          done = true
        }
      }
    }

    if (result == null) return (Article(articleTitle, byline.text, "", ""), null)

    postProcess(result, pageUrl)
    (Article(
      title = articleTitle,
      byline = byline.text,
      content = if (needContent) result.innerHtml else "",
      textContent = if (needContent) result.text else ""), result)
  }

  // ---- title ----

  private def wordCount(s: String): Int = s.split("\\s+").count(_.nonEmpty)

  private def getArticleMetadataTitle(metas: Vector[HElement]): String = {
    def metaVal(keys: Set[String]): Option[String] =
      metas.iterator.flatMap { m =>
        val key = m.attr("property").orElse(m.attr("name")).getOrElse("").toLowerCase.trim
        if (keys.contains(key)) m.attr("content").map(_.trim).filter(_.nonEmpty) else None
      }.nextOption()
    metaVal(Set("og:title", "twitter:title", "dc:title", "dcterm:title", "weibo:article:title",
      "weibo:webpage:title", "title")).getOrElse("")
  }

  private[extract] def getArticleTitle(doc: HDocument): String =
    getArticleTitle(doc, doc.findFirst("title").orNull)

  private def getArticleTitle(doc: HDocument, titleEl: HElement): String = {
    val origTitle = if (titleEl == null) "" else normSpace(titleEl.text)
    var curTitle = origTitle
    var titleHadHierarchicalSeparators = false

    if (rxTitleSeparator.findFirstIn(curTitle).isDefined) {
      titleHadHierarchicalSeparators = rxTitleHierarchySep.findFirstIn(curTitle).isDefined
      // remove the final part
      curTitle = origTitle.replaceAll("(.*)[\\|\\-\\\\/>»] .*", "$1")
      if (wordCount(curTitle) < 3)
        curTitle = origTitle.replaceAll("[^\\|\\-\\\\/>»]*[\\|\\-\\\\/>»](.*)", "$1")
    } else if (curTitle.contains(": ")) {
      val headings = doc.find("h1") ++ doc.find("h2")
      val trimmed = curTitle.trim
      val matchFound = headings.exists(h => h.text.trim == trimmed)
      if (!matchFound) {
        curTitle = origTitle.substring(origTitle.lastIndexOf(':') + 1)
        if (wordCount(curTitle) < 3) {
          curTitle = origTitle.substring(origTitle.indexOf(':') + 1)
          if (wordCount(origTitle.substring(0, origTitle.indexOf(':'))) > 5)
            curTitle = origTitle
        }
      }
    } else if (curTitle.length > 150 || curTitle.length < 15) {
      val hOnes = doc.find("h1")
      if (hOnes.size == 1) curTitle = normSpace(hOnes.head.text)
    }

    curTitle = normSpace(curTitle.trim)
    val curCount = wordCount(curTitle)
    if (curCount <= 4 && (!titleHadHierarchicalSeparators ||
      curCount != wordCount(origTitle.replaceAll("[\\|\\-\\\\/>»]+", "")) - 1)) {
      curTitle = origTitle
    }
    curTitle
  }

  // ---- prep ----

  private def isScriptNoscriptStyle(t: String): Boolean =
    t == "script" || t == "noscript" || t == "style"

  private def prepDocument(doc: HDocument): Unit = {
    // Readability.js order: _unwrapNoscriptImages runs BEFORE _removeScripts
    // (which also drops noscript), so a lazy-load <img><noscript><img></noscript>
    // pair resolves to the noscript's (full-quality) image
    unwrapNoscriptImages(doc)
    // one traversal ≡ sequential removeAll("script"/"noscript"/"style")
    // (disjoint tag sets; nested hits detach with their ancestors either way
    // — the removeTags equivalence documented in Dom)
    doc.removeTags(isScriptNoscriptStyle _): Unit
    replaceBrs(doc)
    doc.find("font").foreach(_.replaceWithTag("span"))
  }

  private val rxImgExt = "(?i)\\.(jpg|jpeg|png|webp)".r

  /** Readability.js `_isSingleImage`: an img, or an element whose only
    * element child is (recursively) a single image, with no non-whitespace
    * text.
    */
  private def isSingleImage(e: HElement): Boolean = {
    if (e.tag == "img") return true
    val elems = e.children.collect { case c: HElement => c }
    elems.size == 1 && isSingleImage(elems.head) &&
      !e.children.exists {
        case t: HText => t.data.exists(!_.isWhitespace)
        case _        => false
      }
  }

  private def prevElementSibling(n: HNode): Option[HElement] = {
    val p = n.parent
    if (p == null) return None
    val i = p.indexOfChild(n)
    var j = i - 1
    while (j >= 0) {
      p.children(j) match {
        case e: HElement => return Some(e)
        case _           => j -= 1
      }
    }
    None
  }

  /** Readability.js `_unwrapNoscriptImages` (go-readability
    * unwrapNoscriptImages): first drop img elements carrying no image-ish
    * source at all, then for each noscript whose (re-parsed raw-text)
    * content is a single image preceded by a single-image sibling, replace
    * that sibling with the noscript's content — the lazy-loading pattern
    * where the noscript holds the real image. Attribute merge: the
    * previous image's src/srcset/image-valued attrs are copied onto the
    * new image, renamed `data-old-*` on conflict.
    */
  private def unwrapNoscriptImages(doc: HDocument): Unit = {
    // collect imgs and noscripts in ONE document-order walk (two full find()
    // walks otherwise; both loops below mutate, so snapshots are required
    // anyway)
    val imgs = Vector.newBuilder[HElement]
    val noscripts = Vector.newBuilder[HElement]
    if (doc.root.tag == "img") imgs += doc.root
    else if (doc.root.tag == "noscript") noscripts += doc.root
    doc.root.foreachElement { e =>
      if (e.tag == "img") imgs += e
      else if (e.tag == "noscript") noscripts += e
    }
    imgs.result().foreach { img =>
      val as = img.attrsOrNull
      val keep = as != null && as.exists { case (k, v) =>
        k == "src" || k == "srcset" || k == "data-src" || k == "data-srcset" ||
          rxImgExt.findFirstIn(v).isDefined
      }
      if (!keep) img.remove()
    }
    noscripts.result().foreach { ns =>
      // noscript content is a raw-text node (scripting-enabled parse, like
      // x/net/html); parse it the way the reference re-parses the string
      val tmp = HtmlParser.parse(ns.text)
      tmp.body.foreach { tmpBody =>
        val elems = tmpBody.children.collect { case c: HElement => c }
        val singleImg = elems.size == 1 && isSingleImage(elems.head) &&
          !tmpBody.children.exists {
            case t: HText => t.data.exists(!_.isWhitespace)
            case _        => false
          }
        if (singleImg) {
          prevElementSibling(ns).filter(isSingleImage).foreach { prevEl =>
            val prevImg =
              if (prevEl.tag == "img") prevEl else prevEl.find("img").head
            val newImg = if (elems.head.tag == "img") elems.head
              else elems.head.find("img").head
            val prevAttrs = prevImg.attrsOrNull
            (if (prevAttrs == null) Vector.empty else prevAttrs.toVector).foreach { case (name, value) =>
              if (value.nonEmpty &&
                (name == "src" || name == "srcset" ||
                  rxImgExt.findFirstIn(value).isDefined)) {
                if (!newImg.attr(name).contains(value)) {
                  val attrName =
                    if (newImg.attr(name).isDefined) "data-old-" + name else name
                  newImg.setAttr(attrName, value)
                }
              }
            }
            // replaceChild(tmp.firstElementChild, prevElement)
            val parent = ns.parent
            if (parent != null) {
              val i = parent.indexOfChild(prevEl)
              val replacement = elems.head
              replacement.parent = parent
              parent.children(i) = replacement
              prevEl.parent = null
            }
          }
        }
      }
    }
  }

  /** Chains of 2+ <br> become paragraph breaks: following phrasing content
    * is wrapped into a new <p> (Readability.js _replaceBrs).
    */
  private def replaceBrs(doc: HDocument): Unit = {
    doc.find("br").foreach { br =>
      if (br.parent != null) {
        var next = nextSibling(br)
        var replaced = false
        // drop consecutive brs (allow whitespace between)
        var continue = true
        while (continue) {
          next match {
            case Some(e: HElement) if e.tag == "br" =>
              replaced = true
              val n = nextSibling(e)
              e.remove()
              next = n
            case Some(t: HText) if t.data.forall(_.isWhitespace) =>
              next = nextSibling(t)
            case _ => continue = false
          }
        }
        if (replaced) {
          val parent = br.parent
          val p = new HElement("p")
          val idx = parent.indexOfChild(br)
          parent.children(idx) = p
          p.parent = parent
          br.parent = null
          // move subsequent phrasing siblings into p until a block break
          var i = idx + 1
          var moving = true
          while (moving && i < parent.children.length) {
            parent.children(i) match {
              case e: HElement if e.tag == "br" => moving = false
              case e: HElement if !isPhrasing(e) => moving = false
              case n =>
                parent.children.remove(i)
                n.parent = null
                p.appendChild(n)
            }
          }
        }
      }
    }
  }

  private def isPhrasing(e: HElement): Boolean =
    isPhrasingElem(e.tag) ||
      ((e.tag == "a" || e.tag == "del" || e.tag == "ins") &&
        e.children.forall {
          case c: HElement => isPhrasing(c)
          case _           => true
        })

  private def nextSibling(n: HNode): Option[HNode] = {
    val p = n.parent
    if (p == null) None
    else {
      val i = p.indexOfChild(n)
      if (i >= 0 && i + 1 < p.children.length) Some(p.children(i + 1)) else None
    }
  }

  // ---- scoring helpers ----

  /** Exactly `"\\s+".r.replaceAllIn(s, " ").trim` without the regex: Java's
    * `\s` is the ASCII set [[isJavaWs]], and the final `.trim` (which also
    * strips non-\s control chars ≤ 0x20 at the ends) is kept verbatim. The
    * fast path — no \s char that needs rewriting — costs one scan and no
    * allocation; this runs on every candidate's text during scoring.
    */
  private def normSpace(s: String): String = {
    val n = s.length
    var i = 0
    var prevWs = false
    var needsCollapse = false
    while (i < n && !needsCollapse) {
      val c = s.charAt(i)
      val ws = isJavaWs(c)
      if (ws && (prevWs || c != ' ')) needsCollapse = true
      prevWs = ws
      i += 1
    }
    if (!needsCollapse) return s.trim
    val sb = new java.lang.StringBuilder(n)
    i = 0
    prevWs = false
    while (i < n) {
      val c = s.charAt(i)
      if (isJavaWs(c)) prevWs = true
      else {
        if (prevWs && sb.length > 0) sb.append(' ')
        sb.append(c)
        prevWs = false
      }
      i += 1
    }
    sb.toString.trim
  }

  private[extract] def innerTextNorm(e: HElement): String = normSpace(e.text)

  /** Packed exact (length, comma-split value) of `innerTextNorm(e)` in one
    * allocation-free walk — the scoring and conditional-clean gates consume
    * ONLY these two numbers, so the normalized string itself never needs
    * building. Upper 32 bits: `innerTextNorm(e).length`; lower 32 bits:
    * `innerTextNorm(e).split(",").length - 1` plus one (so the -1 case packs
    * unsigned).
    *
    * Exactness notes (pinned by NormLenCommasSpec against the string
    * formulation over adversarial control-char/comma/whitespace trees and
    * generated corpus pages):
    *  - normSpace collapses \s+ runs to one space and then String.trim's the
    *    result; trim also strips non-\s control chars ≤ 0x20 at BOTH ends
    *    (cascading through collapse-emitted spaces), so the walk tracks the
    *    strippable prefix/suffix of the emitted sequence explicitly.
    *  - Java split with limit 0 discards trailing empty segments: the value
    *    is (commas before the trailing comma run), 0 for the empty string,
    *    and -1 when the trimmed text is entirely commas. Commas are > 0x20
    *    and never trimmed; the trailing-run tracker restarts after any
    *    strippable gap so it ends exactly at the trimmed string's tail.
    */
  // explicit state (see TextLenState note): one allocation instead of eight
  // boxed captured Refs, plain field accesses on the per-char path
  private final class NlcState {
    var cnt = 0 // emitted (collapsed, pre-trim) length
    var prefixStrip = 0 // maximal emitted prefix of chars ≤ 0x20
    var allStrip = true // every emitted char so far ≤ 0x20
    var tailStrip = 0 // current trailing run of emitted chars ≤ 0x20
    var commas = 0 // commas emitted (never trimmed)
    var commaRun = 0 // comma run ending at the last solid (> 0x20) char
    var pendingSpace = false
    var started = false
  }

  private def nlcWalk(el: HElement, st: NlcState): Unit = {
    var j = 0
    val cs = el.children
    while (j < cs.length) {
      cs(j) match {
        case t: HText =>
          val s = t.data
          var i = 0
          while (i < s.length) {
            val c = s.charAt(i)
            if (isJavaWs(c)) { if (st.started) st.pendingSpace = true }
            else {
              if (st.pendingSpace) {
                // emit(' '): always strippable — and still part of the
                // strippable PREFIX when everything emitted so far was
                // strippable content (e.g. a leading  before the ws run)
                st.cnt += 1
                if (st.allStrip) st.prefixStrip += 1
                st.tailStrip += 1
                st.pendingSpace = false
              }
              // emit(c): c is non-\s but may still be ≤ 0x20 (trim's strip set)
              st.cnt += 1
              if (c <= ' ') {
                if (st.allStrip) st.prefixStrip += 1
                st.tailStrip += 1
              } else {
                st.allStrip = false
                if (c == ',') {
                  st.commas += 1
                  st.commaRun = if (st.tailStrip > 0) 1 else st.commaRun + 1
                } else st.commaRun = 0
                st.tailStrip = 0
              }
              st.started = true
            }
            i += 1
          }
        case c: HElement => nlcWalk(c, st)
        case _           =>
      }
      j += 1
    }
  }

  private[extract] def normLenCommas(e: HElement): Long = {
    val st = new NlcState
    nlcWalk(e, st)
    val len = if (st.allStrip) 0 else st.cnt - st.prefixStrip - st.tailStrip
    val value =
      if (len == 0) 0
      else if (st.commaRun == len) -1
      else st.commas - st.commaRun
    (len.toLong << 32) | ((value + 1).toLong & 0xffffffffL)
  }

  @inline private[extract] def packedLen(packed: Long): Int = (packed >>> 32).toInt
  @inline private[extract] def packedCommaSegs(packed: Long): Int =
    (packed & 0xffffffffL).toInt - 1

  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Length of innerTextNorm(e) computed in one allocation-free walk —
    * exactly `normSpace(e.text).length` (collapse \s+ runs to one space,
    * trim ends). The length-only call sites (link density, emptiness and
    * size gates) dominate readability's cost on large candidates; building
    * the full normalized string for them is O(subtree) garbage per call.
    */
  // explicit state object: a nested-def walk capturing mutable locals makes
  // scalac box every captured var into a runtime Ref with a field hop per
  // char — one small state allocation per call replaces three Refs and keeps
  // the per-char path on plain field accesses
  private final class TextLenState {
    var cnt = 0
    var pendingSpace = false
    var started = false
  }

  private def normTextLenWalk(el: HElement, st: TextLenState): Unit = {
    var j = 0
    val cs = el.children
    while (j < cs.length) {
      cs(j) match {
        case t: HText =>
          val s = t.data
          var i = 0
          while (i < s.length) {
            val c = s.charAt(i)
            if (isJavaWs(c)) { if (st.started) st.pendingSpace = true }
            else {
              if (st.pendingSpace) { st.cnt += 1; st.pendingSpace = false }
              st.cnt += 1
              st.started = true
            }
            i += 1
          }
        case c: HElement => normTextLenWalk(c, st)
        case _           =>
      }
      j += 1
    }
  }

  private[extract] def normTextLen(e: HElement): Int = {
    val st = new TextLenState
    normTextLenWalk(e, st)
    st.cnt
  }

  /** class + " " + id without Option allocations (runs per element in the
    * walk and share scans; both attrs absent — the common case — returns a
    * shared literal).
    */
  @inline private def classIdString(e: HElement): String = {
    val cn = e.attrOrNull("class")
    val id = e.attrOrNull("id")
    if (cn == null) { if (id == null) " " else " " + id }
    else if (id == null) cn + " "
    else cn + " " + id
  }

  /** True iff `normTextLen(e) >= n` — walks only until the count is
    * reached (the scoring gate and the empty-paragraph check need a
    * threshold, not the exact subtree length; most elements decide within
    * their first text node).
    */
  private def normTextLenAtLeast(e: HElement, n: Int): Boolean = {
    if (n <= 0) return true
    val st = new TextLenState
    normTextLenAtLeastWalk(e, n, st)
  }

  private def normTextLenAtLeastWalk(el: HElement, n: Int, st: TextLenState): Boolean = {
    var j = 0
    val cs = el.children
    while (j < cs.length) {
      cs(j) match {
        case t: HText =>
          val s = t.data
          var i = 0
          while (i < s.length) {
            val c = s.charAt(i)
            if (isJavaWs(c)) { if (st.started) st.pendingSpace = true }
            else {
              if (st.pendingSpace) { st.cnt += 1; st.pendingSpace = false }
              st.cnt += 1
              st.started = true
              if (st.cnt >= n) return true
            }
            i += 1
          }
        case c: HElement => if (normTextLenAtLeastWalk(c, n, st)) return true
        case _           =>
      }
      j += 1
    }
    false
  }

  private def classWeight(e: HElement, flags: Int): Double = {
    if ((flags & FlagWeightClasses) == 0) return 0
    var weight = 0.0
    val cls = e.attrOrNull("class")
    if (cls != null && cls.nonEmpty) {
      if (rxNegative.findFirstIn(cls).isDefined) weight -= 25
      if (rxPositive.findFirstIn(cls).isDefined) weight += 25
    }
    val id = e.attrOrNull("id")
    if (id != null && id.nonEmpty) {
      if (rxNegative.findFirstIn(id).isDefined) weight -= 25
      if (rxPositive.findFirstIn(id).isDefined) weight += 25
    }
    weight
  }

  private def initialScore(e: HElement, flags: Int): Double = {
    val base = e.tag match {
      case "div"                                            => 5.0
      case "pre" | "td" | "blockquote"                      => 3.0
      case "address" | "ol" | "ul" | "dl" | "dd" | "dt" | "li" | "form" => -3.0
      case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" | "th"   => -5.0
      case _                                                => 0.0
    }
    base + classWeight(e, flags)
  }

  /** State for the fused linkDensity walk: the outer standalone
    * normalization count for `e` plus a stack of standalone counts for every
    * OPEN `a` (each `a`'s count must equal normTextLen(a) computed on its
    * own — fresh collapse state at entry — exactly as the per-a walks it
    * replaces). Contributions are summed in a-ENTRY order at the end so the
    * floating-point accumulation order matches the old pre-order
    * foreachElement formulation bit for bit.
    */
  private final class LdState {
    var cnt = 0
    var pendingSpace = false
    var started = false
    var aDepth = 0
    var nA = 0
    var aCnt = new Array[Int](4)
    var aPending = new Array[Boolean](4)
    var aStarted = new Array[Boolean](4)
    var aCoeff = new Array[Double](4)
    var aSlot = new Array[Int](4)
    var contrib = new Array[Double](8)
    def pushA(coeff: Double): Unit = {
      if (aDepth == aCnt.length) {
        aCnt = java.util.Arrays.copyOf(aCnt, aDepth * 2)
        aPending = java.util.Arrays.copyOf(aPending, aDepth * 2)
        aStarted = java.util.Arrays.copyOf(aStarted, aDepth * 2)
        aCoeff = java.util.Arrays.copyOf(aCoeff, aDepth * 2)
        aSlot = java.util.Arrays.copyOf(aSlot, aDepth * 2)
      }
      if (nA == contrib.length) contrib = java.util.Arrays.copyOf(contrib, nA * 2)
      aCnt(aDepth) = 0
      aPending(aDepth) = false
      aStarted(aDepth) = false
      aCoeff(aDepth) = coeff
      aSlot(aDepth) = nA
      nA += 1
      aDepth += 1
    }
    def popA(): Unit = {
      aDepth -= 1
      contrib(aSlot(aDepth)) = aCnt(aDepth) * aCoeff(aDepth)
    }
    def linkLen: Double = {
      var sum = 0.0
      var k = 0
      while (k < nA) { sum += contrib(k); k += 1 }
      sum
    }
  }

  private def ldWalk(el: HElement, st: LdState): Unit = {
    var j = 0
    val cs = el.children
    while (j < cs.length) {
      cs(j) match {
        case t: HText =>
          val s = t.data
          var i = 0
          while (i < s.length) {
            val c = s.charAt(i)
            if (isJavaWs(c)) {
              if (st.started) st.pendingSpace = true
              var k = 0
              while (k < st.aDepth) {
                if (st.aStarted(k)) st.aPending(k) = true
                k += 1
              }
            } else {
              if (st.pendingSpace) { st.cnt += 1; st.pendingSpace = false }
              st.cnt += 1
              st.started = true
              var k = 0
              while (k < st.aDepth) {
                if (st.aPending(k)) { st.aCnt(k) += 1; st.aPending(k) = false }
                st.aCnt(k) += 1
                st.aStarted(k) = true
                k += 1
              }
            }
            i += 1
          }
        case c: HElement =>
          if (c.tag == "a") {
            val href = c.attrOrNull("href")
            st.pushA(if (href != null && href.startsWith("#")) 0.3 else 1.0)
            ldWalk(c, st)
            st.popA()
          } else ldWalk(c, st)
        case _ =>
      }
      j += 1
    }
  }

  /** True iff the subtree holds an `a` element (tag-only early-exit scan —
    * much cheaper than any char-level walk).
    */
  private def hasDescendantA(e: HElement): Boolean = {
    var i = 0
    val cs = e.children
    while (i < cs.length) {
      cs(i) match {
        case c: HElement => if (c.tag == "a" || hasDescendantA(c)) return true
        case _           =>
      }
      i += 1
    }
    false
  }

  /** linkLen/textLen over normalized standalone counts. Two exact
    * accelerations of the previous (normTextLen(e) + per-a normTextLen)
    * formulation, which dominated kernel CPU via repeated char-level
    * subtree walks per candidate:
    *  - link-free fast path: no `a` in the subtree ⇒ every per-a term is
    *    absent and the result is 0 regardless of textLen (0/n and the
    *    textLen==0 guard both yield 0.0) — decided by a tag-only scan;
    *  - one fused walk otherwise (LdState), instead of one full walk for
    *    textLen plus one per `a`. Pinned by LinkDensitySpec against the
    *    two-walk formulation (exact Double equality, FP order preserved).
    */
  private[extract] def linkDensity(e: HElement): Double = {
    if (e.tag != "a" && !hasDescendantA(e)) return 0
    val st = new LdState
    if (e.tag == "a") {
      val href = e.attrOrNull("href")
      st.pushA(if (href != null && href.startsWith("#")) 0.3 else 1.0)
      ldWalk(e, st)
      st.popA()
    } else ldWalk(e, st)
    val textLen = st.cnt
    if (textLen == 0) return 0
    st.linkLen / textLen
  }

  private def hasAncestorTag(e: HElement, tag: String, maxDepth: Int = 3): Boolean = {
    var p = e.parent
    var depth = 0
    while (p != null && (maxDepth <= 0 || depth < maxDepth)) {
      if (p.tag == tag) return true
      p = p.parent
      depth += 1
    }
    false
  }

  private def isVisible(e: HElement): Boolean = {
    // allocation-free on the common no-style path (runs per element per walk)
    val style0 = e.attrOrNull("style")
    val styleOk = style0 == null || {
      val style = style0.toLowerCase.replace(" ", "")
      !(style.contains("display:none") || style.contains("visibility:hidden"))
    }
    styleOk && e.attrOrNull("hidden") == null &&
      e.attrOrNull("aria-hidden") != "true"
  }

  private def hasChildBlockElement(e: HElement): Boolean = {
    var i = 0
    val cs = e.children
    while (i < cs.length) {
      cs(i) match {
        case c: HElement =>
          if (isDivToPElem(c.tag) || hasChildBlockElement(c)) return true
        case _ =>
      }
      i += 1
    }
    false
  }

  private def hasSingleTagInside(e: HElement, tag: String): Boolean = {
    // allocation-free: exactly "one element child, of `tag`, and no
    // non-whitespace text child" (runs per div in the grab walk)
    var only: HElement = null
    var count = 0
    var hasText = false
    val cs = e.children
    var i = 0
    while (i < cs.length) {
      cs(i) match {
        case c: HElement => count += 1; only = c
        case t: HText    => if (!hasText && t.data.exists(!_.isWhitespace)) hasText = true
        case _           =>
      }
      i += 1
    }
    count == 1 && only.tag == tag && !hasText
  }

  // ---- grabArticle ----

  /** Captured-at-most-once byline state shared across grab attempts
    * (Readability.js `_articleByline` / go-readability `articleByline`).
    */
  private final class BylineState {
    var found = false
    var text = ""
  }

  /** Readability.js `_isValidByline`: non-empty and under 100 chars. */
  private def isValidByline(s: String): Boolean = {
    val t = s.trim
    t.nonEmpty && t.length < 100
  }

  private def grabArticle(doc: HDocument, flags: Int, articleTitle: String,
      byline: BylineState): Option[HElement] = {
    val body = doc.body.getOrElse(return None)
    val stripUnlikely = (flags & FlagStripUnlikelys) != 0

    // 1) walk and clean; collect elements to score
    val elementsToScore = mutable.ArrayBuffer[HElement]()

    /** Readability.js `_checkByline` (called after the visibility check and
      * before unlikely-candidates): rel=author / itemprop~author / byline-ish
      * class-or-id with plausible text → capture and REMOVE the node.
      */
    def checkByline(e: HElement, matchString: String): Boolean = {
      if (byline.found) return false
      val rel = e.attrOrNull("rel")
      val itemprop = e.attrOrNull("itemprop")
      // matchString == " " (no class, no id — the common case) cannot match
      // rxByline (every alternative needs word chars): skip the Matcher
      val matches = (rel != null && rel == "author") ||
        (itemprop != null && itemprop.contains("author")) ||
        (matchString.length > 1 && rxByline.findFirstIn(matchString).isDefined)
      if (matches && isValidByline(e.text)) {
        byline.found = true
        byline.text = e.text.trim
        e.remove()
        true
      } else false
    }

    def walk(node: HElement): Unit = {
      // iterate over a snapshot: children may be removed/replaced
      // (toArray: one arraycopy, vs Vector.from's per-node tree build)
      val snapshot = node.children.toArray
      var si = 0
      while (si < snapshot.length) {
        snapshot(si) match {
        case e: HElement =>
          val matchString = classIdString(e)
          if (!isVisible(e)) e.remove()
          else if (checkByline(e, matchString)) ()
          else if (stripUnlikely && matchString.length > 1 &&
            rxUnlikelyCandidates.findFirstIn(matchString).isDefined &&
            rxOkMaybeCandidate.findFirstIn(matchString).isEmpty &&
            !hasAncestorTag(e, "table") && !hasAncestorTag(e, "code") &&
            e.tag != "body" && e.tag != "a") {
            e.remove()
          } else {
            if (isDefaultTagToScore(e.tag)) elementsToScore += e
            if (e.tag == "div") {
              // div wrapping a single p with no other text → unwrap
              if (hasSingleTagInside(e, "p") && linkDensity(e) < 0.25) {
                val p = e.children.collectFirst { case c: HElement => c }.get
                val parent = e.parent
                if (parent != null) {
                  val i = parent.indexOfChild(e)
                  parent.children(i) = p
                  p.parent = parent
                  e.parent = null
                  elementsToScore += p
                  walk(p)
                }
              } else if (!hasChildBlockElement(e)) {
                val p = e.replaceWithTag("p")
                elementsToScore += p
                walk(p)
              } else {
                walk(e)
              }
            } else walk(e)
          }
        case _ =>
        }
        si += 1
      }
    }
    walk(body)

    // 2) score
    val scores = mutable.LinkedHashMap[HElement, Double]()
    val candidates = mutable.ArrayBuffer[HElement]()

    elementsToScore.foreach { el =>
      if (el.parent != null) {
        // the scored string is consumed only as (length, comma segments) —
        // normLenCommas computes both exactly in one allocation-free walk
        // (trim semantics included; pinned by NormLenCommasSpec), so the
        // normalized string is never built here at all
        val packed = normLenCommas(el)
        val textLen = packedLen(packed)
        if (textLen >= 25) {
          var contentScore = 1.0
          contentScore += packedCommaSegs(packed)
          contentScore += math.min(math.floor(textLen / 100.0), 3.0)

          // propagate to up to 3 ancestors
          var ancestor = el.parent
          var level = 0
          while (ancestor != null && ancestor.tag != "html" && level < 3) {
            if (!scores.contains(ancestor)) {
              scores(ancestor) = initialScore(ancestor, flags)
              candidates += ancestor
            }
            val divider = if (level == 0) 1.0 else if (level == 1) 2.0 else level * 3.0
            scores(ancestor) = scores(ancestor) + contentScore / divider
            ancestor = ancestor.parent
            level += 1
          }
        }
      }
    }

    // 3) top candidate (scale by link density)
    var topCandidate: HElement = null
    var topScore = Double.MinValue
    candidates.foreach { c =>
      val s = scores(c) * (1 - linkDensity(c))
      scores(c) = s
      if (s > topScore) { topScore = s; topCandidate = c }
    }

    var neededToCreateTopCandidate = false
    if (topCandidate == null || topCandidate.tag == "body") {
      neededToCreateTopCandidate = true
      val div = new HElement("div")
      body.children.toVector.foreach(div.appendChild)
      body.children.clear()
      body.appendChild(div)
      topCandidate = div
      scores(topCandidate) = initialScore(topCandidate, flags)
    } else {
      // walk up while a parent holds most of the children's score mass
      var parentOfTop = topCandidate.parent
      var lastScore = scores(topCandidate)
      val scoreThreshold = lastScore / 3.0
      var continue = true
      while (continue && parentOfTop != null && parentOfTop.tag != "body") {
        scores.get(parentOfTop) match {
          case None => parentOfTop = parentOfTop.parent
          case Some(parentScore) =>
            if (parentScore < scoreThreshold) continue = false
            else if (parentScore > lastScore) {
              topCandidate = parentOfTop
              continue = false
            } else {
              lastScore = parentScore
              parentOfTop = parentOfTop.parent
            }
        }
      }
      // single-child unwrapping
      var parent = topCandidate.parent
      while (parent != null && parent.tag != "body" &&
        parent.children.count(_.isInstanceOf[HElement]) == 1) {
        topCandidate = parent
        parent = topCandidate.parent
      }
    }

    // 4) sibling assembly
    val articleContent = new HElement("div")
    val siblingThreshold = math.max(10.0, scores.getOrElse(topCandidate, 0.0) * 0.2)
    val parentOfTop = if (topCandidate.parent != null) topCandidate.parent else body
    val siblings = parentOfTop.children.toVector

    siblings.foreach {
      case s: HElement =>
        var append = false
        if (s eq topCandidate) append = true
        else {
          var bonus = 0.0
          if (s.className == topCandidate.className && topCandidate.className.nonEmpty)
            bonus = scores.getOrElse(topCandidate, 0.0) * 0.2
          if (scores.contains(s) && scores(s) + bonus >= siblingThreshold) append = true
          else if (s.tag == "p") {
            val ld = linkDensity(s)
            val text = innerTextNorm(s)
            val len = text.length
            if (len > 80 && ld < 0.25) append = true
            else if (len < 80 && len > 0 && ld == 0 && text.matches(".*\\.( |$).*")) append = true
          }
        }
        if (append) {
          val node =
            if (!isAlterToDivException(s.tag)) s.replaceWithTag("div") else s
          articleContent.appendChild(node)
        }
      case _ =>
    }

    // 5) prepArticle
    prepArticle(articleContent, flags)

    // wrap in the readability page div
    val wrapper = new HElement("div")
    wrapper.setAttr("id", "readability-page-1")
    wrapper.setAttr("class", "page")
    articleContent.children.toVector.foreach(wrapper.appendChild)
    articleContent.children.clear()
    articleContent.appendChild(wrapper)
    Some(articleContent)
  }

  // ---- prepArticle ----

  private def prepArticle(article: HElement, flags: Int): Unit = {
    // strip inline styles (attr-only mutation: foreachElement is safe and
    // allocation-free where the lazy descendants iterator is not)
    article.removeAttr("style")
    article.removeAttr("align")
    article.removeAttr("bgcolor")
    article.foreachElement { e =>
      e.removeAttr("style")
      e.removeAttr("align")
      e.removeAttr("bgcolor")
    }

    // Readability.js order: _fixLazyImages runs before the conditional cleans
    fixLazyImages(article)

    cleanConditionally(article, "form", flags)
    cleanConditionally(article, "fieldset", flags)
    // one walk ≡ the five adjacent single-tag clean() passes (disjoint tag
    // sets; nested hits detach with their ancestors either way — the
    // removeTags equivalence documented in Dom)
    cleanTags(article, t =>
      t == "object" || t == "embed" || t == "footer" || t == "link" || t == "aside")

    // share elements anywhere inside each top-level candidate
    // (Readability.js _cleanMatchedNodes over articleContent.children:
    // strict descendants, raw textContent length vs charThreshold).
    // Collect-then-remove ≡ remove-during-snapshot-iteration: the match
    // conditions read only the element's own attrs and subtree, and a
    // pre-order-earlier removal never alters a later element's subtree.
    article.children.toVector.foreach {
      case top: HElement =>
        val hits = mutable.ArrayBuffer[HElement]()
        top.foreachElement { e =>
          val ms = classIdString(e)
          if (ms.length > 1 && rxShare.findFirstIn(ms).isDefined &&
            e.text.length < CharThreshold) hits += e
        }
        hits.foreach(_.remove())
      case _ =>
    }

    // one walk ≡ the five adjacent single-tag clean() passes (see above)
    cleanTags(article, t =>
      t == "iframe" || t == "input" || t == "textarea" || t == "select" || t == "button")
    cleanHeaders(article, flags)

    cleanConditionally(article, "table", flags)
    cleanConditionally(article, "ul", flags)
    cleanConditionally(article, "div", flags)

    // replace h1 → h2
    article.find("h1").foreach(_.replaceWithTag("h2"))

    // remove empty paragraphs — text check first (early-exits at the first
    // non-ws char, so non-empty paragraphs never pay a full subtree walk);
    // the media scan runs only for the rare text-empty ones
    article.find("p").foreach { p =>
      if (!normTextLenAtLeast(p, 1)) {
        val hasMedia = p.selfAndDescendants.exists(e =>
          e.tag == "img" || e.tag == "embed" || e.tag == "object" || e.tag == "iframe")
        if (!hasMedia) p.remove()
      }
    }

    // remove br preceding a p
    article.find("br").foreach { br =>
      nextSibling(br) match {
        case Some(e: HElement) if e.tag == "p" => br.remove()
        case _                                 =>
      }
    }

    // remove class attributes except the preserved "page" (attr-only
    // mutation: foreachElement is safe and allocation-free)
    val articleClass = article.attrOrNull("class")
    if (articleClass != null && articleClass != "page") article.removeAttr("class")
    article.foreachElement { e =>
      val c = e.attrOrNull("class")
      if (c != null && c != "page") e.removeAttr("class")
    }
  }

  /** Remove every strict descendant whose tag satisfies the predicate — one
    * collect walk + removals, equivalent to sequential
    * `article.find(tag).foreach(_.remove())` passes over each tag of the
    * group (disjoint tag sets; nested hits detach with their ancestors
    * either way).
    */
  private def cleanTags(article: HElement, isTarget: String => Boolean): Unit = {
    val hits = mutable.ArrayBuffer[HElement]()
    article.foreachElement(e => if (isTarget(e.tag)) hits += e)
    hits.foreach(_.remove())
  }

  // JS regexes from Readability.js _fixLazyImages — note the last two are
  // case-SENSITIVE there, so they are here too
  private val rxB64DataUrl = "(?i)^data:\\s*([^\\s;,]+)\\s*;\\s*base64\\s*,".r
  private val rxImgExtWithDescriptor = "\\.(jpg|jpeg|png|webp)\\s+\\d".r
  private val rxSingleImgFile = "^\\s*\\S+\\.(jpg|jpeg|png|webp)\\S*\\s*$".r

  /** Readability.js `_fixLazyImages`: drop tiny base64 placeholder src
    * values, then promote lazy-load attributes (e.g. `data-src`,
    * `data-srcset` — any attr whose value looks like an image file or a
    * srcset descriptor) onto src/srcset for images that have no source or
    * carry a `lazy` class; a figure with no image at all gets one built
    * from the promoted attr.
    */
  private def fixLazyImages(root: HElement): Unit = {
    // one collect walk ≡ find("img") ++ find("picture") ++ find("figure"):
    // per-element processing touches only the element's own attrs, except
    // the figure branch, which reads img/picture PRESENCE in its subtree
    // (never changed by img/picture processing) and appends a fresh img
    // (never part of either snapshot); figures keep their relative document
    // order in both schemes, so the grouped-by-tag order and document order
    // yield the same final tree
    val media = mutable.ArrayBuffer[HElement]()
    root.foreachElement { e =>
      val t = e.tag
      if (t == "img" || t == "picture" || t == "figure") media += e
    }
    media.foreach { elem =>
      val src0 = elem.attr("src").getOrElse("")
      rxB64DataUrl.findFirstMatchIn(src0).foreach { m =>
        if (m.group(1) != "image/svg+xml") {
          val elemAttrs = elem.attrsOrNull
          val srcCouldBeRemoved = elemAttrs != null && elemAttrs.exists { case (k, v) =>
            k != "src" && rxImgExt.findFirstIn(v).isDefined
          }
          if (srcCouldBeRemoved) {
            val b64starts = src0.toLowerCase.indexOf("base64") + 7
            if (src0.length - b64starts < 133) elem.removeAttr("src")
          }
        }
      }
      val src = elem.attr("src").getOrElse("")
      val srcset = elem.attr("srcset").getOrElse("")
      val isLazy = elem.className.toLowerCase.contains("lazy")
      if (!((src.nonEmpty || (srcset.nonEmpty && srcset != "null")) && !isLazy)) {
        val as0 = elem.attrsOrNull
        (if (as0 == null) Vector.empty else as0.toVector).foreach { case (name, value) =>
          if (name != "src" && name != "srcset" && name != "alt") {
            val copyTo =
              if (rxImgExtWithDescriptor.findFirstIn(value).isDefined) "srcset"
              else if (rxSingleImgFile.findFirstIn(value).isDefined) "src"
              else null
            if (copyTo != null) {
              if (elem.tag == "img" || elem.tag == "picture") elem.setAttr(copyTo, value)
              else if (elem.tag == "figure" &&
                elem.find("img").isEmpty && elem.find("picture").isEmpty) {
                val img = new HElement("img")
                img.setAttr(copyTo, value)
                elem.appendChild(img)
              }
            }
          }
        }
      }
    }
  }

  private def cleanHeaders(article: HElement, flags: Int): Unit = {
    // one walk ≡ find("h1") ++ find("h2"): classWeight reads only the
    // element's own attrs, so the h1-then-h2 grouping vs document order
    // cannot change which headers get removed
    val hits = mutable.ArrayBuffer[HElement]()
    article.foreachElement(e => if (e.tag == "h1" || e.tag == "h2") hits += e)
    hits.foreach(h => if (classWeight(h, flags) < 0) h.remove())
  }

  /** Readability.js _markDataTables: tables that look like data (caption,
    * th/thead/tfoot/col, summary attr, or big row×col counts) are spared
    * from conditional cleaning.
    */
  private def isDataTable(t: HElement): Boolean = {
    if (t.attr("role").contains("presentation")) return false
    if (t.attr("datatable").contains("0")) return false
    if (t.attr("summary").exists(_.nonEmpty)) return true
    if (t.find("caption").exists(_.children.nonEmpty)) return true
    if (Seq("col", "colgroup", "tfoot", "thead", "th").exists(tag => t.find(tag).nonEmpty))
      return true
    if (t.find("table").nonEmpty) return false // nested table → layout
    // Readability.js _getRowAndColumnCount: rows sum each tr's rowspan attr
    // (default 1), columns are the max per-row sum of td colspans (th never
    // counts — a table with th already returned data above); span attrs
    // parse with JS parseInt semantics (leading-integer prefix, 0 → 1)
    var rows = 0
    var cols = 0
    t.find("tr").foreach { tr =>
      val rowspan = jsParseInt(tr.attrOrNull("rowspan"))
      rows += (if (rowspan != 0) rowspan else 1)
      var rowCols = 0
      tr.find("td").foreach { td =>
        val colspan = jsParseInt(td.attrOrNull("colspan"))
        rowCols += (if (colspan != 0) colspan else 1)
      }
      cols = math.max(cols, rowCols)
    }
    rows >= 10 || cols > 4 || rows * cols > 10
  }

  /** JS `parseInt(x, 10) || 0`: the leading optional-sign integer prefix,
    * 0 when absent/unparseable.
    */
  private def jsParseInt(s: String): Int = {
    if (s == null) return 0
    var i = 0
    val n = s.length
    while (i < n && s.charAt(i).isWhitespace) i += 1
    var sign = 1
    if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) {
      if (s.charAt(i) == '-') sign = -1
      i += 1
    }
    var v = 0L
    var any = false
    while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9' && v < Int.MaxValue) {
      v = v * 10 + (s.charAt(i) - '0')
      any = true
      i += 1
    }
    if (!any) 0 else (sign * math.min(v, Int.MaxValue)).toInt
  }

  private def cleanConditionally(article: HElement, tag: String, flags: Int): Unit = {
    if ((flags & FlagCleanConditionally) == 0) return
    article.find(tag).foreach { node =>
      if (node.parent != null && !(tag == "table" && isDataTable(node))) {
        val weight = classWeight(node, flags)
        if (weight < 0) node.remove()
        else {
          // exact (length, comma segments) of the normalized text without
          // building it (normLenCommas), and the six per-tag find().size
          // passes fused into ONE allocation-free descendant walk — counts
          // of disjoint tags are order-independent, so the fused walk is
          // definitionally equal to the sequential finds
          val packed = normLenCommas(node)
          if (packedCommaSegs(packed) < 10) {
            var ps = 0
            var imgs = 0
            var lis = 0
            var inputs = 0
            var embeds = 0
            node.foreachElement { c =>
              c.tag match {
                case "p"                          => ps += 1
                case "img"                        => imgs += 1
                case "li"                         => lis += 1
                case "input"                      => inputs += 1
                case "embed" | "object" | "iframe" => embeds += 1
                case _                            =>
              }
            }
            val lisAdj = lis - 100
            val ld = linkDensity(node)
            val contentLength = packedLen(packed)
            val haveToRemove =
              (imgs > 1 && ps.toDouble / imgs < 0.5 && !hasAncestorTag(node, "figure")) ||
                (tag != "ul" && tag != "ol" && lisAdj > ps) ||
                (inputs > math.floor(ps / 3.0)) ||
                (tag != "ul" && tag != "ol" && contentLength < 25 && (imgs == 0 || imgs > 2) &&
                  !hasAncestorTag(node, "figure")) ||
                (weight < 25 && ld > 0.2) ||
                (weight >= 25 && ld > 0.5) ||
                ((embeds == 1 && contentLength < 75) || embeds > 1)
            if (haveToRemove) node.remove()
          }
        }
      }
    }
  }

  // ---- post-process ----

  private def postProcess(article: HElement, pageUrl: GoUrl): Unit = {
    fixRelativeUris(article, pageUrl)
    simplifyNestedElements(article)
  }

  private def toAbsolute(pageUrl: GoUrl, uri: String): String =
    pageUrl.parseRef(uri).map(_.toUrlString).getOrElse(uri)

  private def fixRelativeUris(article: HElement, pageUrl: GoUrl): Unit = {
    article.find("a").foreach { a =>
      a.attr("href").foreach { href =>
        if (href.startsWith("javascript:")) {
          // replace links with their text (Readability.js behavior)
          val t = new HText(a.text)
          val parent = a.parent
          if (parent != null) {
            val i = parent.indexOfChild(a)
            parent.children(i) = t
            t.parent = parent
            a.parent = null
          }
        } else if (href.nonEmpty) {
          a.setAttr("href", toAbsolute(pageUrl, href))
        }
      }
    }
    // one collect walk ≡ the six grouped-by-tag find() passes: processing
    // rewrites only the element's own src/poster/srcset attrs, so the
    // processing order cannot affect the result
    val media = mutable.ArrayBuffer[HElement]()
    article.foreachElement { e =>
      e.tag match {
        case "img" | "picture" | "figure" | "video" | "audio" | "source" =>
          media += e
        case _ =>
      }
    }
    media.foreach { m =>
      m.attr("src").filter(_.nonEmpty).foreach(s => m.setAttr("src", toAbsolute(pageUrl, s)))
      m.attr("poster").filter(_.nonEmpty).foreach(s => m.setAttr("poster", toAbsolute(pageUrl, s)))
      m.attr("srcset").filter(_.nonEmpty).foreach { srcset =>
        val fixed = srcset.split(",").map { part =>
          val bits = part.trim.split("\\s+", 2)
          if (bits.nonEmpty && bits(0).nonEmpty) {
            val abs = toAbsolute(pageUrl, bits(0))
            if (bits.length > 1) s"$abs ${bits(1)}" else abs
          } else part.trim
        }.mkString(", ")
        m.setAttr("srcset", fixed)
      }
    }
  }

  private def simplifyNestedElements(article: HElement): Unit = {
    var node: HElement = article
    val toVisit = mutable.Queue[HElement](article)
    while (toVisit.nonEmpty) {
      node = toVisit.dequeue()
      node.children.toVector.foreach {
        case e: HElement =>
          if ((e.tag == "div" || e.tag == "section") && e.id != "readability-page-1") {
            if (isElementWithoutContent(e)) { e.remove() }
            else if (hasSingleTagInside(e, "div") || hasSingleTagInside(e, "section")) {
              val child = e.children.collectFirst { case c: HElement => c }.get
              val eAttrs = e.attrsOrNull
              if (eAttrs != null)
                eAttrs.foreach { case (k, v) => if (child.attr(k).isEmpty) child.setAttr(k, v) }
              val parent = e.parent
              val i = parent.indexOfChild(e)
              parent.children(i) = child
              child.parent = parent
              e.parent = null
              toVisit.enqueue(child)
            } else toVisit.enqueue(e)
          } else toVisit.enqueue(e)
        case _ =>
      }
    }
  }

  private def isElementWithoutContent(e: HElement): Boolean = {
    val text = e.text
    text.forall(_.isWhitespace) && (e.children.isEmpty ||
      e.children.count {
        case c: HElement => c.tag != "br" && c.tag != "hr"
        case t: HText    => t.data.exists(!_.isWhitespace)
        case _           => false
      } == 0)
  }
}
