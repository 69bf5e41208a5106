package graft.extract

import graft.html._

/** HTML → Markdown conversion (H5 in SURVEY.md §2.9), modeled on
  * JohannesKaufmann/html-to-markdown v1.6.0 with the GitHubFlavored plugin
  * as configured by the reference (/root/reference/processor.go:97-98):
  * CommonMark core (ATX headings, `**strong**`, `*em*`, links, images,
  * lists, fenced code, blockquotes, `---` rules) plus GFM strikethrough,
  * tables, and task lists. The final result is TrimSpace'd by the caller
  * (processor.go:108).
  *
  * Rendering appends into ONE shared java.lang.StringBuilder instead of
  * building a string per element and concatenating up the tree (the largest
  * remaining allocation site in the extraction kernel after the readability
  * walk fusions). Trim/emptiness decisions that the per-element strings used
  * to provide are made on builder REGIONS ([mark, length)): render the
  * content, then trim or roll the region back. Byte-for-byte output parity
  * with the string-per-element formulation is pinned by MarkdownDiffSpec
  * (a verbatim copy of the old renderer lives in the test tree as the
  * differential oracle) plus the byte-exact goldens.
  */
object Markdown {

  private type JSB = java.lang.StringBuilder

  def convert(html: String): String = {
    val doc = HtmlParser.parse(html)
    val sb = new JSB(1024)
    renderBlocksInto(doc.root, sb)
    collapse(sb.toString).trim
  }

  def convertElement(e: HElement): String = {
    val sb = new JSB(1024)
    renderBlocksInto(e, sb)
    collapse(sb.toString).trim
  }

  // precompiled: String.replaceAll re-compiles its pattern on EVERY call,
  // and these run per block / per table cell in the extraction hot path
  private val NewlineRun = java.util.regex.Pattern.compile("\\n+")
  private val TrailingWs = java.util.regex.Pattern.compile("\\s+$")

  /** `NewlineRun.replaceAll(" ")` with a no-newline fast path (headings and
    * every table cell run this; their inline text almost never holds '\n').
    */
  @inline private def newlinesToSpace(s: String): String =
    if (s.indexOf('\n') < 0) s else NewlineRun.matcher(s).replaceAll(" ")

  // Java multiline line terminators (Pattern MULTILINE, no UNIX_LINES)
  @inline private def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  /** Blank out whitespace-only lines, then collapse 3+ newlines to 2 —
    * exactly `"(?m)^[ \t]+$" → ""` followed by `"\n{3,}" → "\n\n"` without
    * the two regex passes (this runs per list item / blockquote AND once
    * over the whole page; CollapseEquivalenceSpec pins it against the regex
    * formulation on adversarial inputs). One prescan decides whether
    * anything rewrites — the common small-call case then returns the input
    * with zero allocation.
    */
  private[extract] def collapse(s: String): String = {
    val n = s.length
    // prescan: a whitespace-only line, or a run of 3+ '\n'?
    var i = 0
    var rewrite = false
    while (i < n && !rewrite) {
      val ls = i
      var wsOnly = true
      while (i < n && !isLineTerm(s.charAt(i))) {
        val c = s.charAt(i)
        if (c != ' ' && c != '\t') wsOnly = false
        i += 1
      }
      if (i > ls && wsOnly) rewrite = true
      else if (i < n) {
        if (s.charAt(i) == '\n' && i + 2 < n &&
          s.charAt(i + 1) == '\n' && s.charAt(i + 2) == '\n') rewrite = true
        i += 1
      }
    }
    if (!rewrite) return s
    // fused rewrite: drop [ \t]-only line contents, then cap every emitted
    // '\n' run at 2 (line contents contain no terminators, so only the
    // terminator emission affects the run count)
    val sb = new JSB(n)
    var nlRun = 0
    i = 0
    while (i < n) {
      val ls = i
      var wsOnly = true
      while (i < n && !isLineTerm(s.charAt(i))) {
        val c = s.charAt(i)
        if (c != ' ' && c != '\t') wsOnly = false
        i += 1
      }
      if (i > ls && !wsOnly) {
        sb.append(s, ls, i)
        nlRun = 0
      }
      if (i < n) {
        val t = s.charAt(i)
        if (t == '\n') {
          nlRun += 1
          if (nlRun <= 2) sb.append(t)
        } else {
          nlRun = 0
          sb.append(t)
        }
        i += 1
      }
    }
    sb.toString
  }

  // string-literal match (hashCode lookupswitch + one equals — cheaper than
  // the hash-trie Set walk this paid per child in inline/liContent)
  private def isBlockTag(t: String): Boolean = t match {
    case "p" | "div" | "section" | "article" | "main" | "aside" | "header" |
        "footer" | "nav" | "h1" | "h2" | "h3" | "h4" | "h5" | "h6" | "ul" |
        "ol" | "li" | "table" | "blockquote" | "pre" | "hr" | "figure" |
        "figcaption" | "address" | "fieldset" | "form" | "dl" | "dt" | "dd" |
        "details" | "summary" | "body" | "html" | "head" => true
    case _ => false
  }

  // ---- region helpers ----

  /** String.trim on the region [from, sb.length): drop chars ≤ U+0020 from
    * both ends. Returns true iff the region is non-empty afterwards.
    */
  private def trimRegion(sb: JSB, from: Int): Boolean = {
    var end = sb.length
    while (end > from && sb.charAt(end - 1) <= ' ') end -= 1
    sb.setLength(end)
    var start = from
    while (start < end && sb.charAt(start) <= ' ') start += 1
    if (start > from) sb.delete(from, start): Unit
    sb.length > from
  }

  /** `newlinesToSpace` on the region [from, sb.length): each '\n'-run
    * becomes one ' ' (two-pointer compaction; fast path scans only).
    */
  private def newlinesToSpaceRegion(sb: JSB, from: Int): Unit = {
    val n = sb.length
    var i = from
    var has = false
    while (i < n && !has) {
      if (sb.charAt(i) == '\n') has = true
      i += 1
    }
    if (!has) return
    var r = from
    var w = from
    while (r < n) {
      val c = sb.charAt(r)
      if (c == '\n') {
        sb.setCharAt(w, ' ')
        w += 1
        r += 1
        while (r < n && sb.charAt(r) == '\n') r += 1
      } else {
        sb.setCharAt(w, c)
        w += 1
        r += 1
      }
    }
    sb.setLength(w)
  }

  // ---- block rendering ----

  private def renderBlocksInto(e: HElement, sb: JSB): Unit = {
    val cs = e.children
    var i = 0
    while (i < cs.length) {
      renderNodeInto(cs(i), sb)
      i += 1
    }
  }

  private def renderNodeInto(n: HNode, sb: JSB): Unit = n match {
    case t: HText =>
      val d = t.data
      var i = 0
      var allWs = true
      while (i < d.length && allWs) {
        if (!d.charAt(i).isWhitespace) allWs = false
        i += 1
      }
      if (allWs) { if (d.nonEmpty) sb.append(' '): Unit }
      else inlineTextInto(d, sb)
    case _: HComment => ()
    case _: HDoctype => ()
    case e: HElement => renderElementInto(e, sb)
  }

  /** "\n\n" + inline(e).trim + "\n\n", or nothing when the trimmed content
    * is empty (the p / dt / dd shape).
    */
  private def blockWrapInto(e: HElement, sb: JSB): Unit = {
    val mark0 = sb.length
    sb.append("\n\n")
    val mark = sb.length
    inlineInto(e, sb)
    if (!trimRegion(sb, mark)) sb.setLength(mark0)
    else sb.append("\n\n"): Unit
  }

  private def renderElementInto(e: HElement, sb: JSB): Unit = e.tag match {
    case "head" | "script" | "style" | "title" | "meta" | "link" | "template" => ()
    case "html" | "body" => renderBlocksInto(e, sb)
    case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
      val level = e.tag.charAt(1) - '0'
      val mark0 = sb.length
      sb.append("\n\n")
      var k = 0
      while (k < level) { sb.append('#'); k += 1 }
      sb.append(' ')
      val mark = sb.length
      inlineInto(e, sb)
      // trim first, then \n-runs → spaces: same order as the string form
      if (!trimRegion(sb, mark)) sb.setLength(mark0)
      else {
        newlinesToSpaceRegion(sb, mark)
        sb.append("\n\n"): Unit
      }
    case "p" => blockWrapInto(e, sb)
    case "br" => sb.append("  \n"): Unit
    case "hr" => sb.append("\n\n---\n\n"): Unit
    case "blockquote" =>
      // rare block: extract the rendered region and keep the original
      // line-by-line quoting formulation
      val mark = sb.length
      renderBlocksInto(e, sb)
      val blocks = sb.substring(mark)
      sb.setLength(mark)
      val inner = collapse(blocks).trim
      if (inner.nonEmpty) {
        sb.append("\n\n")
        sb.append(inner.linesIterator
          .map(l => TrailingWs.matcher("> " + l).replaceAll(""))
          .mkString("\n"))
        sb.append("\n\n"): Unit
      }
    case "pre" =>
      sb.append("\n\n```\n").append(e.text.stripLineEnd).append("\n```\n\n"): Unit
    case "ul" | "ol" => renderListInto(e, sb, ordered = e.tag == "ol")
    case "table"     => renderTableInto(e, sb)
    case "figure" | "figcaption" | "address" | "fieldset" | "form" | "details" |
        "summary" | "div" | "section" | "article" | "main" | "aside" | "header" |
        "footer" | "nav" | "dl" =>
      // transparent block containers
      renderBlocksInto(e, sb)
    case "dt" | "dd" => blockWrapInto(e, sb)
    case _ => inlineElementInto(e, sb)
  }

  // ---- lists ----

  private def renderListInto(e: HElement, sb: JSB, ordered: Boolean): Unit = {
    var any = false
    val cs = e.children
    var ci = 0
    while (ci < cs.length && !any) {
      cs(ci) match {
        case c: HElement if c.tag == "li" => any = true
        case _                            =>
      }
      ci += 1
    }
    if (!any) return
    sb.append("\n\n")
    var idx = 1
    ci = 0
    while (ci < cs.length) {
      cs(ci) match {
        case li: HElement if li.tag == "li" =>
          val checkbox = li.findFirst("input[type=checkbox]")
          val prefix =
            if (ordered) s"$idx. "
            else if (checkbox.isDefined) {
              val checked = checkbox.get.attr("checked").isDefined
              if (checked) "- [x] " else "- [ ] "
            } else "- "
          checkbox.foreach(_.remove())
          val mark = sb.length
          liContentInto(li, sb)
          val raw = sb.substring(mark)
          sb.setLength(mark)
          val content = collapse(raw).trim
          val it = content.linesIterator
          var first = true
          while (it.hasNext) {
            val line = it.next()
            if (first) { sb.append(prefix): Unit; first = false }
            else { sb.append('\n').append("    "): Unit }
            sb.append(line): Unit
          }
          sb.append('\n'): Unit
          idx += 1
        case _ =>
      }
      ci += 1
    }
    sb.append('\n'): Unit
  }

  private def liContentInto(li: HElement, sb: JSB): Unit = {
    val cs = li.children
    var i = 0
    while (i < cs.length) {
      cs(i) match {
        case t: HText => renderNodeInto(t, sb)
        case c: HElement if c.tag == "ul" || c.tag == "ol" =>
          sb.append('\n')
          val mark = sb.length
          renderListInto(c, sb, ordered = c.tag == "ol")
          trimRegion(sb, mark): Unit
          sb.append('\n'): Unit
        case c: HElement if isBlockTag(c.tag) =>
          renderElementInto(c, sb)
        case c: HElement => inlineElementInto(c, sb)
        case _           =>
      }
      i += 1
    }
  }

  // ---- tables (GFM) ----

  /** GFM table rendering. Header detection matches the pinned converter
    * (JohannesKaufmann/html-to-markdown v1.6.0, reference go.mod:6, enabled
    * via plugin.GitHubFlavored(), reference processor.go:98): the first row
    * is a header iff every cell is `th`. For HEADERLESS tables the pinned
    * converter — a turndown/turndown-plugin-gfm port — emits the rows with
    * no delimiter line, which is not a valid GFM table (renderers show it as
    * plain text). That library source is unreachable from this offline
    * sandbox, so the exact v1.6.0 byte behavior cannot be consulted; this
    * engine DELIBERATELY diverges to the useful output (an empty header row
    * + delimiter, i.e. a well-formed table) and keeps headerless tables OUT
    * of the corpus parity domain — the choice is pinned by MarkdownSpec
    * ("tables without th get an empty GFM header row"), not by any
    * byte-parity oracle. Revisit against the real library if it ever
    * becomes consultable.
    */
  private def renderTableInto(e: HElement, sb: JSB): Unit = {
    val rows = e.find("tr")
    if (rows.isEmpty) return
    def cells(tr: HElement): Vector[(String, String)] =
      tr.children.collect {
        case c: HElement if c.tag == "td" || c.tag == "th" =>
          (c.tag, newlinesToSpace(inline(c).trim).replace("|", "\\|"))
      }.toVector
    val allRows = rows.map(cells).filter(_.nonEmpty)
    if (allRows.isEmpty) return
    val headerIsTh = allRows.head.forall(_._1 == "th")
    val nCols = allRows.map(_.size).max
    sb.append("\n\n")
    def emitRow(r: Vector[(String, String)]): Unit = {
      val padded = r.map(_._2).padTo(nCols, "")
      sb.append("| ").append(padded.mkString(" | ")).append(" |\n"): Unit
    }
    if (headerIsTh) {
      emitRow(allRows.head)
      sb.append("|").append(" --- |" * nCols).append("\n")
      allRows.tail.foreach(emitRow)
    } else {
      // GFM requires a header: emit empty header row
      sb.append("|").append("  |" * nCols).append("\n")
      sb.append("|").append(" --- |" * nCols).append("\n")
      allRows.foreach(emitRow)
    }
    sb.append('\n'): Unit
  }

  // ---- inline ----

  /** Inline content of an element (children only) as a string — kept for
    * the table-cell path, which needs per-cell strings for padding.
    */
  private def inline(e: HElement): String = {
    val sb = new JSB
    inlineInto(e, sb)
    sb.toString
  }

  private def inlineInto(e: HElement, sb: JSB): Unit = {
    val cs = e.children
    var i = 0
    while (i < cs.length) {
      cs(i) match {
        case t: HText => renderNodeInto(t, sb)
        case c: HElement if isBlockTag(c.tag) =>
          // block inside inline context: render and keep separation
          renderElementInto(c, sb)
        case c: HElement => inlineElementInto(c, sb)
        case _           =>
      }
      i += 1
    }
  }

  /** pre + inline(e).trim + post, or nothing when the trimmed content is
    * empty (the strong/em/del shape).
    */
  private def wrapInlineInto(e: HElement, sb: JSB, pre: String, post: String): Unit = {
    val mark0 = sb.length
    sb.append(pre)
    val mark = sb.length
    inlineInto(e, sb)
    if (!trimRegion(sb, mark)) sb.setLength(mark0)
    else sb.append(post): Unit
  }

  private def inlineElementInto(e: HElement, sb: JSB): Unit = e.tag match {
    case "strong" | "b"         => wrapInlineInto(e, sb, "**", "**")
    case "em" | "i"             => wrapInlineInto(e, sb, "*", "*")
    case "del" | "s" | "strike" => wrapInlineInto(e, sb, "~~", "~~")
    case "code" | "kbd" | "samp" | "tt" =>
      val c = e.text
      if (!c.isEmpty) sb.append('`').append(c).append('`'): Unit
    case "a" =>
      val href0 = e.attrOrNull("href")
      val mark = sb.length
      if (href0 == null || href0.isEmpty) {
        // no href → the trimmed text stands bare
        inlineInto(e, sb)
        trimRegion(sb, mark): Unit
      } else {
        inlineInto(e, sb)
        if (!trimRegion(sb, mark)) sb.setLength(mark) // empty text → nothing
        else {
          sb.insert(mark, '[')
          sb.append("](").append(href0.replace(" ", "%20"))
          val title = e.attrOrNull("title")
          if (title != null) sb.append(" \"").append(title).append('"')
          sb.append(')'): Unit
        }
      }
    case "img" =>
      val src = e.attrOrNull("src")
      if (src != null && !src.isEmpty) {
        val alt = e.attrOrNull("alt")
        sb.append("![")
        if (alt != null) sb.append(alt)
        sb.append("](").append(src.replace(" ", "%20"))
        val title = e.attrOrNull("title")
        if (title != null) sb.append(" \"").append(title).append('"')
        sb.append(')'): Unit
      }
    case "br" => sb.append("  \n"): Unit
    case "span" | "font" | "u" | "small" | "big" | "abbr" | "cite" | "q" |
        "sub" | "sup" | "time" | "mark" | "label" | "picture" =>
      inlineInto(e, sb)
    case "input" | "textarea" | "select" | "button" | "iframe" | "object" |
        "embed" | "video" | "audio" | "source" | "svg" | "canvas" | "noscript" => ()
    case _ => inlineInto(e, sb)
  }

  /** Whitespace-collapse inline text like an HTML renderer would —
    * exactly `replaceAll("\\s+", " ")` (Java's ASCII \s set) appended into
    * `sb`; the fast path (nothing to rewrite) costs one scan and a single
    * bulk append. Runs per text node of every page.
    */
  private def inlineTextInto(s: String, sb: JSB): Unit = {
    @inline def ws(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    val n = s.length
    var i = 0
    var prevWs = false
    var rewrite = false
    while (i < n && !rewrite) {
      val c = s.charAt(i)
      val w = ws(c)
      if (w && (prevWs || c != ' ')) rewrite = true
      prevWs = w
      i += 1
    }
    if (!rewrite) { sb.append(s): Unit; return }
    i = 0
    prevWs = false
    while (i < n) {
      val c = s.charAt(i)
      if (ws(c)) {
        if (!prevWs) sb.append(' '): Unit
        prevWs = true
      } else {
        sb.append(c): Unit
        prevWs = false
      }
      i += 1
    }
  }
}
