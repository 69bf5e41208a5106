package graft.html

import scala.collection.mutable.ArrayBuffer

/** Tolerant HTML5-ish parser: tokenizer + stack tree builder.
  *
  * Scope is bound to what the engine needs (SURVEY.md §7.3 module 3): anchor
  * iteration in document order, tag removal, selector slicing, readability
  * input. It synthesizes the html/head/body skeleton, auto-closes `p`/`li`/
  * table cells, handles void and raw-text elements, and decodes character
  * references in text and attribute values — mirroring the tolerant behavior
  * goquery (golang.org/x/net/html) exposes to the reference.
  */
object HtmlParser {

  // membership predicates are string-literal matches (hashCode lookupswitch
  // + one equals — cheaper than a hash-trie Set walk per tag event);
  // tokenizer behavior stays pinned by HtmlParserSpec + the byte-exact goldens
  private def isHeadTag(t: String): Boolean = t match {
    case "title" | "meta" | "link" | "style" | "script" | "base" |
        "noscript" | "template" => true
    case _ => false
  }

  // Tags that implicitly close an open <p> (HTML5 "closes a p element").
  private def closesP(t: String): Boolean = t match {
    case "address" | "article" | "aside" | "blockquote" | "center" |
        "details" | "dialog" | "dir" | "div" | "dl" | "fieldset" |
        "figcaption" | "figure" | "footer" | "form" | "h1" | "h2" | "h3" |
        "h4" | "h5" | "h6" | "header" | "hgroup" | "hr" | "main" | "menu" |
        "nav" | "ol" | "p" | "pre" | "section" | "summary" | "table" | "ul" |
        "li" | "dd" | "dt" => true
    case _ => false
  }

  // noscript is raw text because the reference stack parses with scripting
  // enabled (golang.org/x/net/html default, used by both goquery and
  // go-readability): its content is a TEXT node, so the pre-filter cannot
  // see elements inside it and readability re-parses the string on demand
  // (unwrapNoscriptImages). The serializer mirrors this (rawTextElements).
  // plaintext included: x/net/html treats its content as raw text, and the
  // serializer (HtmlSerializer.rawTextElements) already renders it raw —
  // parser/serializer agreement is what makes parse∘serialize the identity
  // the pre-filter retry path rests on (SerializerLengthSpec).
  private def isRawTextTag(t: String): Boolean = t match {
    case "script" | "style" | "textarea" | "title" | "xmp" | "iframe" |
        "noembed" | "noframes" | "noscript" | "plaintext" => true
    case _ => false
  }
  private def isDecodedRawText(t: String): Boolean =
    t == "textarea" || t == "title"

  /** Maximum element nesting depth, mirroring Blink's HTML parser clamp
    * (`kMaximumHTMLParserDOMTreeDepth = 512`): once the open-element stack is
    * this deep, a new element is attached to the *parent* of the deepest open
    * element — i.e. it becomes a sibling instead of deepening the tree. The
    * reference pipeline fetches pages through a headless browser, so its DOM
    * passed through exactly this clamp before extraction ever ran; applying
    * it here both matches that behavior and makes every downstream recursive
    * tree walk (readability scoring, serialization, markdown) stack-safe on
    * adversarially nested input — a totality requirement for the kernel, whose
    * only error contract inside a Spark task is "return, never throw".
    */
  val MaxTreeDepth = 512

  def parse(html: String): HDocument = {
    val preamble = Vector.newBuilder[HNode]
    val root = new HElement("html")
    val head = new HElement("head")
    val body = new HElement("body")
    root.appendChild(head)
    root.appendChild(body)

    var bodyStarted = false
    // stack of open elements inside body (body itself is the floor)
    val stack = ArrayBuffer[HElement](body)
    var headSeen = false

    def current: HElement = if (bodyStarted) stack.last else head

    def openBody(): Unit = { bodyStarted = true }

    def insertText(s: String, decoded: Boolean): Unit = {
      if (s.isEmpty) return
      if (!bodyStarted) {
        if (s.forall(_.isWhitespace)) return
        openBody()
      }
      val t = new HText(if (decoded) s else Entities.decode(s))
      current.appendChild(t)
    }

    def insertRawText(target: HElement, s: String, decode: Boolean): Unit = {
      if (s.isEmpty) return
      target.appendChild(new HText(if (decode) Entities.decode(s) else s))
    }

    // attrs is null when the tag carried none (parseTag allocates lazily)
    def startTag(name: String, attrs: ArrayBuffer[(String, String)]): HElement = {
      name match {
        case "html" =>
          if (attrs != null)
            attrs.foreach { case (k, v) => if (root.attr(k).isEmpty) root.setAttr(k, v) }
          return root
        case "head" =>
          headSeen = true
          if (attrs != null)
            attrs.foreach { case (k, v) => if (head.attr(k).isEmpty) head.setAttr(k, v) }
          return head
        case "body" =>
          openBody()
          if (attrs != null)
            attrs.foreach { case (k, v) => if (body.attr(k).isEmpty) body.setAttr(k, v) }
          return body
        case _ =>
      }

      if (!bodyStarted && !isHeadTag(name)) openBody()

      val parentEl: HElement =
        if (!bodyStarted) head
        else {
          // implied end tags
          if (closesP(name)) {
            val pIdx = stack.lastIndexWhere(_.tag == "p")
            if (pIdx > 0) stack.remove(pIdx, stack.length - pIdx)
          }
          name match {
            case "li" =>
              val idx = stack.lastIndexWhere(_.tag == "li")
              val listIdx = stack.lastIndexWhere(e => e.tag == "ul" || e.tag == "ol")
              if (idx > 0 && idx > listIdx) stack.remove(idx, stack.length - idx)
            case "dd" | "dt" =>
              val idx = stack.lastIndexWhere(e => e.tag == "dd" || e.tag == "dt")
              if (idx > 0) stack.remove(idx, stack.length - idx)
            case "tr" =>
              val idx = stack.lastIndexWhere(_.tag == "tr")
              val tblIdx = stack.lastIndexWhere(e => e.tag == "table")
              if (idx > 0 && idx > tblIdx) stack.remove(idx, stack.length - idx)
            case "td" | "th" =>
              val idx = stack.lastIndexWhere(e => e.tag == "td" || e.tag == "th")
              val trIdx = stack.lastIndexWhere(_.tag == "tr")
              if (idx > 0 && idx > trIdx) stack.remove(idx, stack.length - idx)
            case "option" =>
              val idx = stack.lastIndexWhere(_.tag == "option")
              if (idx > 0) stack.remove(idx, stack.length - idx)
            case "a" =>
              val idx = stack.lastIndexWhere(_.tag == "a")
              if (idx > 0) stack.remove(idx, stack.length - idx)
            case _ =>
          }
          stack.last
        }

      val el = new HElement(name)
      el.attrs = attrs
      val target =
        if (bodyStarted && stack.length >= MaxTreeDepth && (parentEl eq stack.last) &&
          parentEl.parent != null) parentEl.parent
        else parentEl
      target.appendChild(el)
      if (bodyStarted && !HtmlSerializer.isVoid(name) &&
        !isRawTextTag(name))
        stack += el
      el
    }

    def endTag(name: String): Unit = {
      name match {
        case "html" | "head" => if (name == "head") headSeen = true
        case "body"          => // keep body open; trailing content still lands there
        case "p" if bodyStarted =>
          val idx = stack.lastIndexWhere(_.tag == "p")
          if (idx > 0) stack.remove(idx, stack.length - idx)
          else {
            // HTML5: </p> with no open p inserts an empty p
            stack.last.appendChild(new HElement("p"))
          }
        case _ if bodyStarted =>
          val idx = stack.lastIndexWhere(_.tag == name)
          if (idx > 0) stack.remove(idx, stack.length - idx)
        case _ =>
      }
    }

    // ---- tokenizer ----
    val n = html.length
    var i = 0
    val text = new StringBuilder

    def flushText(): Unit = {
      if (text.nonEmpty) { insertText(text.toString, decoded = false); text.clear() }
    }

    def isNameStart(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') {
        // bulk-append the whole text run (most of the document)
        val lt = html.indexOf('<', i + 1)
        val end = if (lt < 0) n else lt
        text.underlying.append(html, i, end): Unit
        i = end
      } else if (i + 1 >= n) { text.append(c); i += 1 }
      else {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            val (data, next) =
              if (end < 0) (html.substring(i + 4), n) else (html.substring(i + 4, end), end + 3)
            val node = new HComment(data)
            if (bodyStarted) current.appendChild(node)
            else if (headSeen) head.appendChild(node)
            else preamble += node
            i = next
          } else {
            val end = html.indexOf('>', i + 2)
            val (data, next) =
              if (end < 0) (html.substring(i + 2), n) else (html.substring(i + 2, end), end + 1)
            if (data.length >= 7 && data.substring(0, 7).equalsIgnoreCase("doctype")) {
              val d = new HDoctype(data.substring(7).trim)
              preamble += d
            } else {
              val node = new HComment(data)
              if (bodyStarted) current.appendChild(node) else preamble += node
            }
            i = next
          }
        } else if (c1 == '?') {
          flushText()
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/') {
          if (i + 2 < n && isNameStart(html.charAt(i + 2))) {
            flushText()
            var j = i + 2
            while (j < n && html.charAt(j) != '>') j += 1
            // name ends at the first whitespace or '/' inside the tag —
            // interned scan, no substring/takeWhile/toLowerCase allocations
            var ne = i + 2
            while (ne < j && !html.charAt(ne).isWhitespace && html.charAt(ne) != '/')
              ne += 1
            endTag(Names.lowerName(html, i + 2, ne))
            i = if (j < n) j + 1 else n
          } else { text.append(c); i += 1 }
        } else if (isNameStart(c1)) {
          flushText()
          val (name, attrs, selfClosing, next) = parseTag(html, i + 1)
          i = next
          val el = startTag(name, attrs)
          if (isRawTextTag(name) && !selfClosing) {
            // consume raw text until matching close tag (case-insensitive)
            val closeSeq = "</" + name
            var j = i
            var found = -1
            while (found < 0 && j < n) {
              val idx = indexOfIgnoreCase(html, closeSeq, j)
              if (idx < 0) { found = n; j = n }
              else {
                val after = idx + closeSeq.length
                val ok = after >= n || html.charAt(after) == '>' ||
                  html.charAt(after).isWhitespace || html.charAt(after) == '/'
                if (ok) found = idx else j = idx + 1
              }
            }
            val contentEnd = if (found < 0) n else found
            insertRawText(el, html.substring(i, math.min(contentEnd, n)),
              decode = isDecodedRawText(name))
            if (found >= 0 && found < n) {
              val gt = html.indexOf('>', found)
              i = if (gt < 0) n else gt + 1
            } else i = n
          }
        } else {
          text.append(c); i += 1
        }
      }
    }
    flushText()
    new HDocument(preamble.result(), root)
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    var i = from
    val max = hay.length - needle.length
    while (i <= max) {
      if (hay.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Parse a start tag beginning right after '<'. Returns
    * (lowercased name, attrs-or-null-when-none, selfClosing, index after
    * '>'). Names are interned (Names.lowerName) and the attr buffer is only
    * allocated when a first attribute actually appears — most tags carry
    * none.
    */
  private def parseTag(
      html: String,
      start: Int): (String, ArrayBuffer[(String, String)], Boolean, Int) = {
    val n = html.length
    var i = start
    while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>' &&
      html.charAt(i) != '/') i += 1
    val name = Names.lowerName(html, start, i)
    var attrs: ArrayBuffer[(String, String)] = null
    var selfClosing = false
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          i += 1
          if (i < n && html.charAt(i) == '>') { selfClosing = true; i += 1; done = true }
        case _ =>
          // attribute name
          val ns = i
          while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '=' &&
            html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val aname = Names.lowerName(html, ns, i)
          var avalue = ""
          var hasValue = false
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n) {
              val q = html.charAt(i)
              if (q == '"' || q == '\'') {
                i += 1
                val vs = i
                while (i < n && html.charAt(i) != q) i += 1
                avalue = html.substring(vs, math.min(i, n))
                if (i < n) i += 1
              } else {
                val vs = i
                while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
                avalue = html.substring(vs, i)
              }
              hasValue = true
            }
          }
          if (aname.nonEmpty && (attrs == null || !attrs.exists(_._1 == aname))) {
            if (attrs == null) attrs = new ArrayBuffer[(String, String)](4)
            attrs += ((aname, if (hasValue) Entities.decode(avalue) else ""))
          }
      }
    }
    (name, attrs, selfClosing, i)
  }
}
