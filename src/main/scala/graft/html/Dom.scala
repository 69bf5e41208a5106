package graft.html

import scala.collection.mutable.ArrayBuffer

/** Minimal mutable DOM for the H1-H3 substrate (SURVEY.md §2.9): anchor
  * iteration in document order, tag removal, CSS-selector slicing, and
  * outer-HTML serialization. Modeled on the behavior of golang.org/x/net/html
  * as used by goquery in the reference (/root/reference/crawler.go:487,
  * /root/reference/processor.go:32-84).
  */
sealed trait HNode {
  var parent: HElement = _
  def remove(): Unit = {
    val p = parent
    if (p != null) {
      // identity scan: HNode equality IS identity (no equals override), and
      // ArrayBuffer's -= routes every compare through the generic
      // BoxesRunTime.equals dispatch — this runs per removed node in every
      // readability clean pass
      val i = p.indexOfChild(this)
      if (i >= 0) p.children.remove(i): Unit
      parent = null
    }
  }
}

final class HText(var data: String) extends HNode
final class HComment(var data: String) extends HNode
final class HDoctype(var data: String) extends HNode

final class HElement(val tag: String) extends HNode {
  // attrs are lazily allocated: most elements carry none, and the buffer +
  // backing array were the largest per-element allocations in the parse path
  private[this] var _attrs: ArrayBuffer[(String, String)] = null
  // initial capacity 4, not ArrayBuffer's default 16: the buffer is
  // allocated per element and most elements have few children
  val children: ArrayBuffer[HNode] = new ArrayBuffer[HNode](4)

  def attrs: ArrayBuffer[(String, String)] = {
    if (_attrs == null) _attrs = new ArrayBuffer[(String, String)](4)
    _attrs
  }
  def attrs_=(a: ArrayBuffer[(String, String)]): Unit = _attrs = a
  /** Null when the element has no attr buffer — the allocation-free view for
    * read-only hot paths (serializer, readability attr scans).
    */
  def attrsOrNull: ArrayBuffer[(String, String)] = _attrs

  def attr(name: String): Option[String] = Option(attrOrNull(name))

  /** Allocation-free attribute lookup for hot paths. */
  def attrOrNull(name: String): String = {
    val a = _attrs
    if (a == null) return null
    var i = 0
    while (i < a.length) {
      if (a(i)._1 == name) return a(i)._2
      i += 1
    }
    null
  }

  /** Identity indexOf over children: HNode equality IS identity, so this is
    * exactly `children.indexOf(n)` minus the generic equals dispatch.
    */
  def indexOfChild(n: HNode): Int = {
    var i = 0
    val cs = children
    while (i < cs.length) {
      if (cs(i) eq n) return i
      i += 1
    }
    -1
  }

  /** Pre-order recursive walk over element descendants — cheaper than the
    * lazy [[descendants]] iterator for full-tree scans (no stack/iterator
    * allocation). Do not mutate the tree during the walk.
    */
  def foreachElement(f: HElement => Unit): Unit = {
    var i = 0
    val cs = children
    while (i < cs.length) {
      cs(i) match {
        case e: HElement => f(e); e.foreachElement(f)
        case _           =>
      }
      i += 1
    }
  }

  def setAttr(name: String, value: String): Unit = {
    val a = attrs
    val i = a.indexWhere(_._1 == name)
    if (i >= 0) a(i) = (name, value) else a += ((name, value))
  }

  def removeAttr(name: String): Unit = {
    val a = _attrs
    if (a == null) return
    var i = 0
    while (i < a.length) {
      if (a(i)._1 == name) { a.remove(i): Unit; return }
      i += 1
    }
  }

  def id: String = attr("id").getOrElse("")
  def className: String = attr("class").getOrElse("")
  def classes: Seq[String] =
    className.split("\\s+").toIndexedSeq.filter(_.nonEmpty)

  private def detach(n: HNode): Unit = {
    val p = n.parent
    if (p != null) {
      val i = p.indexOfChild(n)
      if (i >= 0) p.children.remove(i): Unit
    }
  }

  def appendChild(n: HNode): Unit = {
    detach(n)
    n.parent = this
    children += n
  }

  def insertBefore(n: HNode, ref: HNode): Unit = {
    detach(n)
    val i = indexOfChild(ref)
    n.parent = this
    if (i < 0) children += n else children.insert(i, n)
  }

  /** Replace this element by another, moving the children. */
  def replaceWithTag(newTag: String): HElement = {
    val e = new HElement(newTag)
    e.attrs = if (_attrs == null) null else _attrs.clone()
    children.toVector.foreach(e.appendChild)
    children.clear()
    if (parent != null) {
      val i = parent.indexOfChild(this)
      e.parent = parent
      parent.children(i) = e
      parent = null
    }
    e
  }

  /** Pre-order document-order traversal of element descendants. */
  def descendants: Iterator[HElement] = new Iterator[HElement] {
    private val stack = scala.collection.mutable.Stack[HNode]()
    children.reverseIterator.foreach(stack.push)
    private var nextElem: HElement = advance()
    private def advance(): HElement = {
      while (stack.nonEmpty) {
        stack.pop() match {
          case e: HElement =>
            e.children.reverseIterator.foreach(stack.push)
            return e
          case _ =>
        }
      }
      null
    }
    def hasNext: Boolean = nextElem != null
    def next(): HElement = {
      val r = nextElem; nextElem = advance(); r
    }
  }

  def selfAndDescendants: Iterator[HElement] = Iterator(this) ++ descendants

  /** Concatenated text content (no normalization). */
  def text: String = {
    val sb = new StringBuilder
    def walk(e: HElement): Unit = {
      var i = 0
      val cs = e.children
      while (i < cs.length) {
        cs(i) match {
          case t: HText     => sb.append(t.data): Unit
          case c: HElement  => walk(c)
          case _            =>
        }
        i += 1
      }
    }
    walk(this)
    sb.toString
  }

  def innerHtml: String = {
    val sb = new StringBuilder
    children.foreach(c => HtmlSerializer.render(c, sb))
    sb.toString
  }

  def outerHtml: String = {
    val sb = new StringBuilder
    HtmlSerializer.render(this, sb)
    sb.toString
  }

  def find(selector: String): Vector[HElement] = Selector.select(this, selector)
  def findFirst(selector: String): Option[HElement] = find(selector).headOption

  /** goquery-style Find(sel).Remove() over the subtree. */
  def removeAll(selector: String): Int = {
    val hits = find(selector)
    hits.foreach(_.remove())
    hits.size
  }
}

/** A parsed document: root <html> element plus any leading doctype/comments
  * preserved for serialization.
  */
final class HDocument(val preamble: Vector[HNode], val root: HElement) {
  def head: Option[HElement] = root.children.collectFirst {
    case e: HElement if e.tag == "head" => e
  }
  def body: Option[HElement] = root.children.collectFirst {
    case e: HElement if e.tag == "body" => e
  }
  def find(selector: String): Vector[HElement] = {
    // includes the root itself when it matches (goquery matches from root)
    Selector.selectWithSelf(root, selector)
  }
  def findFirst(selector: String): Option[HElement] = find(selector).headOption
  def removeAll(selector: String): Int = {
    val hits = find(selector)
    hits.foreach(_.remove())
    hits.size
  }
  /** Remove every element whose tag is in `names` — one traversal, no
    * selector machinery. Equivalent to sequential removeAll over plain tag
    * selectors (tag sets are disjoint; nested hits detach with their
    * ancestors either way).
    */
  def removeTags(names: Set[String]): Int = removeTags(names.contains _)

  /** Predicate form of [[removeTags]] — hot callers pass a string-literal
    * match (compiled to a hashCode lookupswitch) instead of paying a
    * hash-trie Set lookup per element.
    */
  def removeTags(isTarget: String => Boolean): Int = {
    val hits = Vector.newBuilder[HElement]
    if (isTarget(root.tag)) hits += root
    root.foreachElement(e => if (isTarget(e.tag)) hits += e)
    val v = hits.result()
    v.foreach(_.remove())
    v.size
  }
  /** Merge adjacent text-node siblings. Node removal can leave two HText
    * siblings where a serialize→re-parse round trip (the reference pipeline:
    * goquery doc.Html() → readability.FromReader) would yield one — and
    * downstream whitespace collapse is sensitive to that boundary. Run after
    * mutating removals when the tree is consumed DOM-directly.
    */
  def mergeAdjacentText(): Unit = {
    def walk(e: HElement): Unit = {
      var i = 0
      while (i < e.children.length - 1) {
        (e.children(i), e.children(i + 1)) match {
          case (a: HText, b: HText) =>
            a.data = a.data + b.data
            b.parent = null
            e.children.remove(i + 1): Unit
          case _ => i += 1
        }
      }
      e.children.foreach { case c: HElement => walk(c); case _ => }
    }
    walk(root)
  }
  /** Full-document serialization (goquery.OuterHtml(doc.Selection)). */
  def outerHtml: String = {
    val sb = new StringBuilder
    preamble.foreach(n => HtmlSerializer.render(n, sb))
    HtmlSerializer.render(root, sb)
    sb.toString
  }
  /** Exactly `outerHtml.length` in one allocation-free walk — the pre-filter
    * acceptance test compares serialized length against the raw html, and
    * building the full string for a length compare is the single largest
    * per-page allocation in the extraction kernel.
    */
  def outerHtmlLength: Long = {
    var n = 0L
    preamble.foreach(p => n += HtmlSerializer.renderLength(p))
    n + HtmlSerializer.renderLength(root)
  }
}

object HtmlSerializer {
  val voidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  /** Raw-text elements whose children are rendered unescaped. */
  val rawTextElements: Set[String] =
    Set("script", "style", "iframe", "noembed", "noframes", "noscript", "plaintext", "xmp")

  /** `voidElements.contains(t)` as a string-literal match — scalac emits a
    * hashCode lookupswitch + one equals, cheaper than the hash-trie Set walk
    * this predicate paid per element per render/renderLength visit. Pinned
    * ≡ the set by SerializerLengthSpec.
    */
  @inline def isVoid(t: String): Boolean = t match {
    case "area" | "base" | "br" | "col" | "embed" | "hr" | "img" | "input" |
        "link" | "meta" | "param" | "source" | "track" | "wbr" => true
    case _ => false
  }

  /** `rawTextElements.contains(t)` as a string-literal match (see isVoid). */
  @inline def isRawText(t: String): Boolean = t match {
    case "script" | "style" | "iframe" | "noembed" | "noframes" |
        "noscript" | "plaintext" | "xmp" => true
    case _ => false
  }

  def escapeText(s: String): String = {
    val sb = new StringBuilder(s.length)
    escapeInto(s, sb)
    sb.toString
  }

  /** Escape `s` directly into `sb` — plain runs are appended in one call,
    * and text with nothing to escape (the overwhelmingly common case in the
    * serializer hot path) costs a single scan and zero intermediate
    * allocations.
    */
  def escapeInto(s: String, sb: StringBuilder): Unit = {
    // NB: range-appends go through `underlying` — scala.StringBuilder has no
    // (CharSequence, from, until) overload and would silently auto-tuple.
    val jsb = sb.underlying
    var start = 0
    var i = 0
    while (i < s.length) {
      val rep: String = s.charAt(i) match {
        case '&'  => "&amp;"
        case '\'' => "&#39;"
        case '<'  => "&lt;"
        case '>'  => "&gt;"
        case '"'  => "&#34;"
        case _    => null
      }
      if (rep != null) {
        if (i > start) jsb.append(s, start, i)
        jsb.append(rep)
        start = i + 1
      }
      i += 1
    }
    if (start == 0) jsb.append(s)
    else if (start < s.length) jsb.append(s, start, s.length)
    ()
  }

  /** Length `escapeInto(s, sb)` would append, without appending. */
  def escapeLength(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      n += (s.charAt(i) match {
        case '&' | '\'' | '"' => 5 // &amp; &#39; &#34;
        case '<' | '>'        => 4 // &lt; &gt;
        case _                => 1
      })
      i += 1
    }
    n
  }

  /** Length [[render]] would append, without building the string — must
    * mirror render branch for branch (pinned by SerializerLengthSpec over
    * every corpus page and golden fixture).
    */
  def renderLength(n: HNode): Long = n match {
    case t: HText =>
      if (t.parent != null && isRawText(t.parent.tag)) t.data.length.toLong
      else escapeLength(t.data)
    case c: HComment => 7L + c.data.length // <!-- -->
    case d: HDoctype => 11L + d.data.length // <!DOCTYPE >
    case e: HElement =>
      var len = 2L + e.tag.length // < >
      val as = e.attrsOrNull
      if (as != null) {
        var i = 0
        while (i < as.length) {
          val (k, v) = as(i)
          len += 4L + k.length + escapeLength(v) // space k =" v "
          i += 1
        }
      }
      if (!isVoid(e.tag)) {
        var j = 0
        val cs = e.children
        while (j < cs.length) { len += renderLength(cs(j)); j += 1 }
        len += 3L + e.tag.length // </ tag >
      }
      len
  }

  def render(n: HNode, sb: StringBuilder): Unit = n match {
    case t: HText =>
      if (t.parent != null && isRawText(t.parent.tag))
        sb.append(t.data)
      else escapeInto(t.data, sb)
    case c: HComment =>
      sb.append("<!--").append(c.data).append("-->")
    case d: HDoctype =>
      sb.append("<!DOCTYPE ").append(d.data).append(">")
    case e: HElement =>
      sb.append('<').append(e.tag)
      val as = e.attrsOrNull
      if (as != null) {
        var i = 0
        while (i < as.length) {
          val kv = as(i)
          sb.append(' ').append(kv._1).append("=\"")
          escapeInto(kv._2, sb)
          sb.append('"')
          i += 1
        }
      }
      sb.append('>')
      if (!isVoid(e.tag)) {
        var j = 0
        val cs = e.children
        while (j < cs.length) { render(cs(j), sb); j += 1 }
        sb.append("</").append(e.tag).append('>')
      }
  }
}
