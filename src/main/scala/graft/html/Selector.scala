package graft.html

/** CSS selector subset for H2/H3 (SURVEY.md §2.9): tag, #id, .class,
  * [attr], [attr=val], compounds, descendant / child combinators, and comma
  * groups. Matches are returned in document order (goquery Find semantics,
  * /root/reference/processor.go:36).
  */
object Selector {

  final case class Simple(
      tag: Option[String],
      id: Option[String],
      classes: Vector[String],
      attrs: Vector[(String, Option[String])]) {
    // Matching runs per element per tree scan (readability's unlikely-
    // candidate and share-widget passes) — the hottest predicate in the
    // extraction kernel. Compiled selectors are memoized process-wide, so
    // flatten the Options/Vectors once per instance and keep the per-call
    // path closure- and allocation-free.
    private[this] val tagN: String = tag.orNull
    private[this] val idN: String = id.orNull
    private[this] val classArr: Array[String] = classes.toArray
    private[this] val attrNames: Array[String] = attrs.map(_._1).toArray
    private[this] val attrVals: Array[String] = attrs.map(_._2.orNull).toArray

    def matches(e: HElement): Boolean = {
      if (tagN != null && tagN != e.tag) return false
      if (idN != null && idN != e.id) return false
      var i = 0
      while (i < classArr.length) {
        if (!hasClassToken(e, classArr(i))) return false
        i += 1
      }
      var j = 0
      while (j < attrNames.length) {
        val v = e.attrOrNull(attrNames(j))
        if (v == null) return false
        val want = attrVals(j)
        if (want != null && want != v) return false
        j += 1
      }
      true
    }
  }

  /** Whitespace-token containment without allocating a class list. */
  private def hasClassToken(e: HElement, c: String): Boolean = {
    val cn = e.attrOrNull("class")
    if (cn == null) return false
    var i = 0
    val n = cn.length
    val cl = c.length
    while (i < n) {
      while (i < n && cn.charAt(i).isWhitespace) i += 1
      val start = i
      while (i < n && !cn.charAt(i).isWhitespace) i += 1
      if (i - start == cl && cn.regionMatches(start, c, 0, cl)) return true
    }
    false
  }

  // A compound chain: simple selectors joined by combinators, right-most last.
  final case class Chain(parts: Vector[(Simple, Char)]) { // combinator BEFORE part: ' ' or '>' (NUL for first)
    // unboxed views for the match loop: Vector[(Simple, Char)] boxes the
    // Char on every access, and chainMatches runs per element per scan
    private[Selector] val partArr: Array[Simple] = parts.map(_._1).toArray
    private[Selector] val combArr: Array[Char] = parts.map(_._2).toArray
    // non-null iff the chain is a single bare tag name — readability's
    // dominant selector shape (find("img"), find("p"), …); the scan then
    // reduces to one string compare per element
    private[Selector] val bareTag: String = parts match {
      case Vector((Simple(Some(t), None, Vector(), Vector()), _)) => t
      case _                                                      => null
    }
  }

  // the selector universe is a small static set (readability internals + the
  // user's --content-selector) — compile each string once, process-wide
  private val compiled =
    new java.util.concurrent.ConcurrentHashMap[String, Either[String, Vector[Chain]]]()

  def parseGroups(selector: String): Either[String, Vector[Chain]] = {
    // get-first: skip computeIfAbsent's bin lock and lambda on the hit path
    val hit = compiled.get(selector)
    if (hit != null) hit
    else compiled.computeIfAbsent(selector, parseGroupsUncached(_))
  }

  private def parseGroupsUncached(selector: String): Either[String, Vector[Chain]] = {
    val groups = splitTop(selector, ',')
    if (groups.isEmpty || groups.exists(_.trim.isEmpty))
      return Left(s"invalid selector: '$selector'")
    val chains = Vector.newBuilder[Chain]
    for (g <- groups) {
      parseChain(g.trim) match {
        case Left(e)  => return Left(e)
        case Right(c) => chains += c
      }
    }
    Right(chains.result())
  }

  private def splitTop(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '[' => depth += 1; cur.append('[')
      case ']' => depth -= 1; cur.append(']')
      case c if c == sep && depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    out += cur.toString
    out.result()
  }

  private def parseChain(s: String): Either[String, Chain] = {
    // tokenize on whitespace and '>'
    val parts = Vector.newBuilder[(Simple, Char)]
    var i = 0
    var combinator = '\u0000'
    var first = true
    while (i < s.length) {
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i < s.length && s.charAt(i) == '>') {
        combinator = '>'
        i += 1
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
      }
      if (i < s.length) {
        val start = i
        var depth = 0
        while (i < s.length && (depth > 0 ||
          (!s.charAt(i).isWhitespace && s.charAt(i) != '>'))) {
          if (s.charAt(i) == '[') depth += 1
          if (s.charAt(i) == ']') depth -= 1
          i += 1
        }
        parseSimple(s.substring(start, i)) match {
          case Left(e)   => return Left(e)
          case Right(sp) =>
            parts += ((sp, if (first) '\u0000' else if (combinator == '>') '>' else ' '))
            first = false
            combinator = '\u0000'
        }
      }
    }
    val r = parts.result()
    if (r.isEmpty) Left(s"empty selector chain: '$s'") else Right(Chain(r))
  }

  private def parseSimple(s: String): Either[String, Simple] = {
    var tag: Option[String] = None
    var id: Option[String] = None
    val classes = Vector.newBuilder[String]
    val attrs = Vector.newBuilder[(String, Option[String])]
    var i = 0
    if (i < s.length && s.charAt(i) == '*') { i += 1 } // universal
    else if (i < s.length && (s.charAt(i).isLetter)) {
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-' ||
        s.charAt(i) == '_')) i += 1
      tag = Some(s.substring(start, i).toLowerCase)
    }
    while (i < s.length) {
      s.charAt(i) match {
        case '.' =>
          i += 1
          val start = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-' ||
            s.charAt(i) == '_')) i += 1
          if (i == start) return Left(s"invalid class in selector '$s'")
          classes += s.substring(start, i)
        case '#' =>
          i += 1
          val start = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-' ||
            s.charAt(i) == '_')) i += 1
          if (i == start) return Left(s"invalid id in selector '$s'")
          id = Some(s.substring(start, i))
        case '[' =>
          val close = s.indexOf(']', i)
          if (close < 0) return Left(s"unclosed [ in selector '$s'")
          val inner = s.substring(i + 1, close)
          val eq = inner.indexOf('=')
          if (eq < 0) attrs += ((inner.trim.toLowerCase, None))
          else {
            val name = inner.substring(0, eq).trim.toLowerCase
            var v = inner.substring(eq + 1).trim
            if (v.length >= 2 && (v.head == '"' || v.head == '\'') && v.last == v.head)
              v = v.substring(1, v.length - 1)
            attrs += ((name, Some(v)))
          }
          i = close + 1
        case _ => return Left(s"unsupported selector syntax at '${s.substring(i)}'")
      }
    }
    Right(Simple(tag, id, classes.result(), attrs.result()))
  }

  private def chainMatches(chain: Chain, e: HElement): Boolean = {
    // match right-most against e, walk ancestors for the rest
    def matchFrom(idx: Int, el: HElement): Boolean = {
      if (!chain.partArr(idx).matches(el)) return false
      if (idx == 0) return true
      chain.combArr(idx) match {
        case '>' =>
          el.parent != null && matchFrom(idx - 1, el.parent)
        case _ =>
          var p = el.parent
          while (p != null) {
            if (matchFrom(idx - 1, p)) return true
            p = p.parent
          }
          false
      }
    }
    matchFrom(chain.partArr.length - 1, e)
  }

  @inline private def anyChainMatches(chains: Array[Chain], e: HElement): Boolean = {
    var i = 0
    while (i < chains.length) {
      if (chainMatches(chains(i), e)) return true
      i += 1
    }
    false
  }

  /** All descendant matches of root, document order. */
  def select(root: HElement, selector: String): Vector[HElement] =
    parseGroups(selector) match {
      case Left(_) => Vector.empty // goquery: invalid selector panics; ref guards earlier
      case Right(chains) =>
        val out = Vector.newBuilder[HElement]
        if (chains.length == 1 && chains.head.bareTag != null) {
          val t = chains.head.bareTag
          root.foreachElement(e => if (e.tag == t) out += e)
        } else {
          val arr = chains.toArray
          root.foreachElement { e =>
            if (anyChainMatches(arr, e)) out += e
          }
        }
        out.result()
    }

  /** Matches including root itself (full-document Find). */
  def selectWithSelf(root: HElement, selector: String): Vector[HElement] =
    parseGroups(selector) match {
      case Left(_) => Vector.empty
      case Right(chains) =>
        val out = Vector.newBuilder[HElement]
        if (chains.length == 1 && chains.head.bareTag != null) {
          val t = chains.head.bareTag
          if (root.tag == t) out += root
          root.foreachElement(e => if (e.tag == t) out += e)
        } else {
          val arr = chains.toArray
          if (anyChainMatches(arr, root)) out += root
          root.foreachElement { e =>
            if (anyChainMatches(arr, e)) out += e
          }
        }
        out.result()
    }
}
