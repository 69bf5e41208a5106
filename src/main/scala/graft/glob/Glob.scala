package graft.glob

/** Glob compiler/matcher with gobwas/glob semantics, separator `/`.
  *
  * The reference compiles every --match / --follow-match pattern with
  * `glob.Compile(p, '/')` (/root/reference/crawler.go:72,:83). Pinned
  * semantics (/root/reference/crawler_test.go:304-505):
  *   - `*`  matches any run of non-separator chars (may be empty); a bare
  *     `*` therefore matches NO slash-prefixed path
  *   - `**` matches anything including separators
  *   - `?`  matches exactly one non-separator char
  *   - `[abc]` / `[a-z]` / `[!a-z]` char classes; `{a,b}` alternation
  *   - `\x` escapes a literal (e.g. `\[id\]`)
  *   - unclosed `[` / `{` is a compile error
  *
  * Compiled patterns are plain serializable case classes so they can be
  * broadcast to executors (SURVEY.md §2.2 P6).
  */
sealed trait GlobNode extends Serializable
object GlobNode {
  final case class Lit(s: String) extends GlobNode
  case object AnyNonSep extends GlobNode // *
  case object Super extends GlobNode // **
  case object One extends GlobNode // ?
  final case class Cls(ranges: Vector[(Char, Char)], negated: Boolean) extends GlobNode
  final case class Alt(branches: Vector[Vector[GlobNode]]) extends GlobNode
}

final case class CompiledGlob(nodes: Vector[GlobNode], source: String)
    extends Serializable {
  import GlobNode._

  def matches(s: String): Boolean = matchFrom(nodes, 0, s, 0)

  private def matchFrom(ns: Vector[GlobNode], ni: Int, s: String, si: Int): Boolean = {
    if (ni == ns.length) return si == s.length
    ns(ni) match {
      case Lit(lit) =>
        s.startsWith(lit, si) && matchFrom(ns, ni + 1, s, si + lit.length)
      case One =>
        si < s.length && s.charAt(si) != Glob.Sep && matchFrom(ns, ni + 1, s, si + 1)
      case Cls(ranges, neg) =>
        if (si >= s.length) false
        else {
          val c = s.charAt(si)
          val in = ranges.exists { case (lo, hi) => c >= lo && c <= hi }
          (in != neg) && matchFrom(ns, ni + 1, s, si + 1)
        }
      case AnyNonSep =>
        // try consuming 0..k non-separator chars (backtracking)
        var end = si
        while (end < s.length && s.charAt(end) != Glob.Sep) end += 1
        var i = si
        while (i <= end) {
          if (matchFrom(ns, ni + 1, s, i)) return true
          i += 1
        }
        false
      case Super =>
        var i = si
        while (i <= s.length) {
          if (matchFrom(ns, ni + 1, s, i)) return true
          i += 1
        }
        false
      case Alt(branches) =>
        val rest = ns.drop(ni + 1)
        branches.exists(b => matchFrom(b ++ rest, 0, s, si))
    }
  }
}

object Glob {
  val Sep: Char = '/'

  /** Compile, Left(message) on malformed pattern (ref errors at startup). */
  def compile(pattern: String): Either[String, CompiledGlob] =
    parseSeq(pattern, 0, topLevel = true).map { case (nodes, _) =>
      CompiledGlob(nodes, pattern)
    }

  def compileOrThrow(pattern: String): CompiledGlob =
    compile(pattern).fold(e => throw new IllegalArgumentException(e), identity)

  import GlobNode._

  /** Parses until end of input (topLevel) or an un-nested `,` / `}`. */
  private def parseSeq(
      p: String,
      start: Int,
      topLevel: Boolean): Either[String, (Vector[GlobNode], Int)] = {
    val out = Vector.newBuilder[GlobNode]
    val lit = new StringBuilder
    def flush(): Unit = {
      if (lit.nonEmpty) { out += Lit(lit.toString); lit.clear() }
    }
    var i = start
    while (i < p.length) {
      p.charAt(i) match {
        case '*' =>
          flush()
          var stars = 0
          while (i < p.length && p.charAt(i) == '*') { stars += 1; i += 1 }
          out += (if (stars >= 2) Super else AnyNonSep)
        case '?' =>
          flush(); out += One; i += 1
        case '\\' =>
          if (i + 1 >= p.length) return Left("unexpected end of input after escape")
          lit.append(p.charAt(i + 1)); i += 2
        case '[' =>
          flush()
          parseClass(p, i + 1) match {
            case Left(e)           => return Left(e)
            case Right((cls, next)) => out += cls; i = next
          }
        case '{' =>
          flush()
          parseAlt(p, i + 1) match {
            case Left(e)           => return Left(e)
            case Right((alt, next)) => out += alt; i = next
          }
        case c @ (',' | '}') if !topLevel =>
          flush()
          return Right((out.result(), i))
        case c =>
          lit.append(c); i += 1
      }
    }
    if (!topLevel) Left("unexpected end of input: unclosed '{'")
    else { flush(); Right((out.result(), i)) }
  }

  private def parseClass(p: String, start: Int): Either[String, (Cls, Int)] = {
    var i = start
    var negated = false
    if (i < p.length && (p.charAt(i) == '!' || p.charAt(i) == '^')) {
      negated = true; i += 1
    }
    val ranges = Vector.newBuilder[(Char, Char)]
    var any = false
    while (i < p.length && p.charAt(i) != ']') {
      var lo = p.charAt(i)
      if (lo == '\\' && i + 1 < p.length) { i += 1; lo = p.charAt(i) }
      if (i + 2 < p.length && p.charAt(i + 1) == '-' && p.charAt(i + 2) != ']') {
        var hi = p.charAt(i + 2)
        var next = i + 3
        if (hi == '\\' && i + 3 < p.length) { hi = p.charAt(i + 3); next = i + 4 }
        ranges += ((lo, hi)); i = next
      } else {
        ranges += ((lo, lo)); i += 1
      }
      any = true
    }
    if (i >= p.length) Left("unexpected end of input: unclosed '['")
    else if (!any) Left("empty character class")
    else Right((Cls(ranges.result(), negated), i + 1))
  }

  private def parseAlt(p: String, start: Int): Either[String, (Alt, Int)] = {
    val branches = Vector.newBuilder[Vector[GlobNode]]
    var i = start
    var done = false
    while (!done) {
      parseSeq(p, i, topLevel = false) match {
        case Left(e) => return Left(e)
        case Right((nodes, next)) =>
          branches += nodes
          if (next >= p.length) return Left("unexpected end of input: unclosed '{'")
          p.charAt(next) match {
            case ',' => i = next + 1
            case '}' => i = next + 1; done = true
            case _   => return Left("malformed alternation")
          }
      }
    }
    Right((Alt(branches.result()), i))
  }
}

/** Match-any over a compiled pattern list, with the reference's
  * empty-list semantics (SURVEY.md §2.2 P4/P5): --match with no patterns →
  * always true; --follow-match with no patterns → follow all.
  */
object GlobSet {
  def matchesAny(globs: Seq[CompiledGlob], path: String): Boolean =
    globs.exists(_.matches(path))

  /** shouldProcessContent parity (/root/reference/crawler.go:466-484). */
  def shouldProcess(matchGlobs: Seq[CompiledGlob], path: String): Boolean =
    matchGlobs.isEmpty || matchesAny(matchGlobs, graft.url.UrlNorm.pathForMatch(path))

  /** follow-match gate (/root/reference/crawler.go:520-537). */
  def shouldFollow(followGlobs: Seq[CompiledGlob], path: String): Boolean =
    followGlobs.isEmpty || matchesAny(followGlobs, graft.url.UrlNorm.pathForMatch(path))
}
