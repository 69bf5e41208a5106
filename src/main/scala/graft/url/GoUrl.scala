package graft.url

import java.nio.charset.StandardCharsets

/** Go `net/url`-parity URL value + parser/serializer/resolver.
  *
  * The reference engine (see /root/reference/crawler.go:548-590 and
  * /root/reference/crawler.go:501) normalizes and resolves every URL through
  * Go's `net/url`. Crawl-order and seen-set equivalence therefore require the
  * exact same normal form, so this module re-implements the documented
  * behavior of Go's parser: scheme detection, authority parsing, decoded
  * `path` with a `rawPath` encoding hint, per-component percent-escaping
  * tables, RFC 3986 reference resolution, and `String()` serialization.
  *
  * All behavior here derives from public documentation of `net/url`
  * (https://pkg.go.dev/net/url) and RFC 3986; it is validated against the
  * reference's own pinned test tables (crawler_test.go:27-150, :507-768).
  */
final case class GoUserinfo(username: String, password: Option[String]) {
  def encoded: String = {
    val u = GoUrl.escape(username, GoUrl.EncodeUserPassword)
    password match {
      case Some(p) => u + ":" + GoUrl.escape(p, GoUrl.EncodeUserPassword)
      case None    => u
    }
  }
}

final case class GoUrl(
    scheme: String = "",
    opaque: String = "",
    user: Option[GoUserinfo] = None,
    host: String = "",
    path: String = "", // decoded
    rawPath: String = "", // encoding hint; "" means default encoding is fine
    omitHost: Boolean = false,
    forceQuery: Boolean = false,
    rawQuery: String = "",
    fragment: String = "", // decoded
    rawFragment: String = ""
) {
  import GoUrl._

  /** Go URL.EscapedPath(): use rawPath as hint when it is a valid encoding of
    * path; otherwise re-escape the decoded path.
    */
  def escapedPath: String = {
    if (rawPath.nonEmpty && validEncoded(rawPath, EncodePath)) {
      unescape(rawPath, EncodePath) match {
        case Right(p) if p == path => return rawPath
        case _                     =>
      }
    }
    if (path == "*") "*" else escape(path, EncodePath)
  }

  def escapedFragment: String = {
    if (rawFragment.nonEmpty && validEncoded(rawFragment, EncodeFragment)) {
      unescape(rawFragment, EncodeFragment) match {
        case Right(f) if f == fragment => return rawFragment
        case _                         =>
      }
    }
    escape(fragment, EncodeFragment)
  }

  /** Go URL.Hostname(): host without port, IPv6 brackets stripped. */
  def hostname: String = splitHostPort(host)._1

  def port: String = splitHostPort(host)._2

  /** Go URL.String(). */
  def toUrlString: String = {
    val buf = new StringBuilder
    if (scheme.nonEmpty) { buf.append(scheme).append(':') }
    if (opaque.nonEmpty) {
      buf.append(opaque)
    } else {
      if (scheme.nonEmpty || host.nonEmpty || user.nonEmpty) {
        if (omitHost && host.isEmpty && user.isEmpty) {
          // omit empty host
        } else {
          if (host.nonEmpty || path.nonEmpty || user.nonEmpty) buf.append("//")
          user.foreach(ui => buf.append(ui.encoded).append('@'))
          if (host.nonEmpty) buf.append(escape(host, EncodeHost))
        }
      }
      val p = escapedPath
      if (p.nonEmpty && p.charAt(0) != '/' && host.nonEmpty) buf.append('/')
      if (buf.isEmpty) {
        // RFC 3986 §4.2: a relative path whose first segment contains a
        // colon must be prefixed with "./" so it is not read as a scheme.
        val segment = p.takeWhile(_ != '/')
        if (segment.contains(':')) buf.append("./")
      }
      buf.append(p)
    }
    if (forceQuery || rawQuery.nonEmpty) buf.append('?').append(rawQuery)
    if (fragment.nonEmpty) buf.append('#').append(escapedFragment)
    buf.toString
  }

  /** Go URL.ResolveReference (RFC 3986 §5.3). */
  def resolveReference(ref: GoUrl): GoUrl = {
    var url = ref
    if (ref.scheme.isEmpty) url = url.copy(scheme = scheme)
    if (ref.scheme.nonEmpty || ref.host.nonEmpty || ref.user.nonEmpty) {
      // absoluteURI or net_path case
      return url.withPathRaw(resolvePath(ref.escapedPath, ""))
    }
    if (ref.opaque.nonEmpty) {
      return url.copy(user = None, host = "", path = "", rawPath = "")
    }
    if (ref.path.isEmpty && !ref.forceQuery && ref.rawQuery.isEmpty) {
      url = url.copy(rawQuery = rawQuery)
      if (ref.fragment.isEmpty) {
        url = url.copy(fragment = fragment, rawFragment = rawFragment)
      }
    }
    // abs_path or rel_path case
    url
      .copy(host = host, user = user)
      .withPathRaw(resolvePath(escapedPath, ref.escapedPath))
  }

  /** Go url.Parse(ref) relative to this URL (pageURL.Parse in the ref). */
  def parseRef(ref: String): Either[String, GoUrl] =
    GoUrl.parse(ref).map(resolveReference)

  /** setPath on an escaped string; silently keeps old path on bad escapes
    * (ResolveReference in Go ignores setPath errors on already-valid input).
    */
  private def withPathRaw(p: String): GoUrl =
    unescape(p, EncodePath) match {
      case Right(decoded) =>
        val hint = if (escape(decoded, EncodePath) == p) "" else p
        copy(path = decoded, rawPath = hint)
      case Left(_) => this
    }
}

object GoUrl {
  // Escaping modes, mirroring net/url's `encoding`.
  sealed trait Mode
  case object EncodePath extends Mode
  case object EncodePathSegment extends Mode
  case object EncodeHost extends Mode
  case object EncodeZone extends Mode
  case object EncodeUserPassword extends Mode
  case object EncodeQueryComponent extends Mode
  case object EncodeFragment extends Mode

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def unhex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else c - 'A' + 10

  /** net/url shouldEscape(c byte, mode). Operates on bytes. */
  def shouldEscape(b: Byte, mode: Mode): Boolean = {
    val c = (b & 0xff).toChar
    if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))
      return false
    if (mode == EncodeHost || mode == EncodeZone) {
      c match {
        case '!' | '$' | '&' | '\'' | '(' | ')' | '*' | '+' | ',' | ';' | '=' |
            ':' | '[' | ']' | '<' | '>' | '"' =>
          return false
        case _ =>
      }
    }
    c match {
      case '-' | '_' | '.' | '~' => return false
      case '$' | '&' | '+' | ',' | '/' | ':' | ';' | '=' | '?' | '@' =>
        mode match {
          case EncodePath          => return c == '?'
          case EncodePathSegment   => return c == '/' || c == ';' || c == ',' || c == '?'
          case EncodeUserPassword  => return c == '@' || c == '/' || c == '?' || c == ':'
          case EncodeQueryComponent => return true
          case EncodeFragment      => return false
          case _                   =>
        }
      case _ =>
    }
    if (mode == EncodeFragment) {
      c match {
        case '!' | '(' | ')' | '*' => return false
        case _                     =>
      }
    }
    true
  }

  private val upperhex = "0123456789ABCDEF"

  /** net/url escape(s, mode) — byte-wise over UTF-8. */
  def escape(s: String, mode: Mode): String = {
    // Fast path: pure-ASCII input with nothing to escape returns `s` without
    // the UTF-8 byte-array allocation. For chars < 0x80 the char IS the
    // UTF-8 byte, so shouldEscape sees exactly what the byte path would.
    var k = 0
    while (k < s.length) {
      val c = s.charAt(k)
      if (c >= 0x80 || shouldEscape(c.toByte, mode)) k = s.length + 1
      else k += 1
    }
    if (k == s.length) return s
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    var spaceCount = 0
    var hexCount = 0
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      if (shouldEscape(c, mode)) {
        if (c == ' '.toByte && mode == EncodeQueryComponent) spaceCount += 1
        else hexCount += 1
      }
      i += 1
    }
    if (spaceCount == 0 && hexCount == 0) return s
    val sb = new StringBuilder(bytes.length + 2 * hexCount)
    i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      if (c == ' '.toByte && mode == EncodeQueryComponent) sb.append('+')
      else if (shouldEscape(c, mode)) {
        sb.append('%')
        sb.append(upperhex((c & 0xff) >> 4))
        sb.append(upperhex(c & 0x0f))
      } else sb.append((c & 0xff).toChar)
      i += 1
    }
    sb.toString
  }

  /** net/url unescape(s, mode); Left(msg) on invalid escapes / host bytes. */
  def unescape(s0: String, mode: Mode): Either[String, String] = {
    val s = s0
    var n = 0
    var hasPlus = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '%' =>
          n += 1
          if (i + 2 >= s.length || !isHex(s.charAt(i + 1)) || !isHex(s.charAt(i + 2))) {
            val bad = s.substring(i, math.min(i + 3, s.length))
            return Left(s"invalid URL escape \"$bad\"")
          }
          if (mode == EncodeHost && unhex(s.charAt(i + 1)) < 8 &&
            s.substring(i, i + 3) != "%25")
            return Left(s"invalid URL escape \"${s.substring(i, i + 3)}\"")
          if (mode == EncodeZone) {
            val v = ((unhex(s.charAt(i + 1)) << 4) | unhex(s.charAt(i + 2))).toByte
            if (s.substring(i, i + 3) != "%25" && v != ' '.toByte &&
              shouldEscape(v, EncodeHost))
              return Left(s"invalid URL escape \"${s.substring(i, i + 3)}\"")
          }
          i += 3
        case '+' =>
          hasPlus = mode == EncodeQueryComponent
          i += 1
        case c =>
          if ((mode == EncodeHost || mode == EncodeZone) && c < 0x80 &&
            shouldEscape(c.toByte, mode))
            return Left(s"invalid character \"$c\" in host name")
          i += 1
      }
    }
    if (n == 0 && !hasPlus) return Right(s)
    // Percent-decode over raw bytes (non-ASCII stays as UTF-8 bytes).
    val in = s.getBytes(StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(in.length)
    i = 0
    while (i < in.length) {
      in(i) match {
        case '%' =>
          val b = ((unhex(in(i + 1).toChar) << 4) | unhex(in(i + 2).toChar)).toByte
          out.write(b.toInt)
          i += 3
        case '+' =>
          out.write(if (mode == EncodeQueryComponent) ' ' else '+')
          i += 1
        case b =>
          out.write(b.toInt)
          i += 1
      }
    }
    Right(new String(out.toByteArray, StandardCharsets.UTF_8))
  }

  private def validEncoded(s: String, mode: Mode): Boolean = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '!' | '$' | '&' | '\'' | '(' | ')' | '*' | '+' | ',' | ';' | '=' |
            ':' | '@' =>
        case '[' | ']' => // ok, matching Go (for now)
        case '%'       => // ok - percent encoded, will decode
        case c =>
          // Go checks bytes: any byte >= 0x80 fails shouldEscape in path
          // modes, so non-ASCII chars invalidate the hint too.
          if (c >= 0x80 || shouldEscape(c.toByte, mode)) return false
      }
      i += 1
    }
    true
  }

  private def validOptionalPort(port: String): Boolean = {
    if (port.isEmpty) return true
    if (port.charAt(0) != ':') return false
    port.substring(1).forall(c => c >= '0' && c <= '9')
  }

  private def validUserinfo(s: String): Boolean =
    s.forall { r =>
      ('A' <= r && r <= 'Z') || ('a' <= r && r <= 'z') || ('0' <= r && r <= '9') ||
      "-._:~!$&'()*+,;=%@".indexOf(r) >= 0
    }

  def splitHostPort(hostPort: String): (String, String) = {
    var h = hostPort
    var p = ""
    val colon = h.lastIndexOf(':')
    if (colon != -1 && validOptionalPort(h.substring(colon))) {
      p = h.substring(colon + 1)
      h = h.substring(0, colon)
    }
    if (h.startsWith("[") && h.endsWith("]")) h = h.substring(1, h.length - 1)
    (h, p)
  }

  private def containsCTLByte(s: String): Boolean =
    s.exists(c => c < ' ' || c == 0x7f)

  /** net/url getScheme. Returns (scheme, rest) or error. */
  private def getScheme(raw: String): Either[String, (String, String)] = {
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (('a' <= c && c <= 'z') || ('A' <= c && c <= 'Z')) {
        // ok
      } else if (('0' <= c && c <= '9') || c == '+' || c == '-' || c == '.') {
        if (i == 0) return Right(("", raw))
      } else if (c == ':') {
        if (i == 0) return Left("missing protocol scheme")
        return Right((raw.substring(0, i).toLowerCase, raw.substring(i + 1)))
      } else {
        return Right(("", raw))
      }
      i += 1
    }
    Right(("", raw))
  }

  private def parseHostStr(host: String): Either[String, String] = {
    if (host.startsWith("[")) {
      val i = host.lastIndexOf(']')
      if (i < 0) return Left("missing ']' in host")
      val colonPort = host.substring(i + 1)
      if (!validOptionalPort(colonPort))
        return Left(s"invalid port \"$colonPort\" after host")
      val zone = host.substring(0, i).indexOf("%25")
      if (zone >= 0) {
        for {
          host1 <- unescape(host.substring(0, zone), EncodeHost)
          host2 <- unescape(host.substring(zone, i), EncodeZone)
          host3 <- unescape(host.substring(i), EncodeHost)
        } yield host1 + host2 + host3
      } else unescape(host, EncodeHost)
    } else {
      val i = host.lastIndexOf(':')
      if (i != -1) {
        val colonPort = host.substring(i)
        if (!validOptionalPort(colonPort))
          return Left(s"invalid port \"$colonPort\" after host")
      }
      unescape(host, EncodeHost)
    }
  }

  private def parseAuthority(
      authority: String): Either[String, (Option[GoUserinfo], String)] = {
    val i = authority.lastIndexOf('@')
    val hostPart = if (i < 0) authority else authority.substring(i + 1)
    parseHostStr(hostPart).flatMap { host =>
      if (i < 0) Right((None, host))
      else {
        val userinfo = authority.substring(0, i)
        if (!validUserinfo(userinfo)) Left("net/url: invalid userinfo")
        else if (!userinfo.contains(':')) {
          unescape(userinfo, EncodeUserPassword).map(u =>
            (Some(GoUserinfo(u, None)), host))
        } else {
          val idx = userinfo.indexOf(':')
          for {
            u <- unescape(userinfo.substring(0, idx), EncodeUserPassword)
            p <- unescape(userinfo.substring(idx + 1), EncodeUserPassword)
          } yield (Some(GoUserinfo(u, Some(p))), host)
        }
      }
    }
  }

  private def setPathOn(u: GoUrl, p: String): Either[String, GoUrl] =
    unescape(p, EncodePath).map { decoded =>
      val hint = if (escape(decoded, EncodePath) == p) "" else p
      u.copy(path = decoded, rawPath = hint)
    }

  /** net/url Parse (viaRequest=false), fragment split included. */
  def parse(rawURL: String): Either[String, GoUrl] = {
    val hashIdx = rawURL.indexOf('#')
    val (beforeFrag, frag) =
      if (hashIdx < 0) (rawURL, "")
      else (rawURL.substring(0, hashIdx), rawURL.substring(hashIdx + 1))
    parseInner(beforeFrag).flatMap { u =>
      if (frag.isEmpty) Right(u)
      else
        unescape(frag, EncodeFragment).map { decoded =>
          val hint = if (escape(decoded, EncodeFragment) == frag) "" else frag
          u.copy(fragment = decoded, rawFragment = hint)
        }
    }
  }

  private def parseInner(rawURL: String): Either[String, GoUrl] = {
    if (containsCTLByte(rawURL))
      return Left("net/url: invalid control character in URL")
    if (rawURL == "*") return Right(GoUrl(path = "*"))

    getScheme(rawURL).flatMap { case (scheme, rest0) =>
      var u = GoUrl(scheme = scheme)
      var rest = rest0

      if (rest.endsWith("?") && !rest.dropRight(1).contains('?')) {
        u = u.copy(forceQuery = true)
        rest = rest.dropRight(1)
      } else {
        val qIdx = rest.indexOf('?')
        if (qIdx >= 0) {
          u = u.copy(rawQuery = rest.substring(qIdx + 1))
          rest = rest.substring(0, qIdx)
        }
      }

      if (!rest.startsWith("/")) {
        if (u.scheme.nonEmpty) {
          // Rootless path per RFC 3986 is opaque.
          return Right(u.copy(opaque = rest))
        }
        val segment = rest.takeWhile(_ != '/')
        if (segment.contains(':'))
          return Left("first path segment in URL cannot contain colon")
      }

      if ((u.scheme.nonEmpty || !rest.startsWith("///")) && rest.startsWith("//")) {
        var authority = rest.substring(2)
        rest = ""
        val slash = authority.indexOf('/')
        if (slash >= 0) {
          rest = authority.substring(slash)
          authority = authority.substring(0, slash)
        }
        parseAuthority(authority) match {
          case Left(err) => return Left(err)
          case Right((user, host)) =>
            u = u.copy(user = user, host = host)
        }
      } else if (u.scheme.nonEmpty && rest.startsWith("/")) {
        u = u.copy(omitHost = true)
      }

      setPathOn(u, rest)
    }
  }

  /** net/url resolvePath: merge + remove dot segments, on escaped paths. */
  def resolvePath(base: String, ref: String): String = {
    val full: String =
      if (ref.isEmpty) base
      else if (ref.charAt(0) != '/') {
        val i = base.lastIndexOf('/')
        base.substring(0, i + 1) + ref
      } else ref
    if (full.isEmpty) return ""

    val dst = new StringBuilder
    dst.append('/')
    var first = true
    var remaining = full
    var found = true
    var elem = ""
    while (found) {
      val cut = remaining.indexOf('/')
      if (cut >= 0) {
        elem = remaining.substring(0, cut)
        remaining = remaining.substring(cut + 1)
        found = true
      } else {
        elem = remaining
        remaining = ""
        found = false
      }
      if (elem == ".") {
        first = false
      } else if (elem == "..") {
        val str = dst.substring(1)
        val index = str.lastIndexOf('/')
        dst.clear()
        dst.append('/')
        if (index == -1) first = true
        else dst.append(str.substring(0, index))
      } else {
        if (!first) dst.append('/')
        dst.append(elem)
        first = false
      }
    }
    if (elem == "." || elem == "..") dst.append('/')
    var r = dst.toString
    if (r.length > 1 && r.charAt(1) == '/') r = r.substring(1)
    r
  }
}
