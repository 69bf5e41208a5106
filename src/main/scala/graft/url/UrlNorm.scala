package graft.url

/** URL normal form + helpers (F1-F4 in SURVEY.md §2.8).
  *
  * Mirrors the reference's `normalizeURLtoString`
  * (/root/reference/crawler.go:548-590): trim; fragment stripped; scheme-less
  * hosts get `http://`; empty path on a host becomes `/`; single trailing
  * slash stripped when path length > 1. Query kept verbatim; host case not
  * folded. Pinned by the 16 cases of /root/reference/crawler_test.go:27-150.
  */
object UrlNorm {

  /** Go strings.TrimSpace (Unicode White_Space), which — unlike Java's
    * String.trim — includes NBSP-family codepoints.
    */
  def goTrimSpace(s: String): String = {
    var start = 0
    var end = s.length
    while (start < end && isGoSpace(s.charAt(start))) start += 1
    while (end > start && isGoSpace(s.charAt(end - 1))) end -= 1
    s.substring(start, end)
  }

  /** normalizeURLtoString parity. Left(reason) where the reference errors. */
  def normalize(urlString: String): Either[String, String] =
    normalizeParsed(urlString).map(_.toUrlString)

  /** The parsed normal form behind [[normalize]] — callers that need the
    * normalized STRING and its components (the link extractor's scheme/
    * host/path predicates) avoid a serialize→reparse round trip. Reusing
    * the parsed form is equivalent to reparsing the serialized one
    * (UrlNormSpec/FuzzSpec pin `parse(u.toUrlString) ≡ u` on the full
    * adversarial grid).
    */
  def normalizeParsed(urlString: String): Either[String, GoUrl] = {
    val trimmed = goTrimSpace(urlString)
    if (trimmed.isEmpty)
      return Left("input URL string is empty or only whitespace")

    GoUrl.parse(trimmed) match {
      case Left(err) => Left(s"failed to parse URL for normalization: $err")
      case Right(parsed0) =>
        var parsed = parsed0
        if (parsed.scheme.isEmpty && parsed.host.isEmpty && parsed.path.isEmpty &&
          parsed.rawQuery.isEmpty && parsed.fragment.nonEmpty)
          return Left("input URL is effectively only a fragment, cannot normalize")

        if (parsed.scheme.isEmpty && parsed.host.nonEmpty) {
          if (!parsed.host.contains(':') &&
            (trimmed.startsWith("//") || !trimmed.exists(c => c == '/' || c == '?' || c == '#'))) {
            GoUrl.parse("http://" + trimmed) match {
              case Right(withScheme) => parsed = withScheme
              case Left(_)           =>
            }
          }
        }
        // Scheme-less host+path like "example.com/foo"
        if (parsed.scheme.isEmpty && parsed.host.isEmpty && parsed.path.nonEmpty &&
          !trimmed.startsWith("/") && parsed.path.contains('.')) {
          GoUrl.parse("http://" + trimmed) match {
            case Right(withScheme) => parsed = withScheme
            case Left(_)           =>
          }
        }

        parsed = parsed.copy(fragment = "", rawFragment = "")

        if (parsed.host.nonEmpty && parsed.path.isEmpty)
          parsed = parsed.copy(path = "/")

        if (parsed.path.length > 1 && parsed.path.endsWith("/"))
          parsed = parsed.copy(path = parsed.path.dropRight(1))

        Right(parsed)
    }
  }

  /** Go White_Space \u2014 ONE definition shared by [[goTrimSpace]] and the
    * [[normalizeResolved]] fast-path guard (they must agree for the
    * trailing-whitespace fallback to be sound).
    */
  @inline private def isGoSpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u0085' || c == '\u00A0' ||
      c == '\u2007' || c == '\u202F'

  /** [[normalizeParsed]] over an ALREADY-PARSED absolute url — the link
    * extractor's per-href hot path (resolve → normalize → predicates). The
    * string formulation `normalizeParsed(u.toUrlString)` serializes and
    * fully re-parses every href; that round trip is the identity except
    * where `goTrimSpace` could bite (a raw query/opaque tail ending in Go
    * whitespace — everything else serializes escaped) or where the
    * scheme-less repair branches could fire, so those cases fall back to
    * the string path and everything else applies the normalize steps
    * directly to the parsed form. Pinned ≡ the string path over the
    * adversarial href grid by NormalizeResolvedSpec.
    */
  def normalizeResolved(u: GoUrl): Either[String, GoUrl] = {
    val fastSafe = u.scheme.nonEmpty && u.host.nonEmpty && u.opaque.isEmpty &&
      (u.path.isEmpty || u.path.charAt(0) == '/') &&
      (u.fragment.nonEmpty || u.rawQuery.isEmpty ||
        !isGoSpace(u.rawQuery.charAt(u.rawQuery.length - 1)))
    if (!fastSafe) normalizeParsed(u.toUrlString)
    else {
      var parsed = u.copy(fragment = "", rawFragment = "")
      if (parsed.path.isEmpty) parsed = parsed.copy(path = "/")
      if (parsed.path.length > 1 && parsed.path.endsWith("/"))
        parsed = parsed.copy(path = parsed.path.dropRight(1))
      Right(parsed)
    }
  }

  /** Path canonicalization used by --match / --follow-match predicates
    * (/root/reference/crawler.go:470-475, :522-527): "" → "/", force a
    * leading "/".
    */
  def pathForMatch(path: String): String =
    if (path.isEmpty) "/"
    else if (!path.startsWith("/")) "/" + path
    else path

  /** Hostname of an (already normalized) URL string; "" on parse failure. */
  def hostnameOf(urlStr: String): String =
    GoUrl.parse(urlStr).map(_.hostname).getOrElse("")

  /** Decoded path of an (already normalized) URL string. */
  def pathOf(urlStr: String): String =
    GoUrl.parse(urlStr).map(_.path).getOrElse("")

  /** Crawler-trap url template: everything after the authority with every
    * ASCII digit run collapsed to `N` — byte-identical to the SQL recipe
    * `regexp_replace(regexp_extract(url, '^https?://[^/]+(.*)$', 1),
    * '[0-9]+', 'N', 'g')` so the mined blocklist, the kernel gate, and the
    * DuckDB oracle all speak the same key.
    */
  def templateOf(url: String): String = {
    val i0 = url.indexOf("://")
    val start =
      if (i0 < 0) 0
      else {
        val s = url.indexOf('/', i0 + 3)
        if (s < 0) url.length else s
      }
    val sb = new java.lang.StringBuilder(url.length - start)
    var i = start
    var inDigits = false
    while (i < url.length) {
      val c = url.charAt(i)
      if (c >= '0' && c <= '9') {
        if (!inDigits) { sb.append('N'); inDigits = true }
      } else {
        inDigits = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
