package graft.crawl

/** From-scratch RFC 9309 (Robots Exclusion Protocol — public IETF spec)
  * robots.txt BODY parser: turns the text a crawler fetches from
  * `http://host/robots.txt` into the ordered (verdict, pattern) rule list
  * applicable to one crawler product token. This is the acquisition step
  * in front of the [[Robots9309]] longest-match MATCHER — together they
  * form the production robots pipeline (fetch → parse → per-host rules
  * table → gate), where the reference has no robots support at all.
  *
  * Grammar handled (RFC 9309 §2.1–2.2):
  *   - `#` comments (anywhere in a line) and blank lines
  *   - `key : value` lines, key matched case-insensitively, whitespace
  *     around both tolerated; lines without a `:` are ignored
  *   - groups = one or more CONSECUTIVE `user-agent` lines followed by
  *     their rule lines; any other significant line between two
  *     user-agent lines splits them into separate groups
  *   - group selection (§2.2.1): a group token applies when it is `*` or
  *     a case-insensitive PREFIX of the crawler's product token; the
  *     longest applicable token wins, `*` is only the fallback, and the
  *     rules of ALL groups carrying the winning token merge (the
  *     most-specific-group practice of the public Google REP matcher)
  *   - `allow` / `disallow` lines with non-empty values become rules in
  *     body line order; an empty `disallow:` carries no rule (§2.2.2);
  *     unknown directives (`crawl-delay`, `sitemap`, …) are skipped but
  *     still terminate a user-agent run
  *   - rules appearing before any user-agent line belong to no group and
  *     are ignored
  *
  * Every branch above is deliberately expressible in plain SQL string
  * functions — the driver's DuckDB oracle replays this parse line by line
  * (SparkEntry.robotsParseCtes), so the semantics are pinned end to end.
  */
object RobotsParser {

  /** The engine's product token (what a crawl presents as User-agent). */
  val Ua = "graftbot"

  private final case class Kv(lineNo: Int, key: String, value: String)

  /** Lex the body: strip `#` comments, trim, drop empty lines, split on
    * the FIRST `:` into (lowercased key, trimmed value). A line whose `:`
    * is absent or leading carries no directive and is dropped entirely —
    * it does not split user-agent runs.
    */
  private def lex(body: String): Vector[Kv] = {
    val out = Vector.newBuilder[Kv]
    var no = 0
    body.split("\n", -1).foreach { raw =>
      no += 1
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val k = line.substring(0, colon).trim.toLowerCase
          val v = line.substring(colon + 1).trim
          if (k.nonEmpty) out += Kv(no, k, v)
        }
      }
    }
    out.result()
  }

  /** Agent product token of a user-agent line value: everything up to the
    * first space, lowercased (`"GraftBot 2.0"` names token `graftbot`).
    */
  def agentToken(value: String): String = {
    val sp = value.indexOf(' ')
    (if (sp >= 0) value.substring(0, sp) else value).toLowerCase
  }

  /** Group-tagged directive lines + the set of group ids the winning token
    * selects for `ua` (empty when no group applies — not even `*`).
    */
  private def winningGroups(body: String, ua: String): (Vector[(Int, Kv)], Set[Int]) = {
    val kvs = lex(body)
    // group id per line: a user-agent line starts a new group unless the
    // previous significant line was also user-agent (multi-UA groups)
    var grp = 0
    var prevKey = ""
    val tagged = kvs.map { kv =>
      if (kv.key == "user-agent" && prevKey != "user-agent") grp += 1
      prevKey = kv.key
      (grp, kv)
    }
    val uaLower = ua.toLowerCase
    val agents = tagged.collect { case (g, Kv(_, "user-agent", v)) => (g, agentToken(v)) }
    // '*' scores 0; a non-empty token scores its length when it prefixes ua
    val scored = agents.collect {
      case (g, t) if t == "*"                              => (g, t, 0)
      case (g, t) if t.nonEmpty && uaLower.startsWith(t)   => (g, t, t.length)
    }
    if (scored.isEmpty) (tagged, Set.empty)
    else {
      val best = scored.map(_._3).max
      // equal-length prefixes of one ua are the same (lowercased) token
      val winTok = scored.find(_._3 == best).get._2
      (tagged, agents.collect { case (g, t) if t == winTok => g }.toSet)
    }
  }

  /** Parse a robots.txt body; return the ORDERED (verdict, pattern) rules
    * applicable to `ua`. No applicable group (and no `*` group) ⇒ empty:
    * everything is allowed.
    */
  def parse(body: String, ua: String = Ua): Vector[(String, String)] = {
    val (tagged, winGroups) = winningGroups(body, ua)
    tagged.collect {
      case (g, Kv(_, k, v))
        if winGroups(g) && (k == "allow" || k == "disallow") && v.nonEmpty =>
        (k, v)
    }
  }

  /** The `Sitemap:` urls the body advertises, in line order. RFC 9309 §2.3
    * sitemap is an "other record" outside any group: every occurrence
    * counts regardless of user-agent lines (even before the first group),
    * and the value is an absolute url taken verbatim.
    */
  def sitemaps(body: String): Vector[String] =
    lex(body).collect { case Kv(_, "sitemap", v) if v.nonEmpty => v }

  /** The `crawl-delay` (seconds) the winning group asks of `ua` — not part
    * of RFC 9309, but the de-facto rate directive several major engines
    * honor (publicly documented by Bing and Yandex; ignored by Google).
    * First crawl-delay line among the winning groups in body order; the
    * value must be all digits (fractional or junk values are ignored, like
    * any unknown directive).
    */
  def crawlDelay(body: String, ua: String = Ua): Option[Long] = {
    val (tagged, winGroups) = winningGroups(body, ua)
    tagged.collectFirst {
      case (g, Kv(_, "crawl-delay", v))
        if winGroups(g) && v.nonEmpty && v.forall(_.isDigit) =>
        v.toLong
    }
  }
}
