package graft.url

/** Tracking-parameter scrubbing — the URL-canonicalization step a
  * production crawl/dedup pipeline runs BEYOND RFC normalization: the same
  * document is advertised under urls differing only in analytics params
  * (utm_* and friends) and in query-parameter ORDER, and a frontier that
  * treats those as distinct pages re-fetches the corpus many times over.
  *
  * Scrub = parse ([[GoUrl]], the same Go-parity parser the normalizer
  * uses), drop parameters whose name is a known tracking key (the
  * widely-documented utm_* convention plus the common click-id params),
  * sort the survivors by (name, value), and re-serialize. Pure function of
  * the url string — partitioning-independent, usable as a map-side column
  * expression at any scale.
  */
object UrlScrub {

  /** Click-id / subscriber-id params matched exactly (case-insensitive). */
  val TrackingExact: Set[String] =
    Set("fbclid", "gclid", "msclkid", "ref", "mc_eid", "igshid")

  /** A parameter name is tracking if it carries the utm_ prefix or is one
    * of the click-id names, case-insensitively.
    */
  def isTracking(key: String): Boolean = {
    val k = key.toLowerCase
    k.startsWith("utm_") || TrackingExact.contains(k)
  }

  /** Scrubbed form of a url: tracking params dropped, survivors sorted by
    * (name, value), '?' dropped when nothing survives. Unparseable urls
    * and urls without a query pass through unchanged. Raw parameter bytes
    * are preserved verbatim (no decode/re-encode round trip); a bare key
    * with no '=' stays bare.
    */
  def scrub(url: String): String = GoUrl.parse(url) match {
    case Left(_) => url
    case Right(u) =>
      if (u.rawQuery.isEmpty) url
      else {
        val kept = u.rawQuery.split("&").toSeq.filter(_.nonEmpty)
          .map { p =>
            val i = p.indexOf('=')
            if (i < 0) (p, None) else (p.take(i), Some(p.drop(i + 1)))
          }
          .filterNot { case (k, _) => isTracking(k) }
          .sortBy { case (k, v) => (k, v.getOrElse("")) }
        val q = kept.map {
          case (k, Some(v)) => s"$k=$v"
          case (k, None)    => k
        }.mkString("&")
        u.copy(rawQuery = q, forceQuery = false).toUrlString
      }
  }
}
