package graft.crawl

import graft.extract.LinkExtractor
import graft.glob.{CompiledGlob, Glob, GlobSet}
import graft.url.UrlNorm

/** In-memory transliteration of the reference's sequential FIFO crawl loop
  * (/root/reference/crawler.go:257-464) over a url→html map standing in for
  * the web. This is the ORACLE the Spark wave scheduler is equivalence-tested
  * against (SURVEY.md §5 item 3) — it is never used at scale.
  */
final case class CrawlParams(
    startUrl: String = "",
    urlList: Seq[String] = Nil,
    isUrlListMode: Boolean = false,
    pageLimit: Int = 0,
    matchPatterns: Seq[String] = Nil,
    followPatterns: Seq[String] = Nil,
    /** false = multi-host frontier (engine's sameHostOnly=false mode). */
    sameHostOnly: Boolean = true,
    /** host → disallowed path prefixes (engine's useRobots rule set). */
    robots: Map[String, Seq[String]] = Map.empty)

final case class RefResult(
    savedUrls: Vector[String], // save order
    fetchedUrls: Vector[String], // fetch order (incl. fetch errors' attempts)
    visited: Set[String],
    visitDepth: Map[String, Int], // BFS depth of each enqueued url
    stopReason: String)

object RefCrawler {

  def crawl(web: Map[String, String], params: CrawlParams): RefResult = {
    val matchGlobs: Seq[CompiledGlob] = params.matchPatterns.map(Glob.compileOrThrow)
    val followGlobs: Seq[CompiledGlob] = params.followPatterns.map(Glob.compileOrThrow)

    val visited = scala.collection.mutable.HashSet[String]()
    val depthOf = scala.collection.mutable.HashMap[String, Int]()
    var queue = scala.collection.immutable.Queue[String]()
    val saved = Vector.newBuilder[String]
    val fetched = Vector.newBuilder[String]
    var nSaved = 0
    var stopReason = "Completed"

    val startHost =
      if (params.isUrlListMode) "" else UrlNorm.hostnameOf(normalizeOrThrow(params.startUrl))

    if (params.isUrlListMode) {
      // order-kept first-wins dedup (crawler.go:280-295)
      params.urlList.foreach { raw =>
        UrlNorm.normalize(raw) match {
          case Right(norm) if !visited.contains(norm) =>
            queue = queue.enqueue(norm)
            visited += norm
            depthOf(norm) = 0
          case _ =>
        }
      }
    } else {
      val norm = normalizeOrThrow(params.startUrl)
      queue = queue.enqueue(norm)
      visited += norm
      depthOf(norm) = 0
    }

    var break = false
    while (queue.nonEmpty && !break) {
      val (current, rest) = queue.dequeue
      queue = rest

      if (params.pageLimit > 0 && nSaved >= params.pageLimit) {
        stopReason = s"Page limit reached (${params.pageLimit})"
        break = true
      } else {
        web.get(current) match {
          case None =>
            // non-critical fetch error → skip (crawler.go:389-390)
            fetched += current
          case Some(html) if html.trim.isEmpty =>
            // empty HTML → fetch error → skip (fetcher.go:93-95)
            fetched += current
          case Some(html) =>
            fetched += current
            val path = UrlNorm.pathOf(current)
            if (GlobSet.shouldProcess(matchGlobs, path)) {
              saved += current
              nSaved += 1
            }
            if (!params.isUrlListMode) {
              val curHost = UrlNorm.hostnameOf(current)
              if (!params.sameHostOnly || curHost == startHost) {
                val links = LinkExtractor.extract(current, startHost, html, followGlobs,
                  allHosts = !params.sameHostOnly)
                links.foreach { link =>
                  val allowed = params.robots.get(UrlNorm.hostnameOf(link)) match {
                    case Some(prefixes) =>
                      val p = UrlNorm.pathOf(link)
                      !prefixes.exists(p.startsWith)
                    case None => true
                  }
                  if (allowed && !visited.contains(link)) {
                    visited += link
                    depthOf(link) = depthOf(current) + 1
                    queue = queue.enqueue(link)
                  }
                }
              }
            }
        }
      }
    }

    RefResult(saved.result(), fetched.result(), visited.toSet, depthOf.toMap, stopReason)
  }

  private def normalizeOrThrow(u: String): String =
    UrlNorm.normalize(u).fold(e => throw new IllegalArgumentException(e), identity)
}
