package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.CorpusGen
import graft.url.UrlNorm

/** The all-gates composition crawl (parsed RFC 9309 rules + mined trap
  * blocklist + meta robots + redirects in ONE wave-engine run) equals a
  * local replay that composes every gate over the encode-side ground
  * truth — and each gate demonstrably contributes.
  */
class FullGatesSpec extends AnyFunSuite {

  test("full-gates BFS equals the composed local replay; every gate engages") {
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.CrawlQueries.fullGatesCrawl(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val spec = CorpusGen.specFor(sf)
    val pages = for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h))
      yield (h, i, CorpusGen.pageUrl(h, i))

    // gate 1: host0's parsed robots rules, longest-match verdicts
    val rules = Robots9309.compile(
      RobotsParser.parse(CorpusGen.robotsTxtBody(spec, 0)))
    def robotsOk(u: String): Boolean =
      Robots9309.allowed(rules, Robots9309.rawPathOf(u))
    // gate 2: the mined blocklist — each host's most-minted template over
    // the xlinks ground truth (n_urls desc, template asc)
    val xdsts = pages.flatMap { case (h, i, _) =>
      CorpusGen.xlinkRows(spec, h, i).map(_.dst_url) }
    val blk = xdsts.groupBy(UrlNorm.hostnameOf)
      .map { case (host, ds) =>
        host -> ds.groupBy(UrlNorm.templateOf).map { case (t, us) =>
          (t, us.distinct.size)
        }.toSeq.sortBy { case (t, n) => (-n, t) }.head._1
      }
    // gates 3+4: meta robots + redirects off the encode-side truth
    val meta = pages.map { case (h, i, u) =>
      u -> ((CorpusGen.isEmptyPage(spec, h, i), CorpusGen.metaRobotsOf(spec, h, i),
        CorpusGen.redirectTargetOf(spec, h, i)))
    }.toMap
    val links = pages.map { case (h, i, u) =>
      val (_, (_, nf), rd) = (u, meta(u)._2, meta(u)._3)
      u -> (if (rd.nonEmpty) Vector(rd)
            else if (nf == 1) Vector.empty[String]
            else CorpusGen.linkRows(spec, h, i).map(_.dst_url).toVector)
    }.toMap
    def dstOk(u: String): Boolean =
      robotsOk(u) && !blk.get(UrlNorm.hostnameOf(u)).contains(UrlNorm.templateOf(u))

    val depth = scala.collection.mutable.HashMap("http://host0.test/" -> 0L)
    var frontier = Vector("http://host0.test/")
    while (frontier.nonEmpty) {
      val next = Vector.newBuilder[String]
      frontier.foreach { u =>
        links.getOrElse(u, Nil).filter(dstOk).foreach { v =>
          if (!depth.contains(v)) { depth(v) = depth(u) + 1; next += v }
        }
      }
      frontier = next.result()
    }
    val expected = depth.map { case (u, d) =>
      val saved = meta.get(u) match {
        case Some((empty, (ni, _), rd)) =>
          if (!empty && ni == 0 && rd.isEmpty) 1L else 0L
        case None => 0L
      }
      u -> ((d, saved))
    }.toMap
    assert(got == expected)

    // every gate contributes on this corpus: some host0 url is dropped by
    // robots alone, some by the trap template, some page redirects, some
    // page is seen-but-unsaved
    val host0 = pages.collect { case (0, i, u) => (i, u) }
    assert(host0.exists { case (_, u) => !robotsOk(u) })
    assert(host0.exists { case (_, u) =>
      robotsOk(u) && blk.get("host0.test").contains(UrlNorm.templateOf(u)) })
    assert(host0.exists { case (_, u) => meta(u)._3.nonEmpty })
    assert(got.values.exists(_._2 == 0L))
  }
}
