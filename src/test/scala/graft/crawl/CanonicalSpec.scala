package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{CorpusGen, CorpusSpec}
import graft.extract.{LinkExtractor, Processor}
import graft.html.HtmlParser

/** `<link rel="canonical">` support: the parse grammar, the corpus
  * encode/decode agreement across both raw spellings, and the
  * canonical-aware dedup fold's invariants.
  */
class CanonicalSpec extends AnyFunSuite {

  private def canon(html: String): Option[String] =
    Processor.canonicalOf(HtmlParser.parse(html))

  test("canonical parse: rel token list, case, first wins, other rels ignored") {
    def page(head: String) = s"""<html><head>$head</head><body>x</body></html>"""
    assert(canon(page("""<link rel="canonical" href="http://h.test/a">""")) == Some("http://h.test/a"))
    assert(canon(page("""<link REL="Canonical" HREF="/b">""")) == Some("/b"))
    // rel is a whitespace-separated token list
    assert(canon(page("""<link rel="alternate canonical" href="/c">""")) == Some("/c"))
    // first canonical wins
    assert(canon(page("""<link rel="canonical" href="/d"><link rel="canonical" href="/e">""")) == Some("/d"))
    // other link relations and empty hrefs are ignored
    assert(canon(page("""<link rel="stylesheet" href="/site.css">""")).isEmpty)
    assert(canon(page("""<link rel="canonical" href="  ">""")).isEmpty)
    assert(canon(page("""<a rel="canonical" href="/f">x</a>""")).isEmpty)
  }

  test("corpus encode/decode agreement: resolved canonicals equal canonicalTargetOf") {
    val spec = CorpusSpec(nHosts = 4, totalPages = 600, seed = 23L)
    var cross = 0
    var self = 0
    for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h)
         if !CorpusGen.isEmptyPage(spec, h, i)) {
      val url = CorpusGen.pageUrl(h, i)
      val got = canon(CorpusGen.pageHtml(spec, h, i))
        .flatMap(raw => LinkExtractor.resolveAccepted(
          url, raw, graft.url.UrlNorm.hostnameOf(url), allHosts = false))
        .getOrElse("")
      val truth = CorpusGen.canonicalTargetOf(spec, h, i)
      assert(got == truth, s"h=$h i=$i")
      if (truth.nonEmpty && truth != url) cross += 1
      if (truth == url) self += 1
    }
    // both classes present at this size
    assert(cross > 3 && self > 3, s"cross=$cross self=$self")
  }

  test("canonical fold: partition invariants and the collapse engages") {
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.CrawlQueries.canonicalFold(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // every live page appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
    // group_size is consistent: it equals the member count of its rep
    val byRep = rows.groupBy(_._2)
    rows.foreach { case (_, rep, gs) => assert(gs == byRep(rep).length.toLong) }
    // the collapse engages: some multi-member group exists, and
    // self-canonical pages are their own rep
    assert(rows.exists(_._3 > 1L))
    val spec = CorpusGen.specFor(sf)
    val selfCanon = (for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h)
      if CorpusGen.canonicalTargetOf(spec, h, i) == CorpusGen.pageUrl(h, i) &&
        CorpusGen.canonicalTargetOf(spec, h, i).nonEmpty)
      yield CorpusGen.pageUrl(h, i)).toSet
    assert(selfCanon.nonEmpty)
    rows.filter(r => selfCanon(r._1)).foreach { case (u, rep, _) => assert(rep == u) }
  }
}
