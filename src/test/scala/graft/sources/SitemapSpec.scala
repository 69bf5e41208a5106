package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{CorpusGen, CorpusSpec}

class SitemapSpec extends AnyFunSuite {

  private val spec = CorpusSpec(nHosts = 3, totalPages = 90, seed = 7L)

  test("urlset parse: trimmed locs, optional lastmod, ghost entry present") {
    val body = CorpusGen.sitemapUrlsetBody(1, Seq(0, 2, 4, 8))
    val entries = Sitemap.parseUrlset(body)
    // idx 0 and 8 are whitespace-padded in the document; parse must trim
    assert(entries.map(_._1) ==
      Seq(0, 2, 4, 8).map(CorpusGen.pageUrl(1, _)) :+ "http://host1.test/ghost-1")
    // lastmod only on idx%4==0 entries; ghost has none
    assert(entries.map(_._2).map(_.nonEmpty) == Seq(true, false, true, true, false))
    assert(entries.forall { case (loc, _) => loc == loc.trim })
  }

  test("host0 index: children resolve to sitemap rows covering all even pages") {
    val rows = CorpusGen.sitemapRows(spec)
    val byUrl = rows.map(r => r.url -> r.body).toMap
    val index = byUrl("http://host0.test/sitemap.xml")
    assert(Sitemap.isIndex(index))
    val children = Sitemap.parseIndex(index)
    assert(children == Vector("http://host0.test/sitemap-1.xml",
      "http://host0.test/sitemap-2.xml"))
    // every child loc is itself a served sitemap row (fetch = join)
    children.foreach(c => assert(byUrl.contains(c), c))
    val locs = children.flatMap(c => Sitemap.parseUrlset(byUrl(c)).map(_._1))
      .filterNot(_.contains("ghost"))
    val expected = (0 until spec.hostSizes(0)).filter(_ % 2 == 0)
      .map(CorpusGen.pageUrl(0, _))
    assert(locs.sorted == expected.sorted)
    // the ghost url repeats across both children: the list-dedup case
    assert(children.flatMap(c => Sitemap.parseUrlset(byUrl(c)).map(_._1))
      .count(_ == "http://host0.test/ghost-0") == 2)
  }

  test("index documents contribute no urlset entries") {
    val index = CorpusGen.sitemapRows(spec)
      .find(_.url == "http://host0.test/sitemap.xml").get.body
    assert(Sitemap.parseUrlset(index).isEmpty)
  }
}
