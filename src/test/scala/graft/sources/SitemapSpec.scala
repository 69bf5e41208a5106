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

  test("urlset full parse: priority tenths with 0.5 default, changefreq tokens") {
    val body = CorpusGen.sitemapUrlsetBody(1, Seq(2, 8, 12, 20, 32))
    val full = Sitemap.parseUrlsetFull(body)
    val byLoc = full.map(e => e._1 -> e).toMap
    // idx 2: i%5==2 -> priority (2*7)%11=3 -> 0.3 -> q10 3; i%6==2 ->
    // changefreq (2*5)%7=3 "weekly"
    assert(byLoc(CorpusGen.pageUrl(1, 2))._4 == 3L)
    assert(byLoc(CorpusGen.pageUrl(1, 2))._3 == "weekly")
    // idx 8: i%6==2 AND i%4==0 -> changefreq (8*5)%7=5 "yearly" WITH lastmod
    // (the interval-due co-occurrence the v19 residue exists for)
    assert(byLoc(CorpusGen.pageUrl(1, 8))._3 == "yearly")
    assert(byLoc(CorpusGen.pageUrl(1, 8))._2.nonEmpty)
    // idx 32: the never+lastmod entry (i=32 mod 84)
    assert(byLoc(CorpusGen.pageUrl(1, 32))._3 == "never")
    assert(byLoc(CorpusGen.pageUrl(1, 32))._2.nonEmpty)
    // idx 12: priority (12*7)%11=7 -> 0.7; i%6==0 -> no changefreq
    assert(byLoc(CorpusGen.pageUrl(1, 12))._4 == 7L)
    assert(byLoc(CorpusGen.pageUrl(1, 12))._3 == "")
    // idx 20: i%6==2 -> changefreq (20*5)%7=2 "daily"; no lastmod tag? 20%4==0
    // so lastmod present; priority 20%5==0 -> default
    assert(byLoc(CorpusGen.pageUrl(1, 20))._3 == "daily")
    assert(byLoc(CorpusGen.pageUrl(1, 20))._4 == 5L)
    // ghost entry: both hints default
    assert(byLoc("http://host1.test/ghost-1")._3 == "")
    assert(byLoc("http://host1.test/ghost-1")._4 == 5L)
    // malformed priority values fall back to the default
    assert(Sitemap.parseUrlsetFull(
      "<urlset><url><loc>http://x/</loc><priority>high</priority></url></urlset>")
      .head._4 == 5L)
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

  test("robots sitemap lines: groupless, case-insensitive, comment-stripped") {
    import graft.crawl.RobotsParser
    // corpus bodies: odd hosts advertise the dead extra url at the TOP
    // (before any group) plus the live one at the end; even hosts only the end
    assert(RobotsParser.sitemaps(CorpusGen.robotsTxtBody(spec, 1)) ==
      Vector("http://host1.test/sitemap-extra.xml", "http://host1.test/sitemap.xml"))
    assert(RobotsParser.sitemaps(CorpusGen.robotsTxtBody(spec, 2)) ==
      Vector("http://host2.test/sitemap.xml"))
    // a sitemap line INSIDE a group still counts (groupless record), and
    // the rule parse for that group is unchanged by its presence
    val body =
      "User-agent: graftbot\nDisallow: /a\n" +
        "Sitemap: http://x.test/s.xml   # trailing comment\nAllow: /a/b\n"
    assert(RobotsParser.sitemaps(body) == Vector("http://x.test/s.xml"))
    assert(RobotsParser.parse(body, "graftbot") ==
      Vector(("disallow", "/a"), ("allow", "/a/b")))
    // the top-of-file line on odd hosts must not perturb their rule set
    assert(RobotsParser.parse(CorpusGen.robotsTxtBody(spec, 1), "graftbot") ==
      RobotsParser.parse(CorpusGen.robotsTxtBody(spec, 1)
        .replace("SiteMap: http://host1.test/sitemap-extra.xml\n\n", ""), "graftbot"))
  }

  test("discovery: robots-seeded chain excludes orphans, tolerates dead urls") {
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val all = Sitemap.entries(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val disc = Sitemap.discoveredEntries(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    // the orphan documents ARE in the table dump…
    assert(all.exists(_._2.endsWith("/sitemap-old.xml")))
    // …and exactly they are what discovery excludes
    assert(disc.toSet == all.filterNot(_._2.endsWith("/sitemap-old.xml")).toSet)
    assert(disc.forall(!_._2.endsWith("/sitemap-old.xml")))
    // host0's entries arrive via the index's children, keyed to the child urls
    assert(disc.filter(_._1 == "host0.test").forall(e =>
      e._2 == "http://host0.test/sitemap-1.xml" || e._2 == "http://host0.test/sitemap-2.xml"))
  }

  test("hint-aware due set: every interval branch engages; never is never due") {
    import org.apache.spark.sql.functions.col
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.CrawlQueries.sitemapDue(spark, sf).collect()
      .map(r => (r.getString(3), r.getLong(4)))
    val byCf = rows.groupBy(_._1)
    // the corpus plants changefreq+lastmod co-occurrences (idx%12==8), so
    // hinted rows exist beside the '' default
    assert(byCf.keySet.contains(""), "default rows")
    assert(byCf.exists { case (cf, _) => cf.nonEmpty }, "hinted rows")
    assert(byCf.getOrElse("never", Array.empty[(String, Long)])
      .forall(_._2 == 0L), "never entries must never be due")
    // both outcomes occur overall
    assert(rows.exists(_._2 == 1L) && rows.exists(_._2 == 0L))
  }

  test("refresh budget: exact conservation, churny hosts get more") {
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.CrawlQueries.refreshBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum == graft.queries.CrawlQueries.RefreshBudget)
    assert(rows.forall(_._4 >= 0))
    // monotone in weight up to the ±1 remainder slot
    for (a <- rows; b <- rows if a._3 > b._3)
      assert(a._4 >= b._4 - 1, s"$a vs $b")
  }

  test("lastmod recrawl: exactly the live due entries are refreshed") {
    import graft.queries.CrawlQueries
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val cutoff = CrawlQueries.SitemapRecrawlCutoff
    val entries = Sitemap.discoveredEntries(spark, sf).collect()
      .map(r => (r.getString(2), r.getString(3)))
    val due = entries.collect { case (loc, lm) if lm.nonEmpty && lm > cutoff => loc }.toSet
    val notDue = entries.collect { case (loc, lm) if lm.nonEmpty && lm <= cutoff => loc }.toSet
    // the cutoff splits the advertised lastmods at this sf
    assert(due.nonEmpty && notDue.nonEmpty)
    val spec = CorpusGen.specFor(sf)
    val live = (for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h)
      if !CorpusGen.isEmptyPage(spec, h, i)) yield CorpusGen.pageUrl(h, i)).toSet
    val got = CrawlQueries.sitemapRecrawl(spark, sf).collect()
      .map(_.getString(0)).toSet
    assert(got == (due intersect live))
    // not-due live urls were NOT refreshed
    assert((notDue intersect live).forall(u => !got(u) || due(u)))
  }
}
