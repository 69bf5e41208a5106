package graft.url

import org.scalatest.funsuite.AnyFunSuite

/** Tracking-param scrub grammar and the injected-view fold behavior. */
class UrlScrubSpec extends AnyFunSuite {

  test("strips tracking keys, keeps and sorts real params") {
    assert(UrlScrub.scrub("http://h.test/p?utm_source=x&b=2&a=1") ==
      "http://h.test/p?a=1&b=2")
    assert(UrlScrub.scrub("http://h.test/p?b=2&a=1") ==
      "http://h.test/p?a=1&b=2")
    // all-tracking query: the '?' disappears entirely
    assert(UrlScrub.scrub("http://h.test/p?utm_medium=rss&fbclid=XYZ") ==
      "http://h.test/p")
    // case-insensitive matching, both prefix and exact
    assert(UrlScrub.scrub("http://h.test/p?UTM_Source=x&GCLID=1&k=v") ==
      "http://h.test/p?k=v")
    // ref is a click-id; bare keys survive bare and sort with '' value
    assert(UrlScrub.scrub("http://h.test/p?ref=tw&flag&a=1") ==
      "http://h.test/p?a=1&flag")
    // values sort within equal keys; raw bytes preserved (no re-encoding)
    assert(UrlScrub.scrub("http://h.test/p?k=b%20c&k=a") ==
      "http://h.test/p?k=a&k=b%20c")
  }

  test("no query, unparseable, and empty-segment inputs pass through") {
    assert(UrlScrub.scrub("http://h.test/p") == "http://h.test/p")
    assert(UrlScrub.scrub("http://h.test/") == "http://h.test/")
    assert(UrlScrub.scrub("http://h.test/p?&&a=1&&") == "http://h.test/p?a=1")
    assert(UrlScrub.scrub("ht tp://bad url") == "ht tp://bad url")
  }

  test("injected-view query: tracked variants fold, bare urls stay; engine matches construction") {
    val spark = graft.SparkTestBase.spark
    val rows = graft.queries.CrawlQueries.urlScrub(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getString(1))
    val byScrubbed = rows.groupBy(_._2)
    // every page url appears bare (group of 1) and as a folded pair
    val bare = rows.filter { case (u, s) => u == s && !u.contains('?') }
    assert(bare.nonEmpty)
    // the two tracked spellings of each base url scrub to the SAME value
    val folded = byScrubbed.filter { case (s, g) => s.contains('?') }
    assert(folded.nonEmpty)
    assert(folded.forall { case (_, g) => g.length == 2 },
      s"every tracked pair must fold 2→1: ${folded.find(_._2.length != 2)}")
    // construction check on one row: scrubbed = url?a=1&id=h&z=9
    folded.foreach { case (s, g) =>
      assert(s.matches(".*\\?a=1&id=[0-9a-f]{4}&z=9"), s)
    }
  }
}
