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

  test("properties: idempotent, param-order invariant, tracking-only ≡ bare") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val key = Gen.oneOf(Gen.identifier.map(_.take(5)),
      Gen.oneOf("utm_source", "utm_campaign", "fbclid", "gclid", "ref", "a", "id", "z"))
    val param = for { k <- key; v <- Gen.alphaNumStr.map(_.take(6)) } yield s"$k=$v"
    val gen = for {
      host <- Gen.oneOf("h.test", "x.example", "y.test:8080")
      segs <- Gen.listOfN(2, Gen.identifier.map(_.take(4)))
      ps <- Gen.listOf(param).map(_.take(8))
    } yield (s"http://$host/${segs.mkString("/")}", ps)
    val prop = forAll(gen) { case (base, ps) =>
      def u(params: Seq[String]) =
        if (params.isEmpty) base else s"$base?${params.mkString("&")}"
      val s1 = UrlScrub.scrub(u(ps))
      // idempotent
      val idem = UrlScrub.scrub(s1) == s1
      // param order never matters
      val orderInv = UrlScrub.scrub(u(ps.reverse)) == s1
      // adding ONLY tracking params changes nothing vs the scrubbed base
      val tracked = ps.filter(p => UrlScrub.isTracking(p.takeWhile(_ != '=')))
      val trackOnly = UrlScrub.scrub(u(tracked)) == UrlScrub.scrub(u(Nil))
      // the kept multiset survives exactly
      val kept = ps.filterNot(p => UrlScrub.isTracking(p.takeWhile(_ != '='))).sorted
      val got = s1.split("\\?", 2) match {
        case Array(_, q) => q.split("&").toSeq.sorted
        case _           => Seq.empty
      }
      idem && orderInv && trackOnly && (got == kept)
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(r.passed, r.status.toString)
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
