package graft.crawl

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property-based crawl-order equivalence (SURVEY.md §5 item 3): over
  * RANDOM site graphs and a random flag grid, the Spark wave scheduler must
  * reproduce the reference FIFO loop (RefCrawler transliteration) exactly —
  * save order, saved set, seen set.
  *
  * Graph generator shapes the hard cases on purpose: multiple discoverers
  * per url (first-wins ownership), dangling links (fetch errors), empty
  * pages (P8), self loops, and limit values that cut mid-wave.
  */
class CrawlPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  /** Pages spread across three hosts (i % 3), so random edges naturally
    * cross hosts: same-host mode must FILTER them, multi-host mode must
    * FOLLOW them — both against the same reference loop.
    */
  private def url(i: Int): String =
    if (i == 0) "http://prop0.test/"
    else s"http://prop${i % 3}.test/${if (i % 2 == 0) "a" else "b"}/p$i"

  /** Random site: n pages, random out-edges (possibly dangling/self), some
    * empty-HTML pages. Page 0 is the seed and never empty.
    */
  private val siteGen: Gen[(Map[String, String], Int)] = for {
    n <- Gen.choose(2, 18)
    edges <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(0, n + 2))) // n+1, n+2 dangle
    empties <- Gen.listOfN(n, Gen.prob(0.15))
    limit <- Gen.frequency((2, Gen.const(0)), (3, Gen.choose(1, n)))
  } yield {
    val web = (0 until n).map { i =>
      val html =
        if (i > 0 && empties(i)) "   "
        else {
          val anchors = edges(i).map(j => s"""<li><a href="${url(j)}">x</a></li>""").mkString
          s"<html><head><title>T$i</title></head><body><p>page $i body text</p><ul>$anchors</ul></body></html>"
        }
      url(i) -> html
    }.toMap
    (web, limit)
  }

  private def runSpark(web: Map[String, String], limit: Int,
      matches: Seq[String], follows: Seq[String],
      sameHostOnly: Boolean, seenFilter: String = "bloom"): (Vector[String], Set[String]) = {
    val spark2 = spark
    import spark2.implicits._
    val pages = spark.sparkContext
      .parallelize(web.toSeq.map { case (u, h) => (u, h.getBytes("UTF-8")) }, 4)
      .toDF("url", "html")
    val out = WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = url(0), pageLimit = limit, matchPatterns = matches,
        followPatterns = follows, cachePages = false, sameHostOnly = sameHostOnly,
        seenFilter = seenFilter,
        // force the segment path from wave 1 when cuckoo is drawn, so the
        // property exercises its build/merge/probe on every graph
        bloomMinSeen = if (seenFilter == "cuckoo") 0L else CrawlConfig().bloomMinSeen))
    val saved = out.saved.orderBy("depth", "seq").select("url")
      .collect().map(_.getString(0)).toVector
    val seen = out.seen.select("url").collect().map(_.getString(0)).toSet
    (saved, seen)
  }

  test("random graphs × {limit, match, follow-match, multi-host, seen-filter}: wave scheduler ≡ reference FIFO loop") {
    val flagGen = for {
      m <- Gen.oneOf(Seq.empty[String], Seq("/a/**"))
      f <- Gen.oneOf(Seq.empty[String], Seq("/", "/b/**"))
      sho <- Gen.oneOf(true, false)
      sf <- Gen.frequency((3, Gen.const("bloom")), (1, Gen.const("cuckoo")))
    } yield (m, f, sho, sf)
    val prop: Prop = forAll(siteGen, flagGen) {
      case ((web, limit), (matches, follows, sho, sf)) =>
        val ref = RefCrawler.crawl(web,
          CrawlParams(startUrl = url(0), pageLimit = limit, matchPatterns = matches,
            followPatterns = follows, sameHostOnly = sho))
        val (saved, seen) = runSpark(web, limit, matches, follows, sho, sf)
        val ok = saved == ref.savedUrls && seen == ref.visited
        if (!ok) {
          println(s"COUNTEREXAMPLE limit=$limit matches=$matches follows=$follows sho=$sho sf=$sf web=${web.keys.toVector.sorted}")
          println(s"  spark saved=$saved\n  ref   saved=${ref.savedUrls}")
          println(s"  spark seen=${seen.toVector.sorted}\n  ref   seen=${ref.visited.toVector.sorted}")
        }
        ok
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(30)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)) // deterministic in CI
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }
}
