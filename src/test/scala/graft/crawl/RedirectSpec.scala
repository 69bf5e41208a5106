package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{CorpusGen, CorpusSpec}
import graft.extract.{LinkExtractor, Processor}
import graft.html.HtmlParser

/** Meta-refresh redirect support: the parse grammar, the corpus
  * encode/decode agreement across all three raw spellings, and the
  * redirect-following BFS against a local ground-truth replay.
  */
class RedirectSpec extends AnyFunSuite {

  private def target(html: String): Option[String] =
    Processor.metaRefresh(HtmlParser.parse(html))

  test("meta refresh parse: delay, case, quotes, spacing, non-redirect refresh") {
    def page(meta: String) = s"""<html><head>$meta</head><body>x</body></html>"""
    assert(target(page("""<meta http-equiv="refresh" content="0; url=/a">""")) == Some("/a"))
    assert(target(page("""<META HTTP-EQUIV="Refresh" CONTENT="2; URL=http://h.test/b">""")) == Some("http://h.test/b"))
    assert(target(page("""<meta http-equiv="refresh" content="0 ; url = /c ">""")) == Some("/c"))
    assert(target(page("""<meta http-equiv="refresh" content="0; url='/d'">""")) == Some("/d"))
    assert(target(page("""<meta http-equiv="refresh" content='5; url="/e"'>""")) == Some("/e"))
    // refresh with no url clause reloads in place — not a redirect
    assert(target(page("""<meta http-equiv="refresh" content="30">""")).isEmpty)
    // first refresh wins
    assert(target(page("""<meta http-equiv="refresh" content="0; url=/f"><meta http-equiv="refresh" content="0; url=/g">""")) == Some("/f"))
    // distractors: other http-equiv values, robots metas
    assert(target(page("""<meta http-equiv="content-type" content="text/html"><meta name="robots" content="noindex">""")).isEmpty)
  }

  test("corpus encode/decode agreement: resolved targets equal redirectTargetOf") {
    val spec = CorpusSpec(nHosts = 4, totalPages = 500, seed = 19L)
    var spellings = Set.empty[Long]
    var redirects = 0
    for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h)
         if !CorpusGen.isEmptyPage(spec, h, i)) {
      val url = CorpusGen.pageUrl(h, i)
      val got = target(CorpusGen.pageHtml(spec, h, i))
        .flatMap(raw => LinkExtractor.resolveAccepted(
          url, raw, graft.url.UrlNorm.hostnameOf(url), allHosts = false))
        .getOrElse("")
      assert(got == CorpusGen.redirectTargetOf(spec, h, i), s"h=$h i=$i")
      if (got.nonEmpty) {
        redirects += 1
        spellings += CorpusGen.mix(spec.seed, h, i, 25) % 3
      }
    }
    // the corpus exercises redirects in all three raw spellings at this size
    assert(redirects > 5 && spellings == Set(0L, 1L, 2L),
      s"redirects=$redirects spellings=$spellings")
  }

  test("redirect-following BFS equals a local replay over the ground-truth graph") {
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.CrawlQueries.redirectCrawl(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val spec = CorpusGen.specFor(sf)
    val redirect = (for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h))
      yield CorpusGen.pageUrl(h, i) -> CorpusGen.redirectTargetOf(spec, h, i)).toMap
    val links = (for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h)) yield {
      val u = CorpusGen.pageUrl(h, i)
      val r = redirect(u)
      u -> (if (r.nonEmpty) Vector(r)
            else CorpusGen.linkRows(spec, h, i).map(_.dst_url).toVector)
    }).toMap
    val empty = (for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h))
      yield CorpusGen.pageUrl(h, i) -> CorpusGen.isEmptyPage(spec, h, i)).toMap

    val depth = scala.collection.mutable.HashMap("http://host0.test/" -> 0L)
    var frontier = Vector("http://host0.test/")
    while (frontier.nonEmpty) {
      val next = Vector.newBuilder[String]
      frontier.foreach { u =>
        links.getOrElse(u, Nil).foreach { v =>
          if (!depth.contains(v)) { depth(v) = depth(u) + 1; next += v }
        }
      }
      frontier = next.result()
    }
    val expected = depth.map { case (u, d) =>
      val saved =
        if (empty.getOrElse(u, true)) 0L
        else if (redirect.getOrElse(u, "").nonEmpty) 0L
        else 1L
      u -> ((d, saved))
    }.toMap
    assert(got == expected)
    // the gate engages: some seen-but-unsaved redirect pages
    assert(got.values.exists(_._2 == 0L))
  }

  /** Local replay of the chain fold: walk each redirect source through the
    * ground-truth map with a visited set; terminal/hops when the walk exits
    * the map, cycled when it revisits a node.
    */
  private def replayChains(redirect: Map[String, String])
      : Map[String, (String, Long, Long)] =
    redirect.collect { case (src, dst) if dst.nonEmpty =>
      var cur = dst
      var hops = 1L
      val seen = scala.collection.mutable.HashSet(src)
      while (redirect.getOrElse(cur, "").nonEmpty && !seen.contains(cur)) {
        seen += cur
        cur = redirect(cur)
        hops += 1
      }
      if (redirect.getOrElse(cur, "").nonEmpty) src -> (("", -1L, 1L))
      else src -> ((cur, hops, 0L))
    }

  test("redirect-chain fold equals a local walk replay and has multi-hop chains") {
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.CrawlQueries.redirectChains(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

    val spec = CorpusGen.specFor(sf)
    val redirect = (for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h))
      yield CorpusGen.pageUrl(h, i) -> CorpusGen.redirectTargetOf(spec, h, i)).toMap
    val expected = replayChains(redirect)
    assert(got == expected)
    // the fold is non-trivial at this size: multi-hop chains exist
    assert(got.values.exists(_._2 >= 2L), "no multi-hop chain in corpus")
  }

  test("redirect-chain fold equals the walk replay over random functional graphs") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    // random partial function node → node: chains, trees into chains,
    // cycles of every length, self-loops, dangling targets all arise
    val gen = for {
      n <- Gen.choose(2, 24)
      picks <- Gen.listOfN(n, Gen.option(Gen.choose(0, n + 1))) // n, n+1 dangle
    } yield picks.zipWithIndex.collect {
      case (Some(t), i) => s"u$i" -> s"u$t"
    }
    val prop = forAll(gen) { edges =>
      edges.isEmpty || {
        val got = graft.queries.CrawlQueries
          .foldRedirectMap(edges.toDF("src", "dst")).collect()
          .map(r => r.getString(0) ->
            ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
        val expected = replayChains(edges.toMap.withDefaultValue(""))
        val ok = got == expected
        if (!ok) println(s"COUNTEREXAMPLE edges=$edges\n got=$got\n exp=$expected")
        ok
      }
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(11L)), prop)
    assert(r.passed, r.status.toString)
  }

  test("index fold: redirect terminals composed with canonical declarations") {
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.CrawlQueries.indexFold(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    val spec = CorpusGen.specFor(sf)
    val all = for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h))
      yield (h, i)
    val redirect = all.map { case (h, i) =>
      CorpusGen.pageUrl(h, i) -> CorpusGen.redirectTargetOf(spec, h, i) }.toMap
    val canonical = all.map { case (h, i) =>
      CorpusGen.pageUrl(h, i) -> CorpusGen.canonicalTargetOf(spec, h, i) }.toMap
    val empty = all.map { case (h, i) =>
      CorpusGen.pageUrl(h, i) -> CorpusGen.isEmptyPage(spec, h, i) }.toMap
    val chains = replayChains(redirect)
    val expected = redirect.collect { case (u, r) if !empty(u) =>
      if (r.isEmpty) {
        val c = canonical(u)
        u -> (if (c.nonEmpty) (c, "canonical") else (u, "self"))
      } else chains(u) match {
        case ("", _, _) => u -> (("", "cycle"))
        case (t, _, _) =>
          val cr =
            if (empty.getOrElse(t, true)) t
            else { val c = canonical(t); if (c.nonEmpty) c else t }
          u -> (if (cr != t) (cr, "redirect+canonical") else (t, "redirect"))
      }
    }
    assert(got == expected)
    // all three primary rules fire at this corpus size
    for (via <- Seq("self", "canonical", "redirect"))
      assert(got.values.exists(_._2 == via), s"no $via row")
  }

  test("redirect-chain fold flags cycles on a constructed graph") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    // a→b→c→d (terminal), e→f→g→e (3-cycle), x→e (trapped feeder), s→s (self)
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "e" -> "f",
      "f" -> "g", "g" -> "e", "x" -> "e", "s" -> "s").toDF("src", "dst")
    val got = graft.queries.CrawlQueries.foldRedirectMap(edges).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val expected = replayChains(
      Seq("a" -> "b", "b" -> "c", "c" -> "d", "e" -> "f", "f" -> "g",
        "g" -> "e", "x" -> "e", "s" -> "s").toMap.withDefaultValue(""))
    assert(got == expected)
    assert(got("a") == (("d", 3L, 0L)))
    assert(got("e") == (("", -1L, 1L)))
    assert(got("x") == (("", -1L, 1L)))
    assert(got("s") == (("", -1L, 1L)))
  }
}
