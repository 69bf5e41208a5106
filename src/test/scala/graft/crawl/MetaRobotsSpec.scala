package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{CorpusGen, CorpusSpec}
import graft.extract.Processor
import graft.html.HtmlParser

/** Page-level `<meta name="robots">` support: the parse (grammar corners),
  * the corpus encode/decode agreement, and the gated BFS against a local
  * ground-truth replay.
  */
class MetaRobotsSpec extends AnyFunSuite {

  private def flags(html: String): (Boolean, Boolean) =
    Processor.metaRobots(HtmlParser.parse(html))

  test("meta robots parse: case, comma list, none, unions, distractors") {
    assert(flags("""<html><head><meta name="robots" content="noindex"></head><body>x</body></html>""") == ((true, false)))
    assert(flags("""<html><head><META NAME="Robots" CONTENT="NoFollow"></head><body>x</body></html>""") == ((false, true)))
    assert(flags("""<html><head><meta name="robots" content="noindex, nofollow"></head><body>x</body></html>""") == ((true, true)))
    assert(flags("""<html><head><meta name="robots" content=" NOINDEX ,archive"></head><body>x</body></html>""") == ((true, false)))
    assert(flags("""<html><head><meta name="robots" content="none"></head><body>x</body></html>""") == ((true, true)))
    // multiple robots metas union (most restrictive wins)
    assert(flags("""<html><head><meta name="robots" content="noindex"><meta name="robots" content="nofollow"></head><body>x</body></html>""") == ((true, true)))
    // distractors: description metas, agent-specific robots, unrelated tokens
    assert(flags("""<html><head><meta name="description" content="noindex nofollow"><meta name="otherbot" content="noindex"><meta name="robots" content="index,follow"></head><body>x</body></html>""") == ((false, false)))
    assert(flags("""<html><head></head><body>plain</body></html>""") == ((false, false)))
    // content that says "noindexing" must not fire (whole-token match)
    assert(flags("""<html><head><meta name="robots" content="noindexing"></head><body>x</body></html>""") == ((false, false)))
  }

  test("corpus encode/decode agreement: parsed flags equal metaRobotsOf on every page") {
    val spec = CorpusSpec(nHosts = 4, totalPages = 400, seed = 11L)
    var classes = Set.empty[(Int, Int)]
    for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h)
         if !CorpusGen.isEmptyPage(spec, h, i)) {
      val truth = CorpusGen.metaRobotsOf(spec, h, i)
      val (ni, nf) = flags(CorpusGen.pageHtml(spec, h, i))
      assert((if (ni) 1 else 0, if (nf) 1 else 0) == truth, s"h=$h i=$i")
      classes += truth
    }
    // the corpus must exercise all four classes at this size
    assert(classes == Set((0, 0), (1, 0), (0, 1), (1, 1)))
  }

  test("meta-gated BFS equals a local replay over the ground-truth graph") {
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.CrawlQueries.metaGatedCrawl(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val spec = CorpusGen.specFor(sf)
    val links = (for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h))
      yield CorpusGen.linkRows(spec, h, i)).flatten
      .groupBy(_.src_url).map { case (k, v) => k -> v.map(_.dst_url) }
    val meta = (for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h)) yield {
      val e = CorpusGen.isEmptyPage(spec, h, i)
      CorpusGen.pageUrl(h, i) -> ((e, CorpusGen.metaRobotsOf(spec, h, i)))
    }).toMap
    // local BFS: expansion gated on nofollow=0 (and, implicitly, liveness —
    // empty pages have no link rows); saved = live ∧ noindex=0
    val depth = scala.collection.mutable.HashMap("http://host0.test/" -> 0L)
    var frontier = Vector("http://host0.test/")
    while (frontier.nonEmpty) {
      val next = Vector.newBuilder[String]
      frontier.foreach { u =>
        val expand = meta.get(u).forall { case (_, (_, nf)) => nf == 0 }
        if (expand) links.getOrElse(u, Nil).foreach { v =>
          if (!depth.contains(v)) { depth(v) = depth(u) + 1; next += v }
        }
      }
      frontier = next.result()
    }
    val expected = depth.map { case (u, d) =>
      val saved = meta.get(u) match {
        case Some((empty, (ni, _))) => if (!empty && ni == 0) 1L else 0L
        case None                   => 0L
      }
      u -> ((d, saved))
    }.toMap
    assert(got == expected)
    // the gates actually engage at this sf: some unsaved-but-seen, some
    // unreached-vs-plain-bfs
    assert(got.values.exists(_._2 == 0L))
    val plain = graft.queries.CrawlQueries.bfsSeen(spark, sf).count()
    assert(got.size < plain, s"gated=${got.size} plain=$plain")
  }
}
