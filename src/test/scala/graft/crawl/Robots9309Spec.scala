package graft.crawl

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class Robots9309Spec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("pattern→regex translation: prefix, mid-wildcard, and $ anchor semantics") {
    def m(p: String, path: String): Boolean =
      java.util.regex.Pattern.compile(Robots9309.ruleRegex(p)).matcher(path).find()
    assert(m("/misc", "/misc"))
    assert(m("/misc", "/misc/page-9")) // prefix, not whole-path
    assert(!m("/misc", "/m"))
    assert(m("/misc/page-1*", "/misc/page-12"))
    assert(m("/*/page-22*", "/docs/page-220"))
    assert(!m("/*/page-22*", "/page-220")) // '*' needs at least the '/' run
    assert(m("/products/page-3$", "/products/page-3"))
    assert(!m("/products/page-3$", "/products/page-30")) // anchored
  }

  test("verdicts match an independent local matcher; every grammar feature fires") {
    val got = Robots9309.verdicts(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got.nonEmpty)
    // independent reference: plain Scala loop over the same rule constants
    val compiled = Robots9309.Rules.zipWithIndex.map { case ((v, p), i) =>
      (i, v, p, java.util.regex.Pattern.compile(Robots9309.ruleRegex(p)))
    }
    got.keys.foreach { url =>
      val path = url.replaceFirst("^https?://[^/]+", "")
      val matches = compiled.filter(_._4.matcher(path).find())
      val expected =
        if (matches.isEmpty) (1L, "")
        else {
          val best = matches.minBy { case (i, v, p, _) => (-p.length, v, i) }
          (if (best._2 == "allow") 1L else 0L, best._3)
        }
      assert(got(url) == expected, s"$url: got ${got(url)} expected $expected")
    }
    // the corpus must actually exercise: a disallow, an allow override of a
    // shorter disallow, and the default (no rule) path
    val rulesFired = got.values.map(_._2).toSet
    assert(rulesFired.contains("/misc"))
    assert(rulesFired.contains(""))
    assert(got.values.exists { case (a, r) => a == 1L && r.startsWith("/misc/page-1") })
  }

  test("RFC-gated wave crawl equals a local gated BFS over the ground-truth links") {
    import graft.queries.CrawlQueries
    val seen = CrawlQueries.robots9309Seen(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dir = graft.corpus.CorpusGen.ensureFor(spark, sf)
    val links = spark.read.parquet(s"$dir/links.parquet")
      .select("src_url", "dst_url").collect()
      .map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // local BFS with the same gate
    val seed = "http://host0.test/"
    val expected = scala.collection.mutable.Map(seed -> 0L)
    var frontier = Vector(seed)
    var depth = 0L
    while (frontier.nonEmpty) {
      depth += 1
      val next = frontier.flatMap(u => links.getOrElse(u, Nil))
        .filter(d => !expected.contains(d) &&
          Robots9309.allowedPath(Robots9309.rawPathOf(d)))
        .distinct
      next.foreach(d => expected(d) = depth)
      frontier = next
    }
    assert(seen == expected.toMap)
    // the gate actually bites: the plain crawl reaches more urls
    val plain = CrawlQueries.bfsSeen(spark, sf).count()
    assert(plain > seen.size)
    // and the allow-override keeps some /misc/page-1* urls reachable
    assert(seen.keys.exists(_.contains("/misc/page-1")) ||
      !links.values.flatten.exists(_.contains("/misc/page-1")))
  }
}
