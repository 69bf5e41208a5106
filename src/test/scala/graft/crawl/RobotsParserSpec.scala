package graft.crawl

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.{CorpusGen, CorpusSpec}

/** Unit contract of the RFC 9309 robots.txt BODY parser: grammar lexing
  * (comments, case, whitespace, colon split), group construction
  * (consecutive user-agent runs), §2.2.1 group selection (longest
  * applicable token, `*` fallback, same-token merge), and rule extraction
  * (ordered, empty-value-skipping). The driver's crawl_robots_parse query
  * pins the same semantics against the DuckDB SQL replay.
  */
class RobotsParserSpec extends AnyFunSuite {

  private val spec = CorpusSpec(nHosts = 9, totalPages = 900, seed = 42L)

  test("class-0 body (star group) parses to the grammar-coverage rule set") {
    val rules = RobotsParser.parse(CorpusGen.robotsTxtBody(spec, 0))
    assert(rules == Robots9309.Rules.toVector,
      "the * group rules are pinned to the Robots9309 constant by construction")
  }

  test("class-1 body: the specific group wins and the * group is NOT merged") {
    val rules = RobotsParser.parse(CorpusGen.robotsTxtBody(spec, 1))
    assert(rules == Vector(
      ("allow", "/docs/page-1*"),
      ("disallow", "/docs"),
      ("disallow", "/products/page-3$")))
  }

  test("class-2 body: longest applicable token wins over a shorter prefix") {
    val rules = RobotsParser.parse(CorpusGen.robotsTxtBody(spec, 2))
    assert(rules == Vector(
      ("disallow", "/*/page-22*"),
      ("allow", "/docs/page-22*")))
  }

  test("a multi-UA group serves every token it names") {
    val body = CorpusGen.robotsTxtBody(spec, 0)
    // LegacyBot shares the * group: identical rules under that ua
    assert(RobotsParser.parse(body, "legacybot") == Robots9309.Rules.toVector)
    // MegaCrawler gets its own group, not the * group
    assert(RobotsParser.parse(body, "megacrawler") == Vector(("disallow", "/")))
  }

  test("a token longer than the ua never matches (GraftBot-Images distractor)") {
    val rules = RobotsParser.parse(CorpusGen.robotsTxtBody(spec, 0), "graftbot")
    assert(!rules.exists(_._2 == "/articles"))
    // but the distractor's own ua does match its group
    assert(RobotsParser.parse(CorpusGen.robotsTxtBody(spec, 0), "graftbot-images")
      == Vector(("disallow", "/articles")))
  }

  test("no applicable group and no * group means no rules (all allowed)") {
    val body = "User-agent: somebot\nDisallow: /x\n"
    assert(RobotsParser.parse(body, "graftbot").isEmpty)
  }

  test("rules before any user-agent line are ignored") {
    val body = "Disallow: /orphan\nUser-agent: *\nDisallow: /real\n"
    assert(RobotsParser.parse(body) == Vector(("disallow", "/real")))
  }

  test("an intervening directive splits two user-agent runs into two groups") {
    val body =
      "User-agent: graftbot\nCrawl-delay: 5\nUser-agent: other\nDisallow: /only-other\n"
    // 'other' starts a NEW group (prev significant line was crawl-delay),
    // so its rule does not belong to graftbot's group
    assert(RobotsParser.parse(body, "graftbot").isEmpty)
    assert(RobotsParser.parse(body, "other") == Vector(("disallow", "/only-other")))
  }

  test("crawl-delay: winning-group value per host class, junk ignored") {
    // h%3==1 wins the specific GraftBot group (delay 2); h%3==0 falls back
    // to the * group (delay 4); h%3==2 wins the graftbot token groups,
    // which carry no delay
    assert(RobotsParser.crawlDelay(CorpusGen.robotsTxtBody(spec, 0)).contains(4L))
    assert(RobotsParser.crawlDelay(CorpusGen.robotsTxtBody(spec, 1)).contains(2L))
    assert(RobotsParser.crawlDelay(CorpusGen.robotsTxtBody(spec, 2)).isEmpty)
    // MegaCrawler's delay 10 must never leak to graftbot
    assert(!RobotsParser.crawlDelay(CorpusGen.robotsTxtBody(spec, 2)).contains(10L))
    // non-integer or junk values are ignored like any unknown directive;
    // the first VALID winning-group value wins
    val body =
      "User-agent: graftbot\nCrawl-delay: 1.5\nCrawl-delay: x\nCrawl-delay: 7\nCrawl-delay: 3\n"
    assert(RobotsParser.crawlDelay(body, "graftbot").contains(7L))
    assert(RobotsParser.crawlDelay("User-agent: other\nCrawl-delay: 9\n", "graftbot").isEmpty)
  }

  test("two separate groups with the SAME winning token merge in body order") {
    val body =
      """User-agent: graftbot
        |Disallow: /a
        |
        |User-agent: *
        |Disallow: /star
        |
        |User-agent: GraftBot
        |Allow: /b
        |""".stripMargin
    assert(RobotsParser.parse(body, "graftbot") ==
      Vector(("disallow", "/a"), ("allow", "/b")))
  }

  test("lexer: comments, blank lines, colon-less lines, case and spacing") {
    val body =
      """# header comment
        |junk line without a colon
        |USER-AGENT :  graftbot 2.0   # trailing comment
        |  DisAllow :  /x
        |Disallow:
        |Allow: /x/y
        |""".stripMargin
    // the colon-less line neither yields a rule nor splits anything; the
    // empty disallow carries no rule; keys/tokens match case-insensitively
    assert(RobotsParser.parse(body, "graftbot") ==
      Vector(("disallow", "/x"), ("allow", "/x/y")))
  }

  test("parsed corpus rules drive the matcher: per-class verdicts differ") {
    def compiled(h: Int) =
      Robots9309.compile(RobotsParser.parse(CorpusGen.robotsTxtBody(spec, h)))
    // /misc blocked for class 0 (star rules), allowed for class 2 (its
    // graftbot group has no /misc rule)
    assert(!Robots9309.allowed(compiled(0), "/misc/page-4"))
    assert(Robots9309.allowed(compiled(2), "/misc/page-4"))
    // /docs blocked only for class 1 (its specific group disallows /docs)
    assert(Robots9309.allowed(compiled(0), "/docs/page-8"))
    assert(!Robots9309.allowed(compiled(1), "/docs/page-8"))
    // class 1 allow-override: /docs/page-1* stays allowed
    assert(Robots9309.allowed(compiled(1), "/docs/page-17"))
  }
}
