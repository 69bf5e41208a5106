package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkTestBase
import graft.corpus.{CorpusGen, CorpusSpec}
import graft.url.UrlNorm

/** The host-keyed gate TABLES (trap blocklist, parsed RFC 9309 rules,
  * politeness caps) must produce exactly the seen/saved sets the in-kernel
  * broadcast-map gates produce — the table path is the 10^8-host scale
  * shape (rules never transit the driver; the gate is a host-keyed join,
  * broadcast-hinted only under RobotsBroadcastMaxRows), the map path the
  * small-set fast path. Plus the plan discipline: a forced-large gate
  * table plans as a SHUFFLED join, never a forced broadcast.
  */
class TableGatesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val spec = CorpusSpec(nHosts = 3, totalPages = 90, seed = 7L)
  private lazy val corpusDir = {
    val dir = java.nio.file.Files.createTempDirectory("graftgates").toString
    CorpusGen.ensure(spark, dir, spec)
    dir
  }
  private lazy val pages = spark.read.parquet(s"$corpusDir/pages.parquet")
  private val seed0 = "http://host0.test/"

  private def seenDepths(out: CrawlOutput): Map[String, Int] =
    out.seen.select("url", "depth").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap

  test("trap gate: table anti-join ≡ in-kernel map gate (seen + depths)") {
    import spark.implicits._
    val tmpl = (0 until spec.hostSizes(0))
      .map(i => UrlNorm.templateOf(CorpusGen.pageUrl(0, i)))
      .groupBy(identity).view.mapValues(_.size).toSeq
      .maxBy { case (t, n) => (n, t) }._1
    val viaMap = seenDepths(WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, extractContent = false,
        trapTemplates = Map(CorpusGen.hostName(0) -> Set(tmpl)))))
    val viaTable = seenDepths(WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, extractContent = false,
        trapTemplatesDf = Some(
          Seq((CorpusGen.hostName(0), tmpl)).toDF("host", "template")))))
    assert(viaTable == viaMap)
    assert(viaMap.nonEmpty)
  }

  test("RFC 9309 gate: table join ≡ in-kernel compiled-map gate") {
    import spark.implicits._
    // grammar-coverage rules bound to host0 (wildcards, $ anchors, ties)
    val rules = Robots9309.Rules
    val viaMap = seenDepths(WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, extractContent = false, robots9309 = true,
        robots9309Rules = Map(CorpusGen.hostName(0) -> rules.toVector))))
    val rulesDf = rules.zipWithIndex
      .map { case ((v, p), i) => (CorpusGen.hostName(0), i.toLong, v, p) }
      .toDF("host", "rule_id", "verdict", "pattern")
    val viaTable = seenDepths(WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, extractContent = false, robots9309 = true,
        robots9309RulesDf = Some(rulesDf))))
    assert(viaTable == viaMap)
    assert(viaMap.nonEmpty)
  }

  test("politeness caps: table join ≡ map join (pop waves + saved set)") {
    import spark.implicits._
    val caps = Map(CorpusGen.hostName(0) -> 3)
    def waves(out: CrawlOutput): Map[String, Int] =
      out.saved.select("url", "wave").collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
    val viaMap = waves(WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, extractContent = false,
        hostWaveCap = 5, hostWaveCaps = caps)))
    val viaTable = waves(WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, extractContent = false,
        hostWaveCap = 5,
        hostWaveCapsDf = Some(caps.toSeq.toDF("host", "hcap")))))
    assert(viaTable == viaMap)
    assert(viaMap.nonEmpty)
  }

  test("small gate tables plan as broadcast hash joins (no nested loop)") {
    import spark.implicits._
    val links = Seq(
      ("http://host0.test/articles/page-1", "host0.test", 0L, 0),
      ("http://host0.test/misc/page-33", "host0.test", 0L, 1))
      .toDF("url", "host", "parent_seq", "pos")
    val trapDf = Seq(("host0.test", "/misc/page-N")).toDF("host", "template")
    val out = WaveCrawler.trapAntiJoin(links, trapDf, trapRows = 1L)
    assert(out.select("url").collect().map(_.getString(0)).toSet ==
      Set("http://host0.test/articles/page-1"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"trap gate should be a broadcast anti hash join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "template condition must ride the host equi-join, not force a nested loop")
  }

  test("gate tables over the row threshold must not plan as forced broadcasts") {
    import spark.implicits._
    // mirror the robotsAntiJoin discipline: above RobotsBroadcastMaxRows
    // the hint (which overrides every size estimate) is dropped — with
    // auto-broadcast and AQE off, any BroadcastHashJoin in the plan could
    // only have come from a forced hint
    val abtKey = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.enabled"
    val abt = spark.conf.get(abtKey)
    val aqe = spark.conf.get(aqeKey)
    try {
      spark.conf.set(abtKey, "-1")
      spark.conf.set(aqeKey, "false")
      val links = Seq(("http://host0.test/misc/page-33", "host0.test", 0L, 0))
        .toDF("url", "host", "parent_seq", "pos")
      val trapDf = Seq(("host0.test", "/misc/page-N")).toDF("host", "template")
      val outT = WaveCrawler.trapAntiJoin(links, trapDf,
        trapRows = WaveCrawler.RobotsBroadcastMaxRows + 1)
      val planT = outT.queryExecution.executedPlan.toString
      assert(!planT.contains("BroadcastHashJoin"),
        s"trap hint must be dropped above the row threshold:\n$planT")
      assert(planT.contains("LeftAnti"), s"must remain an anti join:\n$planT")
      assert(outT.count() == 0) // gated on the shuffled path too

      val rulesByHost = Seq(("host0.test", Seq((0L, "disallow", "/misc"))))
        .toDF("host", "rules")
      val out9 = WaveCrawler.robots9309GateJoin(links, rulesByHost,
        rulesRows = WaveCrawler.RobotsBroadcastMaxRows + 1)
      val plan9 = out9.queryExecution.executedPlan.toString
      assert(!plan9.contains("BroadcastHashJoin"),
        s"9309 hint must be dropped above the row threshold:\n$plan9")
      assert(out9.count() == 0) // /misc disallowed on the shuffled path too
    } finally {
      spark.conf.set(abtKey, abt)
      spark.conf.set(aqeKey, aqe)
    }
  }
}
