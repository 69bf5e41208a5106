package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen

/** RFC 9309 (Robots Exclusion Protocol — public IETF spec) group-rule
  * matching: `allow`/`disallow` path patterns with `*` wildcards and `$`
  * end anchors, most-specific (longest-pattern) match wins, `allow` wins
  * length ties, no match ⇒ allowed. This is the full-grammar upgrade of
  * the crawl engine's prefix-only robots join (J3/X1) — the semantics a
  * production crawler applies to real robots.txt files.
  *
  * The rule set is a deterministic constant (the corpus's robots ground
  * truth is prefix-only), chosen to exercise every grammar feature:
  * mid-pattern wildcards, `$` anchoring, allow-overrides-disallow by
  * length, and an exact allow/disallow length TIE decided by the
  * allow-wins rule. Patterns are restricted to literal path octets plus
  * `*`/`$` (no other regex metacharacters), so the regex translation —
  * `^` + pattern with `*` → `.*` — is exact in both engines.
  *
  * Scale shape: rules broadcast against a narrow (url, path) projection,
  * winner selection is one per-url top-1 window (WindowGroupLimit — no
  * full sort). Real deployments hold ~10^2 rules/host and bucket rules by
  * host exactly like the existing robots anti-join; the matcher itself is
  * what this operator pins.
  */
object Robots9309 {

  /** (verdict, pattern) — documented grammar-coverage rule set. */
  val Rules: Seq[(String, String)] = Seq(
    ("disallow", "/misc"),
    ("allow", "/misc/page-1*"),
    ("disallow", "/*/page-22*"),
    ("allow", "/docs/page-22*"),
    ("disallow", "/products/page-3$"),
    ("allow", "/products"),
    ("disallow", "/products/page-31*"),
    ("allow", "/products/page-31$"))

  /** `*` → `.*`, anchored at the start; a trailing `$` is the same anchor
    * in pattern and regex. Patterns contain no other metacharacters by
    * construction (asserted).
    */
  def ruleRegex(p: String): String = {
    require(p.forall(c => c.isLetterOrDigit || "/-*$_.".contains(c)), s"pattern $p")
    "^" + p.replace(".", "\\.").replace("*", ".*")
  }

  /** One compiled rule — java.util.regex.Pattern is Serializable, so a
    * per-host compiled map broadcasts as-is (compile once on the driver,
    * never per link).
    */
  final case class CompiledRule(id: Int, isAllow: Boolean, plen: Int,
      re: java.util.regex.Pattern)

  /** Compile an ordered (verdict, pattern) rule list (e.g. one host's
    * [[RobotsParser.parse]] output) for the matcher.
    */
  def compile(rules: Seq[(String, String)]): Array[CompiledRule] =
    rules.zipWithIndex.map { case ((v, p), i) =>
      CompiledRule(i, v == "allow", p.length,
        java.util.regex.Pattern.compile(ruleRegex(p)))
    }.toArray

  // compiled once per JVM — the in-kernel gate runs per discovered link
  private lazy val compiledRules: Array[CompiledRule] = compile(Rules)

  /** The RFC 9309 verdict of `rules` for a raw (percent-encoded) url
    * path: longest matching pattern wins, allow wins length ties, lowest
    * rule id breaks exact ties, no match ⇒ allowed. The same total order
    * the SQL replay sorts by.
    */
  def allowed(rules: Array[CompiledRule], path: String): Boolean = {
    var bestAllow = true
    var bestLen = -1
    var bestId = Int.MaxValue
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (r.re.matcher(path).find()) {
        // order: plen desc, allow-before-disallow, id asc
        val better = r.plen > bestLen ||
          (r.plen == bestLen && bestLen >= 0 && r.isAllow && !bestAllow) ||
          (r.plen == bestLen && bestLen >= 0 && r.isAllow == bestAllow && r.id < bestId)
        if (bestLen < 0 || better) { bestAllow = r.isAllow; bestLen = r.plen; bestId = r.id }
      }
      i += 1
    }
    bestAllow
  }

  /** Verdict under the documented grammar-coverage constant [[Rules]]. */
  def allowedPath(path: String): Boolean = allowed(compiledRules, path)

  /** Per-host parsed rules TABLE for the engine UA — the production
    * acquisition step: robots.txt BODIES ([[CorpusGen.robotsTxtRows]])
    * parsed distributedly by [[RobotsParser]] into (host, rule_id,
    * verdict, pattern). This is what [[hostRules]] and the BFS gate
    * consume; the driver's oracle replays the same parse in SQL.
    */
  def parsedRules(spark: SparkSession, sfDir: String,
      ua: String = RobotsParser.Ua): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    spark.read.parquet(s"$dir/robots_txt.parquet")
      .select(col("host"), col("body")).as[(String, String)]
      .flatMap { case (host, body) =>
        RobotsParser.parse(body, ua).zipWithIndex.map { case ((v, p), i) =>
          (host, i.toLong, v, p)
        }
      }.toDF("host", "rule_id", "verdict", "pattern")
  }

  /** host → ordered rules, collected for the in-kernel gate's broadcast.
    * Rule sets are ~10 rows/host, so the collect is bounded by host count;
    * at web scale (10^7+ hosts) the gate becomes a rules-TABLE join on
    * host exactly like [[WaveCrawler.robotsAntiJoin]] — the parse itself
    * is already distributed.
    */
  def hostRules(spark: SparkSession, sfDir: String,
      ua: String = RobotsParser.Ua): Map[String, Vector[(String, String)]] =
    parsedRules(spark, sfDir, ua)
      .collect()
      .groupBy(_.getString(0))
      .map { case (h, rows) =>
        h -> rows.sortBy(_.getLong(1)).map(r => (r.getString(2), r.getString(3))).toVector
      }

  /** host → crawl-delay seconds parsed from the served robots.txt bodies
    * for `ua` ([[RobotsParser.crawlDelay]]); hosts without a delay are
    * absent. Host-bounded like [[hostRules]] — the parse is distributed,
    * only (host, seconds) pairs reach the driver.
    */
  def hostDelays(spark: SparkSession, sfDir: String,
      ua: String = RobotsParser.Ua): Map[String, Long] =
    hostDelaysDs(spark, sfDir, ua).collect().toMap

  /** The distributed (host, crawl-delay seconds) parse behind both
    * [[hostDelays]] (small-set Map path) and [[hostDelayCapsDf]] (the
    * table path) — one definition of the robots_txt scan.
    */
  private def hostDelaysDs(spark: SparkSession, sfDir: String,
      ua: String): org.apache.spark.sql.Dataset[(String, Long)] = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    spark.read.parquet(s"$dir/robots_txt.parquet")
      .select(col("host"), col("body")).as[(String, String)]
      .flatMap { case (host, body) =>
        RobotsParser.crawlDelay(body, ua).map(d => (host, d))
      }
  }

  /** Per-host politeness-cap TABLE derived from parsed crawl-delays:
    * (host, hcap = max(1, budget div delaySeconds)) rows, hosts without a
    * delay absent. The scale shape of [[hostDelays]] — the caps never
    * transit the driver; the wave engine joins this table per wave
    * ([[graft.crawl.CrawlConfig.hostWaveCapsDf]]).
    */
  def hostDelayCapsDf(spark: SparkSession, sfDir: String, budget: Long,
      ua: String = RobotsParser.Ua): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    hostDelaysDs(spark, sfDir, ua)
      .map { case (host, d) => (host, math.max(1L, budget / d).toInt) }
      .toDF("host", "hcap")
  }

  /** Raw path of a url string (everything from the first `/` after the
    * authority) — RFC 9309 matches the percent-ENCODED path, so the gate
    * must not decode.
    */
  def rawPathOf(url: String): String = {
    val ss = url.indexOf("//")
    val from = if (ss >= 0) ss + 2 else 0
    val slash = url.indexOf('/', from)
    if (slash < 0) "" else url.substring(slash)
  }

  /** (url, allowed, rule) for every corpus page: the RFC 9309 verdict and
    * the winning pattern ('' when no rule matched).
    */
  def verdicts(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val rules = Rules.zipWithIndex.map { case ((v, p), i) =>
      (i.toLong, v, p, ruleRegex(p), p.length.toLong)
    }.toDF("rule_id", "verdict", "pattern", "regex", "plen")
    val pages = CorpusGen.pages(spark, CorpusGen.ensureFor(spark, sfDir))
      .select(col("url"), regexp_replace(col("url"), "^https?://[^/]+", "").as("path"))
    val m = pages.join(broadcast(rules), expr("path rlike regex"))
    val w = Window.partitionBy(col("url"))
      .orderBy(col("plen").desc, col("verdict").asc, col("rule_id").asc)
    val winners = m.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("url"),
        when(col("verdict") === "allow", 1L).otherwise(0L).as("allowed"),
        col("pattern").as("rule"))
    pages.select(col("url")).join(winners, Seq("url"), "left")
      .select(col("url"),
        coalesce(col("allowed"), lit(1L)).as("allowed"),
        coalesce(col("rule"), lit("")).as("rule"))
  }
}
