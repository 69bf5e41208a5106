package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen

/** Sitemap SOURCE (sitemaps.org protocol — public): the seed-acquisition
  * step a production crawler runs after reading a robots.txt `Sitemap:`
  * line. Handles both document kinds: `<urlset>` (page entries with
  * optional `<lastmod>`) and the two-level `<sitemapindex>` (child sitemap
  * locations). Parsing is a linear tag scan, not XML-library-based — the
  * grammar subset sitemaps actually use is flat, and the same extraction
  * is replayable as SQL string functions by the driver's oracle.
  *
  * Scale shape: bodies parse independently (narrow flatMap over the
  * sitemap table); a 10^7-host sitemap sweep is one scan. Index →
  * child resolution is a url equi-join back onto the same table ("fetch"
  * ≙ join, exactly the crawl's J1).
  */
object Sitemap {

  def isIndex(body: String): Boolean = body.contains("<sitemapindex")

  /** Text of every `tag` element inside `block` (flat, non-nested — the
    * sitemap grammar), in document order.
    */
  private def tagValues(block: String, tag: String): Vector[String] = {
    val open = s"<$tag>"
    val close = s"</$tag>"
    val out = Vector.newBuilder[String]
    var i = block.indexOf(open)
    while (i >= 0) {
      val s = i + open.length
      val e = block.indexOf(close, s)
      if (e < 0) return out.result()
      out += block.substring(s, e)
      i = block.indexOf(open, e + close.length)
    }
    out.result()
  }

  /** (loc, lastmod-or-"") entries of one `<urlset>` body: every `<url>`
    * block's trimmed `<loc>` plus its `<lastmod>` when present.
    */
  def parseUrlset(body: String): Vector[(String, String)] =
    parseUrlsetFull(body).map { case (loc, lm, _, _) => (loc, lm) }

  /** Full per-entry metadata of one `<urlset>` body: (loc, lastmod,
    * changefreq, priority_q10). `priority_q10` is the `<priority>` hint in
    * integer TENTHS (0–10) with the protocol's documented default 0.5 → 5
    * when absent or malformed — integer so every downstream ranking is
    * exact and oracle-replayable; `changefreq` is the raw token or "".
    */
  def parseUrlsetFull(body: String): Vector[(String, String, String, Long)] =
    tagValues(body, "url").map { block =>
      val loc = tagValues(block, "loc").headOption.getOrElse("").trim
      val lastmod = tagValues(block, "lastmod").headOption.getOrElse("")
      val changefreq = tagValues(block, "changefreq").headOption.getOrElse("").trim
      val priority = tagValues(block, "priority").headOption.getOrElse("").trim
      val q10 = priority match {
        case s if s.length == 3 && (s(0) == '0' || s(0) == '1') && s(1) == '.' &&
          s(2).isDigit => s(0).asDigit * 10L + s(2).asDigit
        case _ => 5L
      }
      (loc, lastmod, changefreq, q10)
    }.filter(_._1.nonEmpty)

  /** Child sitemap locations of one `<sitemapindex>` body. */
  def parseIndex(body: String): Vector[String] =
    tagValues(body, "sitemap")
      .flatMap(b => tagValues(b, "loc").headOption)
      .map(_.trim).filter(_.nonEmpty)

  /** All page entries advertised by the corpus's sitemap documents:
    * (host, sitemap_url, loc, lastmod). Index documents contribute no
    * entries themselves — their children are resolved by url back onto the
    * sitemap table (the fetch ≙ join shape) and parsed as urlsets.
    */
  def entries(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val sm = spark.read.parquet(s"$dir/sitemaps.parquet")
      .select(col("host"), col("url"), col("body"))
      .as[(String, String, String)]
    sm.filter(t => !isIndex(t._3)).flatMap { case (host, url, body) =>
      parseUrlset(body).map { case (loc, lm) => (host, url, loc, lm) }
    }.toDF("host", "sitemap_url", "loc", "lastmod")
  }

  /** [[entries]] with the full per-entry metadata — the hints a scheduler
    * consumes: (host, sitemap_url, loc, lastmod, changefreq, priority_q10).
    */
  def entriesMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val sm = spark.read.parquet(s"$dir/sitemaps.parquet")
      .select(col("host"), col("url"), col("body"))
      .as[(String, String, String)]
    sm.filter(t => !isIndex(t._3)).flatMap { case (host, url, body) =>
      parseUrlsetFull(body).map { case (loc, lm, cf, q) => (host, url, loc, lm, cf, q) }
    }.toDF("host", "sitemap_url", "loc", "lastmod", "changefreq", "priority_q10")
  }

  /** Priority-ordered fetch schedule from the advertised hints (sitemaps.org
    * `<priority>`: "the likelihood a crawler should prefer this url relative
    * to OTHERS ON THE SAME SITE"): duplicates across sibling sitemaps merge
    * by MAX hint, then each host ranks (priority desc, loc) and keeps its
    * top `perHost` — the which-urls-first decision a polite crawler with a
    * per-site budget makes before its first fetch.
    *
    * Scale shape: one (host, loc) aggregation plus a per-host top-k window
    * — host-keyed, and the top-k cuts before anything downstream widens.
    */
  def prioritySchedule(spark: SparkSession, sfDir: String,
      perHost: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(col("priority_q10").desc, col("loc"))
    entriesMeta(spark, sfDir)
      .groupBy(col("host"), col("loc"))
      .agg(max(col("priority_q10")).as("priority_q10"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= perHost)
  }

  /** The distinct advertised page urls as a (url_raw, line_no) list source
    * in (host, loc) order — sitemap-seeded list-crawl input ([[entries]]
    * first-wins by construction; the wave engine's A3 dedup handles the
    * duplicates the protocol allows across sibling sitemaps).
    */
  def seedLines(spark: SparkSession, sfDir: String): DataFrame =
    graft.crawl.WaveCrawler.withGlobalIndex(
      entries(spark, sfDir).select(col("host"), col("loc")),
      "line_no", col("host").asc, col("loc").asc)
      .select(col("loc").as("url_raw"), col("line_no"))

  /** The robots-SEEDED discovery chain — what a production crawler actually
    * runs (robots.txt §2.3 `Sitemap:` lines name the documents; nothing
    * else is fetched): parse every host's robots body for advertised
    * sitemap urls, "fetch" them by equi-join onto the served-sitemaps
    * table (a dead advertised url is a fetch miss and silently drops — the
    * crawl's P8 skip), resolve one `<sitemapindex>` level the same way,
    * and parse the resulting urlsets. Differs from [[entries]] exactly on
    * the corpus's traps: the orphan `sitemap-old.xml` documents (served
    * but advertised nowhere) contribute nothing here, and odd hosts'
    * advertised-but-unserved `sitemap-extra.xml` is tolerated.
    *
    * Scale shape: two broadcast-or-shuffle equi-joins keyed by url plus
    * narrow per-body parses — no step is wider than the sitemap table
    * itself (host-count-bounded, orders of magnitude below `pages`).
    */
  def discoveredEntries(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val adv = spark.read.parquet(s"$dir/robots_txt.parquet")
      .select(col("host"), col("body")).as[(String, String)]
      .flatMap { case (h, b) =>
        graft.crawl.RobotsParser.sitemaps(b).map(u => (h, u))
      }.toDF("host", "adv_url").distinct()
    val sm = spark.read.parquet(s"$dir/sitemaps.parquet")
      .select(col("url"), col("body"))
    def fetch(req: DataFrame): org.apache.spark.sql.Dataset[(String, String, String)] =
      req.join(sm, req("adv_url") === sm("url"))
        .select(col("host"), col("adv_url").as("sitemap_url"), col("body"))
        .as[(String, String, String)]
    val f0 = fetch(adv)
    val kids = f0.filter(t => isIndex(t._3)).flatMap { case (h, _, b) =>
      parseIndex(b).map(c => (h, c))
    }.toDF("host", "adv_url")
    f0.filter(t => !isIndex(t._3)).union(fetch(kids))
      .flatMap { case (h, u, b) =>
        parseUrlset(b).map { case (loc, lm) => (h, u, loc, lm) }
      }.toDF("host", "sitemap_url", "loc", "lastmod")
  }
}
