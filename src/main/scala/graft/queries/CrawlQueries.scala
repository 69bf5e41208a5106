package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.crawl.{CrawlConfig, CrawlOutput, WaveCrawler}
import graft.extract.{LinkExtractor, Processor}
import graft.glob.Glob
import graft.url.UrlNorm

/** SparkEntry.queries backing for the crawl engine (SURVEY.md §2).
  *
  * Each query runs over the deterministic synthetic corpus
  * (CorpusGen.ensureFor) and has a DuckDB oracle over the generator's
  * ground-truth side tables (`links`, `meta`, `robots`) — the oracle SQL
  * lives in SparkEntry.oracleSql and reads those parquet files directly.
  *
  * Crawl outputs are cached per (sfDir, variant) so Verify/Bench don't
  * re-crawl for every derived query.
  */
object CrawlQueries {

  val Seed = "http://host0.test/"

  private val crawlCache = new java.util.concurrent.ConcurrentHashMap[(String, String), CrawlOutput]()

  private def cached(spark: SparkSession, sfDir: String, variant: String)(
      run: String => CrawlOutput): CrawlOutput =
    crawlCache.computeIfAbsent((sfDir, variant), { _ =>
      run(CorpusGen.ensureFor(spark, sfDir))
    })

  /** Full-corpus crawl from the host0 seed: save everything fetched,
    * including the readability article HTML (reference PageData parity).
    */
  def fullCrawl(spark: SparkSession, sfDir: String): CrawlOutput =
    cached(spark, sfDir, "full") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, keepArticleHtml = true))
    }

  /** Crawl saving only pages matching the articles doublestar glob. */
  def articlesCrawl(spark: SparkSession, sfDir: String): CrawlOutput =
    cached(spark, sfDir, "articles") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, matchPatterns = Seq("/articles/**")))
    }

  /** Crawl with a global page limit (serialized-prefix cut, SURVEY §2.6 L2). */
  def limitCrawl(spark: SparkSession, sfDir: String, limit: Int): CrawlOutput =
    cached(spark, sfDir, s"limit$limit") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, pageLimit = limit))
    }

  /** Crawl with robots.txt rules enforced at discovery (J3/north rule):
    * host0 disallows /misc, so no /misc url is ever enqueued.
    */
  def robotsCrawl(spark: SparkSession, sfDir: String): CrawlOutput =
    cached(spark, sfDir, "robots") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, useRobots = true))
    }

  /** Crawl gated by the RFC 9309 full-grammar rule semantics (X25
    * integrated into the wave scheduler): a link is enqueued only if its
    * longest-matching rule is an allow (or nothing matches). The rules are
    * NOT a constant — they are parsed from the corpus's served
    * `/robots.txt` bodies by [[graft.crawl.RobotsParser]] (the production
    * fetch→parse→gate pipeline), per host.
    */
  def robots9309Crawl(spark: SparkSession, sfDir: String): CrawlOutput =
    cached(spark, sfDir, "robots9309") { dir =>
      // parsed rules flow as a host-keyed TABLE through the engine's join
      // gate (scale shape — rules never transit the driver)
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, robots9309 = true,
          robots9309RulesDf = Some(graft.crawl.Robots9309.parsedRules(spark, sfDir))))
    }

  /** Multi-host crawl gated by per-host PARSED RFC 9309 rules: hosts carry
    * deliberately different robots.txt bodies (specific-group, longest-
    * token, and *-fallback classes), so crossing a host boundary switches
    * rule sets mid-crawl — the full production robots dataflow in one
    * query. Scheduling-only, like the prefix-rules multihost crawl.
    */
  def multihost9309Crawl(spark: SparkSession, sfDir: String): CrawlOutput =
    cached(spark, sfDir, "multihost9309") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, sameHostOnly = false, robots9309 = true,
          robots9309RulesDf = Some(graft.crawl.Robots9309.parsedRules(spark, sfDir)),
          extractContent = false))
    }

  /** Seen set of the multi-host parsed-rules crawl. */
  def multihost9309Seen(spark: SparkSession, sfDir: String): DataFrame =
    multihost9309Crawl(spark, sfDir).seen
      .select(col("url"), col("depth").cast("long").as("depth"))

  /** Seen set of the RFC-9309-gated crawl. */
  def robots9309Seen(spark: SparkSession, sfDir: String): DataFrame =
    robots9309Crawl(spark, sfDir).seen
      .select(col("url"), col("depth").cast("long").as("depth"))

  /** Crawl with --follow-match restricting link expansion (P5): only links
    * whose path matches the glob are enqueued (saving is unrestricted).
    */
  def followCrawl(spark: SparkSession, sfDir: String): CrawlOutput =
    cached(spark, sfDir, "follow") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed,
          followPatterns = Seq("/", "/articles/**", "/docs/**")))
    }

  /** Multi-host (Common-Crawl-shaped) crawl: sameHostOnly=false follows
    * every http(s) link across hosts from the host0 seed, with robots rules
    * enforced via the broadcast anti-join against the rules table (J3 at its
    * scale shape — no driver-side rule map). Scheduling-only: the seen set
    * is the oracle target; readability is exercised by the same-host
    * queries.
    */
  def multihostCrawl(spark: SparkSession, sfDir: String): CrawlOutput =
    cached(spark, sfDir, "multihost") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, sameHostOnly = false, useRobots = true,
          extractContent = false))
    }

  /** Seen set of the multi-host crawl. */
  def multihostSeen(spark: SparkSession, sfDir: String): DataFrame =
    multihostCrawl(spark, sfDir).seen
      .select(col("url"), col("depth").cast("long").as("depth"))

  /** Seen set of the robots-aware crawl. */
  def robotsSeen(spark: SparkSession, sfDir: String): DataFrame =
    robotsCrawl(spark, sfDir).seen
      .select(col("url"), col("depth").cast("long").as("depth"))

  /** Seen set of the follow-match crawl. */
  def followSeen(spark: SparkSession, sfDir: String): DataFrame =
    followCrawl(spark, sfDir).seen
      .select(col("url"), col("depth").cast("long").as("depth"))

  /** Interrupted-then-resumed crawl (north-rule resumability): run the first
    * 3 waves with checkpointing, then resume from the checkpoint to the end.
    * Must equal the uninterrupted crawl exactly.
    */
  /** Scratch root for streaming outputs / crawl checkpoints: SPARK_GRAFT_WORK
    * env override, else ./work under the process cwd (repo-relative, not a
    * hardcoded absolute path), suffixed with the Spark application id so
    * concurrent verify runs on the same sf label cannot clobber each other's
    * checkpoints (each app id is unique per JVM).
    */
  private def scratchDir(spark: SparkSession, parts: String*): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_WORK",
      new java.io.File("work").getAbsolutePath)
    (root +: parts :+ spark.sparkContext.applicationId).mkString("/")
  }

  def resumedCrawl(spark: SparkSession, sfDir: String): CrawlOutput =
    cached(spark, sfDir, "resumed") { dir =>
      val label = sfDir.replaceAll("/+$", "").split('/').last
      val ck = scratchDir(spark, "ck", label)
      deleteRecursively(new java.io.File(ck))
      val pages = CorpusGen.pages(spark, dir)
      val cfg = CrawlConfig(startUrl = Seed, checkpointDir = Some(ck))
      WaveCrawler.crawl(spark, pages, cfg.copy(maxWaves = 3)) // "killed" after wave 3
      WaveCrawler.resume(spark, pages, cfg) // picks up from the wave-3 snapshot
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  private val warcDirCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Pages table reconstructed THROUGH the warc format: the engine's own
    * WARC sink output written to scratch files (executor-side, byte-exact)
    * and parsed back by [[graft.sources.WarcReader]]. Cached per sfDir so
    * the roundtrip and the crawl-from-warc queries share one write.
    */
  def warcPages(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = warcDirCache.computeIfAbsent(sfDir, { _ =>
      val label = sfDir.replaceAll("/+$", "").split('/').last
      val out = scratchDir(spark, "warc", label)
      deleteRecursively(new java.io.File(out))
      graft.sources.WarcReader.writeWarc(
        graft.sinks.Warc.warcRecords(spark, sfDir).select("warc_record"), out)
      out
    })
    graft.sources.WarcReader.readPages(spark, dir)
  }

  /** Byte-equality witness of read(write(pages)) ≡ pages: url, the parsed
    * WARC-Date header, and the payload's digest + octet count, compared
    * against the ground-truth pages table the sink consumed.
    */
  def warcRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    warcPages(spark, sfDir).select(
      col("url"),
      col("warc_date"),
      sha2(col("html"), 256).as("html_sha"),
      octet_length(col("html")).cast("long").as("n_bytes"))

  private val wetDirCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Extracted text reconstructed THROUGH the WET format: the engine's own
    * conversion records ([[graft.sinks.Warc.wetRecords]] — payload = the
    * full readability→markdown kernel's output) written to scratch `.warc`
    * files executor-side and parsed back by the same Content-Length-framed
    * reader that ingests response captures. Closing this loop matters
    * because WET is how text corpora actually move between pipelines
    * (Common Crawl's text distribution IS wet files): a consumer must be
    * able to re-ingest exactly what this engine publishes.
    */
  def wetRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = wetDirCache.computeIfAbsent(sfDir, { _ =>
      val label = sfDir.replaceAll("/+$", "").split('/').last
      val out = scratchDir(spark, "wet", label)
      deleteRecursively(new java.io.File(out))
      graft.sources.WarcReader.writeWarc(
        graft.sinks.Warc.wetRecords(spark, sfDir).select("wet_record"), out)
      out
    })
    graft.sources.WarcReader.readRecords(spark, dir)
      .filter(col("warc_type") === "conversion")
      .select(
        col("url"),
        col("warc_date"),
        sha2(col("html"), 256).as("text_sha"),
        octet_length(col("html")).cast("long").as("n_bytes"))
  }

  private val revisitDirCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The recrawl cycle's WARC output re-ingested and RESOLVED: revisit
    * records carry no payload, so an archive reader materialises the new
    * snapshot by splicing each revisit's payload from the capture it
    * refers to (here the v1 response warc — same target URI under the
    * identical-payload-digest profile) while response records carry their
    * own bytes. The reconstructed table must byte-match the true v2
    * snapshot — write(revisit) ∘ read ∘ resolve ≡ recrawl, the property
    * that makes payload-less revisit storage safe at all.
    *
    * Scale shape: one url-keyed join of the (tiny) revisit set against the
    * prior cycle's captures; response payloads stream through untouched.
    */
  def revisitResolve(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = revisitDirCache.computeIfAbsent(sfDir, { _ =>
      val label = sfDir.replaceAll("/+$", "").split('/').last
      val out = scratchDir(spark, "revisit", label)
      deleteRecursively(new java.io.File(out))
      graft.sources.WarcReader.writeWarc(
        graft.sinks.Warc.revisitRecords(spark, sfDir).select("warc_record"), out)
      out
    })
    val recs = graft.sources.WarcReader.readRecords(spark, dir)
    val own = recs.filter(col("warc_type") === "response")
      .select(col("url"), col("html"), lit("response").as("via"))
    val spliced = recs.filter(col("warc_type") === "revisit")
      .select(col("url"))
      .join(warcPages(spark, sfDir).select(col("url"), col("html")), Seq("url"))
      .select(col("url"), col("html"), lit("revisit").as("via"))
    own.unionByName(spliced).select(
      col("url"), col("via"),
      sha2(col("html"), 256).as("html_sha"),
      octet_length(col("html")).cast("long").as("n_bytes"))
  }

  /** Incremental inverted-index maintenance across the recrawl cycle: the
    * index over cycle 2 is NOT rebuilt — the changed urls' postings are
    * retracted (one url-keyed anti-join against the tiny change set) and
    * the re-extracted delta's postings appended. The result must EQUAL a
    * from-scratch build over the full v2 extraction — the invariant that
    * lets a standing pipeline keep a corpus-scale index fresh for the cost
    * of the delta (at a typical cycle that is 2–3 orders of magnitude less
    * tokenisation + shuffle than a rebuild).
    */
  def searchIndexDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val p1 = graft.pipeline.Search.postingsOf(
      extractMarkdown(spark, sfDir), "url", "markdown")
    val changed = recrawlChanged(spark, sfDir)
    val deltaMd = changed.as[(String, Array[Byte])]
      .map { case (u, hb) =>
        val html = new String(hb, java.nio.charset.StandardCharsets.UTF_8)
        Processor.processHTML(u, html, "").fold(_ => (u, ""), pd => (u, pd.markdown))
      }
      .toDF("url", "markdown")
    p1.join(changed.select(col("url")), Seq("url"), "left_anti")
      .unionByName(graft.pipeline.Search.postingsOf(deltaMd, "url", "markdown"))
  }

  /** Per-host churn report of the recrawl cycle — captures, changed
    * (full response rewritten), stable (payload-less revisit), and the
    * byte volume the revisit mechanism actually avoided writing. The
    * observability row a standing crawl watches cycle over cycle.
    */
  def churnStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.sinks.Warc.revisitRecords(spark, sfDir)
      .join(CorpusGen.pages(spark, CorpusGen.ensureFor(spark, sfDir))
        .select(col("url"), octet_length(col("html")).cast("long").as("v1_bytes")),
        Seq("url"))
      .groupBy(regexp_extract(col("url"), "^https?://([^/]+)", 1).as("host"))
      .agg(
        count(lit(1)).as("n_captures"),
        sum(when(col("record_type") === "response", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("record_type") === "revisit", 1L).otherwise(0L)).as("n_stable"),
        sum(when(col("record_type") === "revisit", col("v1_bytes")).otherwise(0L))
          .as("bytes_saved"))

  /** Next-cycle refresh budget K, apportioned across hosts by observed
    * change rate with the largest-remainder (Hamilton) method — exact
    * integer apportionment, the same math as seat allocation: weight
    * w_h = n_changed + 1 (the +1 keeps never-yet-changed hosts probed),
    * base_h = ⌊K·w_h / W⌋, and the K − Σbase leftover slots go to the
    * largest remainders (ties by host). Σ alloc ≡ K exactly — a crawl
    * scheduler's budget must conserve, floats can't promise that.
    *
    * Scale shape: host-keyed aggregation + one broadcastable 1-row total +
    * a rank window over hosts (host-count-bounded, orders below pages).
    */
  def refreshBudget(spark: SparkSession, sfDir: String,
      budget: Long = RefreshBudget): DataFrame =
    graft.pipeline.Apportion.largestRemainder(
      churnStats(spark, sfDir)
        .select(col("host"), col("n_changed"), (col("n_changed") + 1L).as("weight")),
      budget, Seq("host"))
      .select(col("host"), col("n_changed"), col("weight"), col("alloc"))

  /** Hint-aware sitemap due set: an advertised entry is due for refetch at
    * the cycle date when its `<lastmod>` plus the `<changefreq>` interval
    * has lapsed (always/hourly → every cycle, daily 1, weekly 7, monthly
    * 30, yearly 365, never → never; entries with no hint default weekly —
    * the X55 lastmod-only recrawl, upgraded with the v18 hints). Entries
    * without lastmod are never "due" here (nothing to age).
    */
  def sitemapDue(spark: SparkSession, sfDir: String,
      cycleDate: String = SitemapRecrawlCutoff): DataFrame = {
    val days = when(col("changefreq").isin("always", "hourly"), 0)
      .when(col("changefreq") === "daily", 1)
      .when(col("changefreq") === "monthly", 30)
      .when(col("changefreq") === "yearly", 365)
      .otherwise(7) // weekly, and the protocol-silent default
    graft.sources.Sitemap.entriesMeta(spark, sfDir)
      .filter(col("lastmod") =!= "")
      .select(col("host"), col("loc"), col("lastmod"), col("changefreq"),
        when(col("changefreq") === "never", 0L)
          .when(date_add(to_date(col("lastmod")), days) <= to_date(lit(cycleDate)), 1L)
          .otherwise(0L).as("due"))
      .distinct()
  }

  /** BFS crawl whose INPUT is the warc files, not the parquet corpus: the
    * reader's (url, html) feeds the wave scheduler directly, and the seen
    * set must equal the parquet-fed crawl's — the full ingest→crawl path
    * over the interchange format.
    */
  def warcBfsSeen(spark: SparkSession, sfDir: String): DataFrame =
    cached(spark, sfDir, "warcbfs") { _ =>
      WaveCrawler.crawl(spark, warcPages(spark, sfDir).select(col("url"), col("html")),
        CrawlConfig(startUrl = Seed, extractContent = false))
    }.seen.select(col("url"), col("depth").cast("long").as("depth"))

  // ---------------------------------------------------------------- queries

  /** Seen set with BFS depth — equals min-distance reachability over the
    * ground-truth link graph (visited-at-enqueue ⇒ first discoverer wins at
    * the minimum depth; SURVEY §7.4a).
    */
  def bfsSeen(spark: SparkSession, sfDir: String): DataFrame =
    fullCrawl(spark, sfDir).seen
      .select(col("url"), col("depth").cast("long").as("depth"))

  /** Per-page `<meta name="robots">` flags parsed from the raw HTML of
    * every non-empty corpus page — the acquisition step of the meta-robots
    * gate, pinned page-by-page against the encode-side ground truth. One
    * narrow mapPartitions; at 100 TB this is a scan-rate operator.
    */
  def metaFlags(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir).select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, htmlBytes) =>
        val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
        if (html.trim.isEmpty) None
        else {
          val (ni, nf) = graft.extract.Processor.metaRobots(
            graft.html.HtmlParser.parse(html))
          Some((url, if (ni) 1L else 0L, if (nf) 1L else 0L))
        }
      }.toDF("url", "noindex", "nofollow")
  }

  /** Per-page meta-refresh redirect targets, resolved and normalized
    * exactly as the crawl would enqueue them — '' when the page is not a
    * redirect. Pinned against the encode-side ground truth; the three raw
    * spellings (quoted relative, uppercase absolute, space-padded) must
    * all land on the same normalized value.
    */
  def redirectTargets(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir).select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, htmlBytes) =>
        val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
        if (html.trim.isEmpty) None
        else {
          val t = graft.extract.Processor.metaRefresh(
            graft.html.HtmlParser.parse(html))
            .flatMap(raw => graft.extract.LinkExtractor.resolveAccepted(
              url, raw, graft.url.UrlNorm.hostnameOf(url), allHosts = false))
            .getOrElse("")
          Some((url, t))
        }
      }.toDF("url", "redirect_to")
  }

  /** Per-page `<link rel="canonical">` targets, resolved and normalized —
    * '' when the page declares none. Self-canonicals resolve to the page's
    * own url. Pinned against the encode-side ground truth.
    */
  def canonicalTargets(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir).select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, htmlBytes) =>
        val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
        if (html.trim.isEmpty) None
        else {
          val t = graft.extract.Processor.canonicalOf(
            graft.html.HtmlParser.parse(html))
            .flatMap(raw => graft.extract.LinkExtractor.resolveAccepted(
              url, raw, graft.url.UrlNorm.hostnameOf(url), allHosts = false))
            .getOrElse("")
          Some((url, t))
        }
      }.toDF("url", "canonical_to")
  }

  /** Canonical-aware dedup fold (RFC 6596 as a pipeline op): every live
    * page groups under its declared canonical representative (itself when
    * it declares none, or declares itself). Returns
    * (url, rep, group_size) — the site-variant collapse an index or a
    * training-corpus dedup runs BEFORE any content hashing. One rep-keyed
    * aggregation + join; at 100 TB both shuffle on the canonical key only.
    */
  def canonicalFold(spark: SparkSession, sfDir: String): DataFrame = {
    val t = canonicalTargets(spark, sfDir)
    val withRep = t.select(col("url"),
      when(col("canonical_to") =!= "", col("canonical_to"))
        .otherwise(col("url")).as("rep"))
    val sizes = withRep.groupBy(col("rep"))
      .agg(count(lit(1)).cast("long").as("group_size"))
    withRep.join(sizes, Seq("rep"))
      .select(col("url"), col("rep"), col("group_size"))
  }

  /** Tracking-param URL scrubbing over a deterministic injected view
    * (the dd_pii_scrub idiom): every corpus url expands to three advertised
    * variants — the bare url, and two spellings carrying utm_ and click-id
    * tracking params around the same real params (`a`, `id`) in DIFFERENT
    * orders. [[graft.url.UrlScrub.scrub]] must strip exactly the tracking
    * keys, keep the real ones, and sort — so both tracked spellings fold to
    * one canonical url while the bare url (no query) stays itself. Returns
    * (url, scrubbed); the encode side (and the oracle) states the expected
    * scrubbed form by construction, the engine re-derives it with the real
    * parser. A narrow map — scan-rate at any scale.
    */
  def urlScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir).select(col("url")).as[String]
      .mapPartitions { it =>
        // one digest per task, reset by digest() — not one per row
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { url =>
          val h = graft.pipeline.TextAnalysis.hexOf(
            md5.digest(url.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            .take(4)
          Seq(url,
            s"$url?z=9&utm_source=feed&id=$h&a=1",
            s"$url?a=1&id=$h&utm_medium=rss&z=9")
            .map(v => (v, graft.url.UrlScrub.scrub(v)))
        }
      }.toDF("url", "scrubbed")
  }

  /** Redirect-CHAIN folding: every redirecting page resolved to the
    * terminal (non-redirect) page its meta-refresh walk lands on, with the
    * exact hop count — or flagged as trapped in a redirect cycle
    * (terminal = '', hops = −1). The corpus's redirect targets are random
    * same-host pages, so multi-hop chains and the occasional cycle occur
    * naturally; an index or recrawl scheduler folds chains ONCE rather than
    * re-walking them per consumer (and a cycle is a crawler trap to flag,
    * not to follow).
    *
    * Implementation is pointer doubling with exact step accumulation over
    * the jump function g(u) = (redirect_to(u), 1) for redirect pages and
    * the absorbing identity (u, 0) elsewhere: after k rounds the composed
    * jump covers 2^k hops, so ⌈log2(R+1)⌉ rounds (R = redirect count)
    * terminate every acyclic chain; rows whose cursor is still a redirect
    * page after that are exactly the cycle-trapped ones. The domain is
    * redirect sources ∪ targets — the corpus never enters the loop — and
    * each round is one self-join on that bounded set, eagerly checkpointed
    * (the [[graft.pipeline.Dedup.hashMinComponents]] discipline). At 10^10
    * urls with ~1% redirects this is ~34 rounds over a 10^8-row relation
    * keyed by url — logarithmic depth, shuffle bounded by the redirect set,
    * never the corpus.
    */
  def redirectChains(spark: SparkSession, sfDir: String): DataFrame =
    foldRedirectMap(redirectTargets(spark, sfDir)
      .filter(col("redirect_to") =!= "")
      .select(col("url").as("src"), col("redirect_to").as("dst")))

  /** The pointer-doubling fold behind [[redirectChains]], over an arbitrary
    * (src, dst) redirect map — factored out so cycles can be pinned on
    * constructed graphs independent of what a given corpus size happens to
    * contain.
    */
  def foldRedirectMap(edges: DataFrame): DataFrame = {
    val rt = edges.localCheckpoint(true)
    val nRedirects = rt.count()
    // jump domain: sources ∪ targets; non-redirect members absorb (nxt=self,
    // 0 steps). Closed under composition: every nxt is itself in the domain.
    val dom = rt.select(col("src").as("n"))
      .union(rt.select(col("dst").as("n"))).distinct()
    var jump = dom.join(rt, dom("n") === rt("src"), "left")
      .select(col("n"), coalesce(col("dst"), col("n")).as("nxt"),
        when(col("dst").isNotNull, 1L).otherwise(0L).as("steps"))
      .localCheckpoint(true)
    // 2^rounds must reach the longest possible acyclic chain (≤ R hops)
    val rounds = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(nRedirects))
    val srcSet = rt.select(col("src").as("r_src")).localCheckpoint(true)
    var r = 0
    var active = 1L
    while (r < rounds && active > 0) {
      val j2 = jump.select(col("n").as("m"), col("nxt").as("nxt2"),
        col("steps").as("steps2"))
      jump = jump.join(j2, jump("nxt") === j2("m"))
        .select(col("n"), col("nxt2").as("nxt"),
          (col("steps") + col("steps2")).as("steps"))
        .localCheckpoint(true)
      // early exit once every cursor sits on a non-redirect page (chains in
      // a cycle keep this positive, so cyclic inputs just run the full
      // logarithmic budget)
      active = jump.join(srcSet, jump("nxt") === col("r_src")).count()
      r += 1
    }
    val ans = rt.select(col("src").as("url"))
      .join(jump, col("url") === jump("n"))
      .join(srcSet, jump("nxt") === col("r_src"), "left")
    ans.select(col("url"),
      when(col("r_src").isNull, col("nxt")).otherwise(lit("")).as("terminal"),
      when(col("r_src").isNull, col("steps")).otherwise(lit(-1L))
        .cast("long").as("hops"),
      when(col("r_src").isNull, 0L).otherwise(1L).cast("long").as("cycled"))
  }

  /** The indexer's representative-url fold — X68 × X51 composed: which
    * single url stands for each page's content once redirects AND
    * canonical declarations are honored. Non-redirect pages fold to their
    * declared canonical (self when none); redirect sources fold to the
    * canonical-or-self of their chain TERMINAL (possibly an empty page,
    * which declares nothing); cycle-trapped sources get no representative
    * (rep = '', via = 'cycle' — a trap to flag, not to index). `via`
    * records which rule fired: self / canonical / redirect /
    * redirect+canonical. Two proven folds plus two url-keyed joins — at
    * scale the chain fold dominates and everything else is linear.
    */
  def indexFold(spark: SparkSession, sfDir: String): DataFrame = {
    val canon = canonicalTargets(spark, sfDir).localCheckpoint(true)
    val chains = redirectChains(spark, sfDir)
    val repOf = canon.select(col("url").as("cu"),
      when(col("canonical_to") =!= "", col("canonical_to"))
        .otherwise(col("url")).as("crep"))
    val base = canon
      .join(chains.select(col("url").as("ru")), col("url") === col("ru"), "left_anti")
      .select(col("url"),
        when(col("canonical_to") =!= "", col("canonical_to"))
          .otherwise(col("url")).as("rep"),
        when(col("canonical_to") =!= "", lit("canonical"))
          .otherwise(lit("self")).as("via"))
    val red = chains
      .join(repOf, chains("terminal") === repOf("cu"), "left")
      .select(chains("url"),
        when(col("cycled") === 1L, lit(""))
          .otherwise(coalesce(col("crep"), col("terminal"))).as("rep"),
        when(col("cycled") === 1L, lit("cycle"))
          .when(col("crep").isNotNull && col("crep") =!= col("terminal"),
            lit("redirect+canonical"))
          .otherwise(lit("redirect")).as("via"))
    base.unionByName(red)
  }

  /** Full host0 BFS following meta-refresh redirects
    * (CrawlConfig.followRedirects): a redirecting page is seen but never
    * saved, and its only outgoing edge is the refresh target. Same
    * (url, depth, saved) shape as the meta-robots gate.
    */
  def redirectCrawl(spark: SparkSession, sfDir: String): DataFrame = {
    val out = cached(spark, sfDir, "redirects") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, followRedirects = true, extractContent = false))
    }
    out.seen.select(col("url"), col("depth").cast("long").as("depth"))
      .join(out.saved.select(col("url"), lit(1L).as("saved")), Seq("url"), "left")
      .select(col("url"), col("depth"), coalesce(col("saved"), lit(0L)).as("saved"))
  }

  /** Full host0 BFS honoring the page-level meta-robots directives
    * (CrawlConfig.metaRobots): nofollow pages stop expanding, noindex
    * pages stay unsaved. Returns every seen url with its first-discovery
    * depth and a saved 0/1 flag — both semantics land in one row set.
    */
  def metaGatedCrawl(spark: SparkSession, sfDir: String): DataFrame = {
    val out = cached(spark, sfDir, "metaRobots") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, metaRobots = true, extractContent = false))
    }
    out.seen.select(col("url"), col("depth").cast("long").as("depth"))
      .join(out.saved.select(col("url"), lit(1L).as("saved")), Seq("url"), "left")
      .select(col("url"), col("depth"), coalesce(col("saved"), lit(0L)).as("saved"))
  }

  /** Same BFS with the cuckoo seen-filter forced from wave 1 (seenFilter =
    * "cuckoo", engagement threshold 0). The filter is a pre-filter only —
    * exact results are filter-independent — so the oracle is the same
    * min-depth reachability CTE as crawl_bfs_seen: the row pins the entire
    * cuckoo build/merge/probe lifecycle end-to-end at the driver gate.
    */
  def cuckooSeen(spark: SparkSession, sfDir: String): DataFrame =
    cached(spark, sfDir, "cuckoo") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, seenFilter = "cuckoo", bloomMinSeen = 0L))
    }.seen.select(col("url"), col("depth").cast("long").as("depth"))

  /** Incremental recrawl over a deterministic snapshot update: in v2 every
    * page with page_idx % 7 == 3 serves the SAME HOST's page_idx-1 html
    * (whose extraction ground truth already exists) with warc_ts advanced
    * one day; everything else is byte-identical. [[graft.crawl.Recrawl]]
    * re-extracts ONLY the delta and splices it into the prior extraction —
    * changed urls must come back with the donor page's markdown (hrefs in
    * the corpus are root-relative or absolute, so the donor's markdown is
    * base-page-independent within a host), unchanged urls with their own.
    */
  def recrawlDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val pages = CorpusGen.pages(spark, dir)
    val v2 = pages.join(recrawlChanged(spark, sfDir), Seq("url"), "left")
      .select(col("url"),
        when(col("donor_html").isNotNull, col("warc_ts") + expr("INTERVAL 1 DAY"))
          .otherwise(col("warc_ts")).as("warc_ts"),
        coalesce(col("donor_html"), col("html")).as("html"))
    graft.crawl.Recrawl.refresh(spark, pages, v2, extractMarkdown(spark, sfDir))
  }

  /** The recrawl cycle's deterministic change set: every page at
    * page_idx % 7 == 3 takes the PREVIOUS page's html as its "edited"
    * content (the donor is base-page-independent within a host — hrefs are
    * root-relative or absolute). Returns (url, donor_html); pages absent
    * here are content-unchanged in cycle 2. Shared by the ts-delta recrawl
    * ([[recrawlDelta]]) and the digest-keyed WARC revisit sink
    * ([[graft.sinks.Warc.revisitRecords]]).
    */
  def recrawlChanged(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val pages = CorpusGen.pages(spark, dir)
    def intOrElse(c: org.apache.spark.sql.Column, dflt: Int) =
      coalesce(when(c =!= "", c).otherwise(lit(null)).cast("int"), lit(dflt))
    val keyed = pages
      .withColumn("host_idx",
        intOrElse(regexp_extract(col("url"), "^http://host(\\d+)\\.test", 1), -1))
      .withColumn("page_idx",
        intOrElse(regexp_extract(col("url"), "page-(\\d+)$", 1), 0))
    val donors = keyed
      .select(col("host_idx").as("d_host"), (col("page_idx") + 1).as("d_for"),
        col("html").as("donor_html"))
    keyed.where(pmod(col("page_idx"), lit(7)) === 3)
      .join(donors, col("host_idx") === col("d_host") && col("page_idx") === col("d_for"))
      .select(col("url"), col("donor_html"))
  }

  /** Saved pages of the full crawl with their extracted titles (H4 title
    * parity against the generator's ground truth).
    */
  def savedTitles(spark: SparkSession, sfDir: String): DataFrame =
    fullCrawl(spark, sfDir).saved.select(col("url"), col("title"))

  /** Saved pages with the readability article HTML column (PageData parity,
    * config keepArticleHtml) — byte-exact vs the generator's derivation.
    */
  def savedArticleHtml(spark: SparkSession, sfDir: String): DataFrame =
    fullCrawl(spark, sfDir).saved.select(col("url"), col("article_html"))

  /** Saved set of the articles-glob crawl (P4 match predicate end-to-end). */
  def savedArticles(spark: SparkSession, sfDir: String): DataFrame =
    articlesCrawl(spark, sfDir).saved.select(col("url"), col("title"))

  /** Saved-page count under --limit K: the engine must stop at exactly K. */
  def limitCut(spark: SparkSession, sfDir: String, limit: Int): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    Seq(limitCrawl(spark, sfDir, limit).saved.count()).toDF("saved_cnt")
  }

  /** The EXACT saved url set under --limit K, including the partial cut
    * depth's within-wave FIFO prefix (reference crawler.go:326-330): enqueue
    * order is (depth, parent_seq, link_pos), so a url's rank is the
    * lexicographic min over its shortest-path pos-arrays — which the oracle
    * recomputes in recursive SQL over the ground-truth link graph.
    */
  def limitSet(spark: SparkSession, sfDir: String, limit: Int): DataFrame =
    limitCrawl(spark, sfDir, limit).saved
      .select(col("url"), col("depth").cast("long").as("depth"))

  /** Seen set of the interrupted+resumed crawl — must equal bfsSeen. */
  def resumedSeen(spark: SparkSession, sfDir: String): DataFrame =
    resumedCrawl(spark, sfDir).seen
      .select(col("url"), col("depth").cast("long").as("depth"))

  /** Per-wave scheduler metrics vs per-depth ground truth. */
  def waveMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    fullCrawl(spark, sfDir).metrics
      .map(m => (m.depth.toLong, m.popped, m.fetched))
      .toDF("depth", "popped", "fetched")
  }

  /** H1 link extraction over every corpus page: (src_url, dst_url, pos) must
    * equal the generator's `links` ground truth byte-for-byte.
    */
  def linkExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir)
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, htmlBytes) =>
        val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
        val host = UrlNorm.hostnameOf(url)
        LinkExtractor.extract(url, host, html, Nil).zipWithIndex
          .map { case (dst, pos) => (url, dst, pos.toLong) }
      }
      .toDF("src_url", "dst_url", "pos")
  }

  /** H1 in multi-host mode over every page: all http(s) links regardless of
    * host, first-wins page order — checked against the `xlinks` ground
    * truth.
    */
  def xlinkExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir)
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, htmlBytes) =>
        val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
        LinkExtractor.extract(url, "", html, Nil, allHosts = true).zipWithIndex
          .map { case (dst, pos) => (url, dst, pos.toLong) }
      }
      .toDF("src_url", "dst_url", "pos")
  }

  /** H1-with-text in multi-host mode over every page: (src, dst, pos,
    * anchor_text) where anchor_text is the FIRST anchor's collapsed text —
    * the classic web-search in-link description signal. Checked against
    * the `xlinks` ground truth (which carries encode-side anchor text).
    * Scale shape: one narrow flatMap over the pruned (url, html) scan —
    * no shuffle; downstream consumers (anchor index) aggregate on dst.
    */
  def anchorText(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir)
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, htmlBytes) =>
        val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
        LinkExtractor.extractWithText(url, "", html, Nil, allHosts = true)
          .zipWithIndex
          .map { case ((dst, text), pos) => (url, dst, pos.toLong, text) }
      }
      .toDF("src_url", "dst_url", "pos", "anchor_text")
  }

  /** Anchor index over [[anchorText]]: per (dst, anchor_text) the number of
    * distinct linking pages — the in-link description signal a ranker
    * consumes (anchor fields in BM25F). One (dst, text)-keyed shuffle with
    * map-side partial distinct — scales.
    */
  def anchorIndex(spark: SparkSession, sfDir: String): DataFrame =
    anchorText(spark, sfDir)
      .groupBy(col("dst_url"), col("anchor_text"))
      .agg(countDistinct(col("src_url")).as("n_srcs"))

  /** Distinct-url count above which a (host, path-template) is flagged as
    * a crawler-trap suspect.
    */
  val TrapThreshold = 100L

  /** Crawler-trap template mining over the advertised url space: collapse
    * every digit run in the path to `N` (so `/cal/2026/08/18` and
    * `/cal/2026/08/19` share a template) and count distinct urls + link
    * occurrences per (host, template). Templates minting unboundedly many
    * urls — calendars, session ids, pagination mills — are exactly the
    * shapes that trap a BFS crawler; `is_trap` flags any template whose
    * distinct-url count reaches [[TrapThreshold]].
    *
    * Scale shape: one (host, template)-keyed map-side-combined aggregation
    * over the extractor output — the same shuffle class as the host-edge
    * rollup; nothing driver-side. At 10^10 urls a frontier gate would
    * consume this table as a broadcast blocklist of flagged templates.
    */
  def urlTemplates(spark: SparkSession, sfDir: String,
      threshold: Long = TrapThreshold): DataFrame =
    xlinkExtract(spark, sfDir)
      .select(
        regexp_extract(col("dst_url"), "^https?://([^/]+)", 1).as("dst_host"),
        regexp_replace(
          regexp_extract(col("dst_url"), "^https?://[^/]+(.*)$", 1),
          "[0-9]+", "N").as("path_template"),
        col("dst_url"))
      .groupBy(col("dst_host"), col("path_template"))
      .agg(countDistinct(col("dst_url")).as("n_urls"),
        count(lit(1)).as("n_links"))
      .withColumn("is_trap", (col("n_urls") >= threshold).cast("long"))

  /** Trap-gated BFS: mine the blocklist (each host's most-minted template,
    * the [[urlTemplates]] audit's worst offender), feed it to the wave
    * engine's kernel gate, crawl from the host0 seed. Blocked urls never
    * enter seen/frontier (robots-disallow semantics), so seen = min-depth
    * reachability over the template-filtered link graph — which is what the
    * oracle replays. The blocklist collect is host-bounded (1 row/host).
    */
  /** The mined trap blocklist: each host's most-minted template (the
    * [[urlTemplates]] audit's worst offender). Host-bounded collect
    * (1 row/host).
    */
  private def minedTrapBlocklistDf(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst_host")).orderBy(col("n_urls").desc, col("path_template"))
    urlTemplates(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("dst_host").as("host"), col("path_template").as("template"))
  }

  def trapGatedSeen(spark: SparkSession, sfDir: String): DataFrame =
    cached(spark, sfDir, "trapbfs") { dir =>
      // blocklist flows as a host-keyed TABLE through the engine's
      // anti-join gate — never a driver-side map (scale shape; the join is
      // broadcast-hinted while the table is genuinely small)
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, extractContent = false,
          trapTemplatesDf = Some(minedTrapBlocklistDf(spark, sfDir))))
    }.seen.select(col("url"), col("depth").cast("long").as("depth"))

  /** EVERY production gate composed into one wave-engine run: per-host
    * PARSED RFC 9309 rules, the mined trap blocklist, page-level
    * meta-robots directives, and meta-refresh redirect following — the
    * configuration a real production crawl runs, exercised as a single
    * dataflow. Seen = reachability over the jointly-filtered graph
    * (redirect pages contribute only their target; nofollow pages stop
    * expanding; dst urls must pass the longest-match robots verdict AND
    * the template gate), saved = live ∧ ¬noindex ∧ ¬redirect.
    */
  def fullGatesCrawl(spark: SparkSession, sfDir: String): DataFrame = {
    val out = cached(spark, sfDir, "fullGates") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, extractContent = false,
          robots9309 = true,
          robots9309RulesDf = Some(graft.crawl.Robots9309.parsedRules(spark, sfDir)),
          trapTemplatesDf = Some(minedTrapBlocklistDf(spark, sfDir)),
          metaRobots = true,
          followRedirects = true))
    }
    out.seen.select(col("url"), col("depth").cast("long").as("depth"))
      .join(out.saved.select(col("url"), lit(1L).as("saved")), Seq("url"), "left")
      .select(col("url"), col("depth"), coalesce(col("saved"), lit(0L)).as("saved"))
  }

  /** H4+H5+H6 over every corpus page: extracted titles. */
  def extractTitles(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir)
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .map { case (url, htmlBytes) =>
        val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
        val title = Processor.processHTML(url, html, "").fold(_ => "", _.title)
        (url, title)
      }
      .toDF("url", "title")
  }

  /** H4+H5+H6 over every corpus page: full extracted markdown, checked
    * byte-for-byte against the generator's expected markdown — the north
    * rule's per-row invariant at the driver gate.
    */
  def extractMarkdown(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir)
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .map { case (url, htmlBytes) =>
        val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
        Processor.processHTML(url, html, "").fold(_ => (url, ""), pd => (url, pd.markdown))
      }
      .toDF("url", "markdown")
  }

  /** H2 --content-selector end-to-end, both branches of the reference's
    * decision tree (/root/reference/processor.go:31-48): selector "table"
    * hits only the i%5==1 pages (content = the table subtree, no <title> in
    * scope → empty title); every other page falls back to the full raw HTML
    * without pre-filter.
    */
  def selectorMd(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir)
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .map { case (url, htmlBytes) =>
        val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
        Processor.processHTML(url, html, "table")
          .fold(_ => (url, "", ""), pd => (url, pd.title, pd.markdown))
      }
      .toDF("url", "title", "markdown")
  }

  /** The --limit cut's saved PREFIX at full depths: every complete depth
    * below the depth where the running saved count crosses the limit must be
    * fully saved (the partial depth's within-wave seq order is pinned by the
    * FIFO-oracle suite in WaveCrawlerSpec).
    */
  def limitPrefix(spark: SparkSession, sfDir: String, limit: Int): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val saved = limitCrawl(spark, sfDir, limit).saved
    val cutDepth = saved.agg(max(col("depth"))).as[Int].head()
    saved.filter(col("depth") < cutDepth)
      .select(col("url"), col("depth").cast("long").as("depth"))
  }

  /** Robots prefix filtering (J3): links whose destination a robots rule
    * blocks. Broadcast join of the tiny per-host rule table (north star).
    */
  def robotsBlocked(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val links = linkExtract(spark, sfDir)
      .withColumn("dst_host", udf((u: String) => UrlNorm.hostnameOf(u)).apply(col("dst_url")))
      .withColumn("dst_path", udf((u: String) => UrlNorm.pathOf(u)).apply(col("dst_url")))
    val robots = spark.read.parquet(s"$dir/robots.parquet")
    links
      .join(broadcast(robots), links("dst_host") === robots("host"), "inner")
      .filter(col("dst_path").startsWith(col("disallow_prefix")))
      .select(col("src_url"), col("dst_url"))
  }

  /** Per-host politeness budget (J4): list-mode crawl over every url with a
    * per-host saved-page budget; output per-host saved counts.
    */
  /** All corpus urls as a distributed (url_raw, line_no) list source in
    * (host_idx, page_idx) order — the url "file" without a driver collect.
    */
  def urlLines(spark: SparkSession, dir: String, section: String = ""): DataFrame = {
    val meta = spark.read.parquet(s"$dir/meta.parquet")
    val picked = if (section.isEmpty) meta else meta.filter(col("section") === section)
    WaveCrawler.withGlobalIndex(
      picked.select(col("url"), col("host_idx"), col("page_idx")),
      "line_no", col("host_idx").asc, col("page_idx").asc)
      .select(col("url").as("url_raw"), col("line_no"))
  }

  /** Politeness-capped BFS of host0 (CrawlConfig.hostWaveCap): each wave
    * pops at most `cap` frontier urls per host in FIFO (seq) order and
    * defers the rest, so the fetch SCHEDULE stretches over more waves while
    * the seen set and min-discovery depths stay exactly BFS's. Output: the
    * fetched pages with the wave each was popped in — the pop/defer rounds
    * are replayed by the oracle's unrolled MATERIALIZED CTE chain.
    */
  def politenessCap(spark: SparkSession, sfDir: String, cap: Int): DataFrame =
    cached(spark, sfDir, s"wavecap$cap") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, hostWaveCap = cap, extractContent = false))
    }.saved.select(col("url"), col("depth").cast("long").as("depth"),
      col("wave").cast("long").as("wave"))

  /** Best-first priority crawl THROUGH the wave engine, politeness cap
    * active (X27 composed with X32): priorities are the fixed-point integer
    * host PageRank over the cross-host link graph; each wave pops the
    * global top-`pop` frontier urls by (pr desc, url) with at most `cap`
    * per host, deferring the rest. Multi-host, scheduling-only. Output:
    * the fetched (non-empty) pages with the wave each was popped in — the
    * full best-first schedule, replayed by the oracle's unrolled rounds
    * over the same PageRank CTE chain.
    */
  def priorityBfs(spark: SparkSession, sfDir: String, pop: Int, cap: Int): DataFrame =
    cached(spark, sfDir, s"priobfs${pop}_$cap") { dir =>
      val pr = graft.pipeline.HostGraph.hostPageRank(spark, sfDir)
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, sameHostOnly = false, extractContent = false,
          priorityHostRank = Some(pr), priorityPopPerWave = pop, hostWaveCap = cap))
    }.saved.select(col("url"), col("depth").cast("long").as("depth"),
      col("wave").cast("long").as("wave"))

  /** The crawl-delay politeness story end to end: per-host wave caps are
    * DERIVED from the parsed robots.txt crawl-delays (cap = budget div
    * delay — pops per scheduling round at a fixed wave duration; hosts
    * asking no delay get the default cap), then the multi-host FIFO
    * schedule runs under them. Output: fetched pages with their pop wave.
    */
  def politenessDelay(spark: SparkSession, sfDir: String,
      budget: Int, defCap: Int): DataFrame =
    cached(spark, sfDir, s"delaycap${budget}_$defCap") { dir =>
      // caps derived from the parsed crawl-delays as a host-keyed TABLE —
      // no driver collect anywhere in the delay→cap→schedule chain
      val capsDf = graft.crawl.Robots9309.hostDelayCapsDf(spark, sfDir, budget.toLong)
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(startUrl = Seed, sameHostOnly = false, extractContent = false,
          hostWaveCap = defCap, hostWaveCapsDf = Some(capsDf)))
    }.saved.select(col("url"), col("depth").cast("long").as("depth"),
      col("wave").cast("long").as("wave"))

  /** Sitemap-seeded list crawl: the advertised page urls (two-level index
    * resolved, locs trimmed, cross-sitemap duplicates first-wins) feed the
    * wave engine as a distributed url list; ghost entries (advertised but
    * not live) exercise the fetch-miss skip. Output: extracted titles.
    */
  def sitemapList(spark: SparkSession, sfDir: String): DataFrame =
    cached(spark, sfDir, "sitemaplist") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(urlListDf = Some(graft.sources.Sitemap.seedLines(spark, sfDir)),
          isUrlListMode = true))
    }.saved.select(col("url"), col("title"))

  /** The recrawl-scheduling cutoff for [[sitemapRecrawl]]: entries whose
    * sitemap `<lastmod>` is strictly newer are due.
    */
  val SitemapRecrawlCutoff = "2024-06-15"

  /** Next-cycle refresh budget apportioned by [[refreshBudget]] — one
    * constant shared by the engine default and the oracle literal.
    */
  val RefreshBudget = 200L

  /** Sitemap-lastmod-driven recrawl (X40 × X13 composed): a standing crawl
    * re-fetches only the urls whose robots-discovered sitemap entries
    * advertise a `<lastmod>` past the last-cycle cutoff — the
    * delta-selection step a production recrawl runs before touching any
    * page. The due set feeds the REAL list-mode wave engine (ghost/dead
    * entries are fetch misses, duplicates first-wins); ISO dates compare
    * as strings. Returns the refreshed (url, title).
    */
  def sitemapRecrawl(spark: SparkSession, sfDir: String): DataFrame =
    cached(spark, sfDir, "sitemaprecrawl") { dir =>
      val due = graft.sources.Sitemap.discoveredEntries(spark, sfDir)
        .filter(col("lastmod") =!= "" && col("lastmod") > lit(SitemapRecrawlCutoff))
        .select(col("host"), col("loc"))
      val seeds = WaveCrawler.withGlobalIndex(
        due, "line_no", col("host").asc, col("loc").asc)
        .select(col("loc").as("url_raw"), col("line_no"))
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(urlListDf = Some(seeds), isUrlListMode = true))
    }.saved.select(col("url"), col("title"))

  def hostBudget(spark: SparkSession, sfDir: String, budget: Int): DataFrame =
    cached(spark, sfDir, s"budget$budget") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(urlListDf = Some(urlLines(spark, dir)), isUrlListMode = true,
          hostPageBudget = budget, extractContent = false))
    }.saved.groupBy(col("host")).agg(count(lit(1)).as("saved_cnt"))

  /** A3 url-list first-wins dedup: lines = every url once (line i) plus every
    * third page duplicated afterwards; first_line must be the first index.
    */
  def listDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val meta = spark.read.parquet(s"$dir/meta.parquet")
    val base = WaveCrawler.withGlobalIndex(
      meta.select(col("url"), col("host_idx"), col("page_idx")),
      "line_no", col("host_idx").asc, col("page_idx").asc)
    val total = base.count()
    val dups = base.filter(col("page_idx") % 3 === 0)
      .withColumn("line_no", col("line_no") + lit(total))
    val lines = base.unionByName(dups).select(col("url"), col("line_no"))
    lines.groupBy(col("url")).agg(min(col("line_no")).as("first_line"))
  }

  /** Structured-Streaming parity at the driver gate: drain the corpus pages
    * through the StreamIngest pipeline (file-source micro-batches over the
    * parquet parts, Trigger.AvailableNow, checkpointed sink) and return the
    * extracted table — byte-equal to the batch kernel's ground truth, so
    * the streaming surface carries the same per-row invariant as the batch
    * one.
    */
  def streamExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val label = sfDir.replaceAll("/+$", "").split('/').last
    val out = scratchDir(spark, "stream", label)
    deleteRecursively(new java.io.File(out))
    // the corpus's warc_ts spans 24 h and parquet parts stream in file
    // order (not event-time order) — the dedup watermark must exceed that
    // disorder or the tail of each micro-batch is discarded as late
    graft.streaming.StreamIngest.run(spark, s"$dir/pages.parquet",
      s"$out/docs", s"$out/ck", watermark = "48 hours").awaitTermination()
    spark.read.parquet(s"$out/docs")
      .select(col("url"), col("title"), col("markdown"))
  }

  /** Custom-state streaming at the driver gate
    * (StreamIngest.hostStateStats — flatMapGroupsWithState): drain the
    * corpus through the stateful per-host aggregator, then reduce the
    * emitted update log to each host's FINAL snapshot (max count), which is
    * batch-deterministic — the oracle recomputes it as a plain GROUP BY.
    */
  def streamHostState(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val label = sfDir.replaceAll("/+$", "").split('/').last
    val out = scratchDir(spark, "hoststate", label)
    deleteRecursively(new java.io.File(out))
    graft.streaming.StreamIngest.runHostState(spark, s"$dir/pages.parquet",
      s"$out/log", s"$out/ck").awaitTermination()
    val log = spark.read.parquet(s"$out/log")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("cnt").desc)
    log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("host"), col("cnt").as("n_pages"), col("min_ts"), col("max_ts"))
  }

  /** Streaming KMV distinct-url estimate per host, reduced to each host's
    * FINAL snapshot: the estimate is monotone non-decreasing across
    * micro-batches (smaller hashes only ever displace larger), so max
    * (kmv_est, n_mins) per host is the full-data sketch regardless of how
    * the file source batched the feed — and must equal the batch sketch the
    * oracle replays.
    */
  def streamHostDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val label = sfDir.replaceAll("/+$", "").split('/').last
    val out = scratchDir(spark, "hostkmv", label)
    deleteRecursively(new java.io.File(out))
    graft.streaming.StreamIngest.runHostDistinct(spark, s"$dir/pages.parquet",
      s"$out/log", s"$out/ck").awaitTermination()
    val log = spark.read.parquet(s"$out/log")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("kmv_est").desc, col("n_mins").desc)
    log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("host"), col("n_mins"), col("kmv_est"))
  }

  /** Event-time sessionization of the fetch feed (StreamIngest.hostSessions
    * — session_window, the streaming-native gap window, run in batch for
    * the driver oracle; the streaming emission semantics are spec'd in
    * StreamIngestSpec).
    */
  def fetchSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val pages = CorpusGen.pages(spark, dir).select(
      graft.pipeline.HostGraph.hostOf(col("url")).as("host"), col("warc_ts"))
    // 3-minute gap: the corpus fetch times are ~1/min per big host over a
    // 24 h span, so this yields a real session structure (hundreds of
    // sessions, gap boundary exercised) rather than one session per host
    graft.streaming.StreamIngest.hostSessions(pages, gap = "3 minutes")
  }

  /** F1 url normalization over constructed denormalized variants. */
  def urlNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val urls = spark.read.parquet(s"$dir/meta.parquet").select(col("url")).as[String]
    val normUdf = udf((s: String) => UrlNorm.normalize(s).getOrElse(""))
    urls.flatMap { u =>
      Seq(
        u + "#section",            // fragment stripped
        u.stripPrefix("http://"),  // schemeless → http://
        u + "/",                   // trailing slash stripped (root: "//" → "/")
        u + "?q=a&b=c#x")          // query kept verbatim, fragment stripped
    }.toDF("input")
      .withColumn("normalized", normUdf(col("input")))
  }

  /** S6 jsonl sink over the articles crawl: one Go-escaping-parity compact
    * JSON line per page in save order (byte-exactness itself is pinned by
    * SinksSpec goldens; this exposes the sink at the query surface).
    */
  def sinkJsonl(spark: SparkSession, sfDir: String): DataFrame = {
    val line = udf((t: String, u: String, m: String) =>
      graft.sinks.Sinks.jsonlLine(t, u, m))
    articlesCrawl(spark, sfDir).saved
      .orderBy(col("depth"), col("seq"))
      .select(col("url"), line(col("title"), col("url"), col("markdown")).as("jsonl"))
  }

  /** S4 xml-like sink rows (template parity, no escaping) in save order. */
  def sinkXml(spark: SparkSession, sfDir: String): DataFrame = {
    val block = udf((t: String, u: String, m: String) =>
      graft.sinks.Sinks.pageAsXmlLike(t, u, m))
    articlesCrawl(spark, sfDir).saved
      .orderBy(col("depth"), col("seq"))
      .select(col("url"), block(col("title"), col("url"), col("markdown")).as("xml"))
  }

  /** S5 json sink: the complete MarshalIndent-parity payload (one row), over
    * a LIST-MODE crawl of the articles urls so the array order (= save order
    * = url-file line order, reference crawler.go:283-295) is reproducible by
    * the SQL oracle. BFS save order is pinned by crawl_bfs_seen + the FIFO
    * oracle suite; this pins the payload bytes.
    */
  def sinkJson(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val out = cached(spark, sfDir, "listarticles") { dir =>
      WaveCrawler.crawl(spark, CorpusGen.pages(spark, dir),
        CrawlConfig(urlListDf = Some(urlLines(spark, dir, section = "articles")),
          isUrlListMode = true))
    }
    // items are formatted per-row on executors; the driver streams them
    // partition-at-a-time (Main.streamOut shape) — never a collected array
    val item = udf((t: String, u: String, m: String) =>
      graft.sinks.Sinks.jsonItem(t, u, m))
    val items = out.saved
      .orderBy(col("seq"))
      .select(item(col("title"), col("url"), col("markdown")).as("item"))
      .as[String]
    import scala.jdk.CollectionConverters.IteratorHasAsScala
    val payload = graft.sinks.Sinks.jsonFromItems(items.toLocalIterator().asScala)
    Seq(payload).toDF("json_payload")
  }

  /** F5 glob matching over every corpus path × a fixed pattern set. */
  def globMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val patterns = Seq("/articles/**", "**/page-1", "/docs/*", "/")
    val compiled = patterns.map(p => p -> Glob.compileOrThrow(p)).toMap
    val bc = spark.sparkContext.broadcast(compiled)
    val paths = spark.read.parquet(s"$dir/meta.parquet")
      .select(udf((u: String) => UrlNorm.pathOf(u)).apply(col("url")).as("path"))
      .distinct()
    val pats = patterns.toDF("pattern")
    paths.crossJoin(broadcast(pats))
      .withColumn("matched",
        udf((path: String, pat: String) => if (bc.value(pat).matches(path)) 1L else 0L)
          .apply(col("path"), col("pattern")))
  }
}
