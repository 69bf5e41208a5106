package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** Deterministic seeded Common-Crawl-style corpus generator (FIXTURES.md §1).
  *
  * Emits the `pages(url, warc_ts, html, text, lang)` table from
  * BASELINE.json's input_hint plus ground-truth side tables used ONLY by the
  * DuckDB oracle (never by the engine):
  *
  *   - links(src_url, dst_url, pos): exactly the edges the reference's link
  *     extractor keeps (same-host, http(s), first-wins dedup, doc order)
  *   - meta(url, host, host_idx, page_idx, section, title, n_links, exists)
  *   - robots(host, disallow_prefix): synthetic robots.txt rules
  *
  * Every row derives purely from (seed, host_idx, page_idx) via splittable
  * hashing, so generation is order- and partitioning-independent — the same
  * spec yields byte-identical tables at any parallelism.
  *
  * Site shape: per-host BFS tree (i → 2i+1, 2i+2) + hashed cross edges +
  * home links, Zipf-skewed host sizes (mega-host at index 0 exercises
  * skew/salting), plus noise anchors (external host, mailto, ftp) the
  * extractor must drop, and dangling links (fetch-error path,
  * /root/reference/crawler.go:389-390).
  */
final case class CorpusSpec(nHosts: Int, totalPages: Int, seed: Long,
    paragraphs: Int = 3, emitMarkdownTruth: Boolean = true) {
  /** Zipf-ish host sizes (weight 1/(h+1)^0.8), each at least 4 pages. */
  lazy val hostSizes: Array[Int] = {
    val weights = Array.tabulate(nHosts)(h => 1.0 / math.pow(h + 1, 0.8))
    val wsum = weights.sum
    val sizes = weights.map(w => math.max(4, (totalPages * w / wsum).toInt))
    sizes
  }
  lazy val hostOffsets: Array[Long] = hostSizes.scanLeft(0L)(_ + _).init
  lazy val actualTotal: Long = hostSizes.map(_.toLong).sum
}

final case class PageRow(url: String, warc_ts: Timestamp, html: Array[Byte],
    text: String, lang: String)
final case class LinkRow(src_url: String, dst_url: String, pos: Int,
  anchor_text: String)
final case class MetaRow(url: String, host: String, host_idx: Int, page_idx: Int,
    section: String, title: String, n_links: Int, markdown: String,
    article_html: String, empty_html: Int,
    /** Expected markdown of the SELECTOR-MISS branch (readability over the
      * raw, un-pre-filtered HTML): image-bearing variants (deco 8/9) keep
      * their images there, so this differs from `markdown` exactly on those
      * pages.
      */
    sel_markdown: String,
    /** `<meta name="robots">` ground truth ([[CorpusGen.metaRobotsOf]]):
      * page asks not to be indexed / not to have its links followed.
      */
    noindex: Int = 0,
    nofollow: Int = 0,
    /** Meta-refresh redirect target ([[CorpusGen.redirectTargetOf]]):
      * normalized absolute url, "" when the page is not a redirect.
      */
    redirect_to: String = "",
    /** `<link rel="canonical">` target ([[CorpusGen.canonicalTargetOf]]):
      * normalized absolute url (possibly the page itself), "" when none.
      */
    canonical_to: String = "")
final case class RobotsRow(host: String, disallow_prefix: String)

/** A host's served `/robots.txt` page: the raw BODY a production crawler
  * fetches and parses (graft.crawl.RobotsParser) into its per-host rule
  * set — kept OUT of `pages` so the page-count ground truth of every
  * crawl oracle is untouched (a real crawler's robots fetch is a separate
  * pre-pass over per-host robots URLs, not a frontier pop).
  */
final case class RobotsTxtRow(host: String, url: String, body: String)

/** A host's served sitemap XML document (sitemaps.org protocol — public):
  * the seed-acquisition input a production crawler fetches after reading
  * the robots.txt `Sitemap:` line. host0 serves a two-level
  * `<sitemapindex>` (its url entries split across two child sitemaps);
  * every other host serves a single `<urlset>`.
  */
final case class SitemapRow(host: String, url: String, body: String)

/** Opaque multimodal payload — the ONLY columns the engine sees. */
final case class BlobRow(blob_id: Long, payload: Array[Byte])

/** Ground-truth decoded features, oracle-side only: the generator computes
  * them while ENCODING the payload, the engine must re-derive them by
  * DECODING the bytes. Non-applicable fields are 0.
  */
final case class BlobMetaRow(blob_id: Long, kind: String, width: Long, height: Long,
    sum_r: Long, sum_g: Long, sum_b: Long, sample_rate: Long, n_samples: Long,
    amp_sum: Long, n_bytes: Long,
    /** Resize / frame-sample ground truth (Decoders.ResizeStride /
      * FrameStride), computed while encoding like the rest: rs_* = the
      * half-size nearest-neighbor image's dims + channel sums; fs_* = the
      * every-4th-sample clip's count + amplitude sum. Zero when n/a.
      */
    rs_width: Long = 0, rs_height: Long = 0,
    rs_sum_r: Long = 0, rs_sum_g: Long = 0, rs_sum_b: Long = 0,
    fs_n_samples: Long = 0, fs_amp_sum: Long = 0)

object CorpusGen {

  val Sections: Vector[String] = Vector("articles", "products", "docs", "misc")
  private val Langs = Vector("en", "en", "en", "de", "ja")

  // splittable hash (xorshift-mixed), stable across JVMs
  def mix(seed: Long, a: Long, b: Long, c: Long): Long = {
    var x = seed ^ (a * 0x9e3779b97f4a7c15L) ^ (b * 0xc2b2ae3d27d4eb4fL) ^ (c * 0x165667b19e3779f9L)
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    x ^= x >>> 31
    x & Long.MaxValue
  }

  def hostName(h: Int): String = s"host$h.test"

  def pageUrl(h: Int, i: Int): String =
    if (i == 0) s"http://${hostName(h)}/"
    else s"http://${hostName(h)}/${Sections(i % Sections.length)}/page-$i"

  def pagePath(h: Int, i: Int): String =
    if (i == 0) "/" else s"/${Sections(i % Sections.length)}/page-$i"

  def pageTitle(h: Int, i: Int): String = s"Host $h Page $i of Synthetic Corpus"

  /** ~3 percent of non-root pages serve whitespace-only HTML — the reference's
    * empty-content fetch-error path (P8, /root/reference/fetcher.go:93-95):
    * such a page is popped and counted as a fetch error, never saved, never
    * expanded. Roots and the first tree levels stay non-empty so every host
    * remains crawlable.
    */
  def isEmptyPage(spec: CorpusSpec, h: Int, i: Int): Boolean =
    i > 2 && mix(spec.seed, h, i, 6) % 29 == 0

  /** A host's robots rule: every third host disallows /misc. */
  def robotsRules(spec: CorpusSpec): Seq[RobotsRow] =
    (0 until spec.nHosts).collect {
      case h if h % 3 == 0 => RobotsRow(hostName(h), "/misc")
    }

  /** The `/robots.txt` BODY served by host h — deterministic ground truth
    * for the RFC 9309 body parser. Three host classes pin the group-
    * selection semantics for the engine UA `graftbot`:
    *   - h%3==0 (incl. host0): no graftbot-specific group → the `*` group
    *     applies; its rules are exactly the grammar-coverage set of
    *     [[graft.crawl.Robots9309.Rules]], so the parsed-rules BFS equals
    *     the legacy constant-rules BFS on host0 by construction.
    *   - h%3==1: a `GraftBot` group (case-varied key and token, inline
    *     comment, unknown directive, empty disallow) → the `*` group must
    *     be IGNORED, not merged.
    *   - h%3==2: both a `graft` (prefix, len 5) and a `graftbot 2.0`
    *     (token = `graftbot`, len 8) group → longest token wins.
    * Every host also carries distractor groups (`MegaCrawler`,
    * `GraftBot-Images` — LONGER than the ua, must not match), comments,
    * blank lines, a multi-UA group, and a trailing `Sitemap:` line.
    * Crawl-delay coverage: the specific GraftBot group asks 2 s, the `*`
    * group 4 s, the h%3==2 token groups nothing — so delay resolution sees
    * a specific-group value, a fallback value, and an absent value.
    * Newlines are `\n` and whitespace is spaces only, so the DuckDB SQL
    * replay (default-trim semantics) is exact.
    */
  def robotsTxtBody(spec: CorpusSpec, h: Int): String = {
    val host = hostName(h)
    val sb = new StringBuilder
    sb.append(s"# robots.txt for $host — corpus ground truth (seed ${spec.seed})\n")
    sb.append("# comments, case variation and unknown directives are deliberate\n\n")
    // a groupless directive BEFORE any user-agent line: rule parsing must
    // ignore it, sitemap discovery must still collect it — and the target
    // is a dead link on odd hosts (no such document is served), the
    // discovery fetch-miss case
    if (h % 2 == 1) sb.append(s"SiteMap: http://$host/sitemap-extra.xml\n\n")
    sb.append("User-agent: MegaCrawler\n")
    sb.append("Disallow: /\n")
    sb.append("Crawl-delay: 10\n\n")
    sb.append("User-agent: GraftBot-Images\n")
    sb.append("Disallow: /articles\n\n")
    if (h % 3 == 1) {
      sb.append("user-AGENT: GraftBot   # case-insensitive key and token\n")
      sb.append("Allow: /docs/page-1*\n")
      sb.append("disallow: /docs\n")
      sb.append("Unknown-directive: ignored\n")
      sb.append("Crawl-delay: 2\n")
      sb.append("Disallow:\n")
      sb.append("Disallow: /products/page-3$\n\n")
    }
    if (h % 3 == 2) {
      sb.append("User-agent: graft\n")
      sb.append("Disallow: /\n\n")
      sb.append("User-agent: graftbot 2.0\n")
      sb.append("Disallow: /*/page-22*\n")
      sb.append("Allow: /docs/page-22*\n\n")
    }
    sb.append("User-agent: *\n")
    sb.append("User-agent: LegacyBot\n")
    sb.append("Disallow: /misc\n")
    sb.append("Allow: /misc/page-1*\n")
    sb.append("Disallow: /*/page-22*\n")
    sb.append("Allow: /docs/page-22*\n")
    sb.append("Disallow: /products/page-3$\n")
    sb.append("Allow: /products\n")
    sb.append("Disallow: /products/page-31*\n")
    sb.append("Allow: /products/page-31$\n")
    sb.append("Crawl-delay: 4\n\n")
    sb.append(s"Sitemap: http://$host/sitemap.xml\n")
    sb.toString
  }

  def robotsTxtRows(spec: CorpusSpec): Seq[RobotsTxtRow] =
    (0 until spec.nHosts).map { h =>
      RobotsTxtRow(hostName(h), s"http://${hostName(h)}/robots.txt",
        robotsTxtBody(spec, h))
    }

  /** The `<changefreq>` vocabulary (sitemaps.org protocol, all seven
    * tokens).
    */
  val Changefreqs: Vector[String] =
    Vector("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

  /** One `<urlset>` body listing pages `idxs` of host h, one `<url>` block
    * per line. Grammar coverage the parser must handle: whitespace-padded
    * `<loc>` values (every idx%8==0 entry), optional `<lastmod>` (present
    * when idx%4==0), optional `<changefreq>` (idx%6==2 — an EVEN-reachable
    * residue, since sitemaps list even indices only; cycles the full
    * protocol vocabulary, and idx≡8 (mod 12) entries carry changefreq AND
    * lastmod together so interval-due logic engages, including
    * never+lastmod at idx≡32 (mod 84)) and `<priority>` (idx%5==2, values 0.0–1.0 in
    * tenths — absent means the protocol default 0.5), and a GHOST entry
    * per body — a listed url that is not a live page, so sitemap-seeded
    * crawls exercise the fetch-miss skip (host0's ghost appears in BOTH
    * child sitemaps: a list-dedup case).
    */
  def sitemapUrlsetBody(h: Int, idxs: Seq[Int]): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    idxs.foreach { i =>
      val loc0 = pageUrl(h, i)
      val loc = if (i % 8 == 0) s"  $loc0  " else loc0
      // month keyed to i/4 (not i%12) so it stays DECOUPLED from the
      // %12-derived hint residues: changefreq+lastmod entries span the
      // whole year and the interval-due outcomes genuinely vary per token
      val lastmod =
        if (i % 4 == 0) f"<lastmod>2024-${i / 4 % 12 + 1}%02d-${i % 28 + 1}%02d</lastmod>"
        else ""
      val changefreq =
        if (i % 6 == 2) s"<changefreq>${Changefreqs((i * 5) % 7)}</changefreq>"
        else ""
      val priority =
        if (i % 5 == 2) {
          val d = (i * 7) % 11
          s"<priority>${if (d == 10) "1.0" else s"0.$d"}</priority>"
        } else ""
      sb.append(s"  <url><loc>$loc</loc>$lastmod$changefreq$priority</url>\n")
    }
    sb.append(s"  <url><loc>http://${hostName(h)}/ghost-$h</loc></url>\n")
    sb.append("</urlset>\n")
    sb.toString
  }

  /** Every host's served sitemap document(s); even page indices are listed
    * (the odd ones are reachable only by crawling — sitemaps are partial
    * in practice). host0's root document is a `<sitemapindex>` over two
    * children (idx%4==0 and idx%4==2).
    */
  def sitemapRows(spec: CorpusSpec): Seq[SitemapRow] =
    (0 until spec.nHosts).flatMap { h =>
      val host = hostName(h)
      val even = (0 until spec.hostSizes(h)).filter(_ % 2 == 0)
      if (h == 0) {
        val (a, b) = even.partition(_ % 4 == 0)
        val index =
          "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
            s"  <sitemap><loc>http://$host/sitemap-1.xml</loc></sitemap>\n" +
            s"  <sitemap><loc>http://$host/sitemap-2.xml</loc></sitemap>\n" +
            "</sitemapindex>\n"
        Seq(
          SitemapRow(host, s"http://$host/sitemap.xml", index),
          SitemapRow(host, s"http://$host/sitemap-1.xml", sitemapUrlsetBody(h, a)),
          SitemapRow(host, s"http://$host/sitemap-2.xml", sitemapUrlsetBody(h, b)))
      } else {
        Seq(SitemapRow(host, s"http://$host/sitemap.xml", sitemapUrlsetBody(h, even)))
      }
    } ++ (0 until spec.nHosts).map { h =>
      // an ORPHAN document per host: present in the served-sitemaps table
      // but advertised by no robots.txt — a table dump sees it, the
      // robots-seeded discovery chain must not
      SitemapRow(hostName(h), s"http://${hostName(h)}/sitemap-old.xml",
        sitemapUrlsetBody(h, (0 until spec.hostSizes(h)).filter(_ % 16 == 1)))
    }

  /** Ordered, deduped link targets of page (h, i): the ground truth the
    * extractor must reproduce. `None` entries are dangling (no page row).
    */
  def linkTargets(spec: CorpusSpec, h: Int, i: Int): Vector[String] = {
    val n = spec.hostSizes(h)
    val raw = Vector.newBuilder[Int]
    raw += 0 // the template's nav "Home" anchor comes first in doc order
    if (2 * i + 1 < n) raw += 2 * i + 1
    if (2 * i + 2 < n) raw += 2 * i + 2
    // hashed cross edges (may duplicate tree edges → first-wins dedup)
    raw += (mix(spec.seed, h, i, 1) % n).toInt
    raw += (mix(spec.seed, h, i, 2) % n).toInt
    val targets = raw.result()
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    targets.foreach(j => seen += pageUrl(h, j))
    // occasional dangling link (simulates the fetch-error/skip path)
    if (mix(spec.seed, h, i, 3) % 7 == 0)
      seen += s"http://${hostName(h)}/articles/missing-$i"
    seen.toVector
  }

  /** The page's single cross-host anchor target, when it has one (~1/3 of
    * pages): a deterministic page on a DIFFERENT host. Rendered inside the
    * readability-dropped link list, so it changes neither the markdown nor
    * the same-host `links` ground truth — only the multi-host `xlinks`
    * graph (the Common-Crawl-shaped frontier the engine's
    * sameHostOnly=false mode walks).
    */
  def crossTarget(spec: CorpusSpec, h: Int, i: Int): Option[String] =
    if (spec.nHosts > 1 && mix(spec.seed, h, i, 8) % 3 == 0) {
      val h2 = ((h + 1 + (mix(spec.seed, h, i, 11) % (spec.nHosts - 1))) % spec.nHosts).toInt
      val j = (mix(spec.seed, h, i, 12) % spec.hostSizes(h2)).toInt
      Some(pageUrl(h2, j))
    } else None

  /** Ordered, deduped link targets of page (h, i) for the MULTI-HOST
    * extractor (scheme-only predicate): document order is the nav Home
    * anchor, the external-host noise anchor (kept now — it is http, just
    * dangling), the same-host list anchors, then the cross-host anchor;
    * mailto/ftp stay dropped. First-wins dedup like [[linkTargets]].
    */
  def xlinkTargets(spec: CorpusSpec, h: Int, i: Int): Vector[String] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    seen += pageUrl(h, 0) // nav "Home"
    seen += "http://other.example/offsite"
    linkTargets(spec, h, i).foreach(seen += _)
    crossTarget(spec, h, i).foreach(seen += _)
    seen.toVector
  }

  /** Ground-truth multi-host extractor output per page (cf. [[linkRows]]). */
  def xlinkRows(spec: CorpusSpec, h: Int, i: Int): Seq[LinkRow] =
    if (isEmptyPage(spec, h, i)) Nil
    else xlinkTargets(spec, h, i).zipWithIndex.map { case (dst, pos) =>
      LinkRow(pageUrl(h, i), dst, pos, anchorTextOf(spec, h, i, dst))
    }

  /** Deterministic filler text with commas/sentences so readability scores
    * the paragraphs as content.
    */
  def filler(spec: CorpusSpec, h: Int, i: Int, k: Int): String = {
    val words = Vector("signal", "corpus", "frontier", "lattice", "harbor",
      "index", "vector", "shard", "beacon", "crawler", "anchor", "cache")
    val r = mix(spec.seed, h, i, 100 + k)
    val sb = new StringBuilder
    var x = r
    (0 until 5).foreach { s =>
      val len = 6 + (x % 5).toInt
      val parts = (0 until len).map { w =>
        x = mix(x, w, s, k)
        words((x % words.length).toInt)
      }
      sb.append(parts.mkString(" ")).append(if (s % 2 == 0) ", " else ". ")
    }
    sb.append("This synthetic paragraph describes page ").append(i)
      .append(" of host ").append(h).append(", generated for crawl testing.")
    sb.toString
  }

  /** Adversarial-HTML decoration variant for page (h, i) — real-web shapes
    * the reference pipeline (go-readability + html-to-markdown) handles and
    * the engine must too. Each variant has a known, independently-derived
    * markdown effect (see [[expectedMarkdown]]); none adds or reorders
    * anchors, so the `links` ground truth is untouched.
    *
    *   0: clean page (the v3 baseline template)
    *   1: HTML comments in head/body/article + a bogus `<![CDATA[...]]>`
    *      (HTML parses it as a bogus comment) — no markdown effect
    *   2: unlikely-candidate chrome: `class="comment"` and `class="sidebar"`
    *      divs as siblings of the article — stripped by readability
    *   3: article wrapped in two nested layout divs (div soup) — transparent
    *   4: extra paragraph carrying named/numeric character references —
    *      decoded text appears in the markdown
    *   5: mis-nested inline tags `<strong><em>…</strong></em>` — recovered
    *      as nested strong/em (the content both Go's x/net/html and any
    *      HTML5 parser yield), rendering `***…***`
    *   6: unclosed `<em>` at the very end of the last filler paragraph —
    *      the only following content is chrome readability drops, so
    *      recovery differences cannot leak into the markdown
    *   7: blockquote + fenced-code pre block inside the article
    *   8: lazy-load noscript-image pair `<img><noscript><img full></noscript>`
    *      — the pre-filtered (no-selector) path drops both (empty p removed);
    *      the selector-miss path unwraps the noscript image
    *      (Readability.js _unwrapNoscriptImages) and the markdown gains the
    *      FULL image (see sel_markdown)
    *   9: lazy image `class="lazy" data-src=…` — dropped by the pre-filter;
    *      promoted to src by _fixLazyImages on the selector-miss path
    */
  def decoOf(spec: CorpusSpec, h: Int, i: Int): Int =
    (mix(spec.seed, h, i, 7) % 10).toInt

  /** The page HTML. Anchors appear in a known document order with noise the
    * extractor must drop interleaved.
    */
  def pageHtml(spec: CorpusSpec, h: Int, i: Int): String = {
    if (isEmptyPage(spec, h, i)) return "  \n   \n"
    val targets = linkTargets(spec, h, i)
    val anchors = new StringBuilder
    // noise first: external host, mailto (dropped by P2/P3)
    anchors.append("<li><a href=\"http://other.example/offsite\">Elsewhere</a></li>\n")
    targets.zipWithIndex.foreach { case (t, idx) =>
      // alternate href forms: absolute path vs full URL (both resolve to t)
      val href =
        if (mix(spec.seed, h, i, 200 + idx) % 2 == 0) {
          val slash = t.indexOf('/', "http://".length)
          t.substring(slash) // absolute path
        } else t
      anchors.append(s"""<li><a href="$href">Link $idx</a></li>\n""")
      if (idx == 0) // duplicate anchor, first-wins dedup must drop it
        anchors.append(s"""<li><a href="$href">Link $idx again</a></li>\n""")
    }
    crossTarget(spec, h, i).foreach { t =>
      anchors.append(s"""<li><a href="$t">Partner site</a></li>\n""")
    }
    anchors.append("<li><a href=\"mailto:team@host.test\">Mail us</a></li>\n")
    anchors.append("<li><a href=\"ftp://host.test/file\">FTP</a></li>\n")

    val maybeTable =
      if (i % 5 == 1)
        """<table><tr><th>Key</th><th>Value</th></tr><tr><td>depth</td><td>tree</td></tr><tr><td>kind</td><td>synthetic</td></tr></table>"""
      else ""

    val deco = decoOf(spec, h, i)
    val headDeco = if (deco == 1) "\n<!-- build 4721: head metadata comment -->" else ""
    val preArticle = deco match {
      case 1 => "<!-- layout boundary --><![CDATA[tracker:noise-4721]]>\n"
      case 2 => "<div class=\"comment\">User comment chrome dropped by readability.</div>\n"
      case _ => ""
    }
    val postArticle = deco match {
      case 2 => s"""<div class="sidebar">Related sidebar chrome for host $h.</div>\n"""
      case _ => ""
    }
    val afterP0 = if (deco == 1) "\n<!-- inline separator comment -->" else ""
    val midExtra = deco match {
      case 4 =>
        "<p>Entity check &#8212; AT&amp;T says &quot;crawl&quot; &hellip; now.</p>\n"
      case 5 =>
        "<p>Closing notes are <strong><em>deeply mis-nested</strong></em> here.</p>\n"
      case 7 =>
        s"<blockquote><p>Quoted wisdom about page $i of host $h.</p></blockquote>\n" +
          s"<pre>val page = $i\nval host = $h</pre>\n"
      case 8 =>
        s"""<p><img src="/static/photo-$i.png" alt="photo"><noscript><img src="/static/photo-$i-full.png" alt="photo"></noscript></p>""" + "\n"
      case 9 =>
        s"""<p><img class="lazy" data-src="/static/lazy-$i.jpg" alt="figure $i"></p>""" + "\n"
      case _ => ""
    }
    val lastFiller =
      if (deco == 6)
        s"<p>${filler(spec, h, i, 2)} Trailing <em>emphasis unclosed.</p>"
      else s"<p>${filler(spec, h, i, 2)}</p>"
    val (wrapOpen, wrapClose) =
      if (deco == 3) ("<div class=\"outer-wrap\"><div class=\"inner-wrap\">\n", "\n</div></div>")
      else ("", "")

    // meta robots head tags (ground truth metaRobotsOf): deliberate case
    // variation on the nofollow-only class; r==5 pages carry DISTRACTOR
    // metas a generic robots parser must ignore (description, and an
    // agent-specific robots tag for some other crawler)
    val metaRobots = (if (i == 0) -1L else mix(spec.seed, h, i, 21) % 11) match {
      case 3 => "\n<meta name=\"robots\" content=\"noindex\">"
      case 7 => "\n<META NAME=\"Robots\" CONTENT=\"NoFollow\">"
      case 9 => "\n<meta name=\"robots\" content=\"noindex, nofollow\">"
      case 1 => "\n<meta name=\"robots\" content=\"none\">"
      case 5 =>
        "\n<meta name=\"description\" content=\"synthetic corpus page\">" +
          "\n<meta name=\"otherbot\" content=\"noindex\">"
      case _ => ""
    }
    // meta-refresh redirect head tag (ground truth redirectTargetOf): three
    // raw spellings — quoted relative, uppercase-URL absolute with a delay,
    // space-padded relative — all resolving to the same normalized target
    val metaRefresh = {
      val tgt = redirectTargetOf(spec, h, i)
      if (tgt.isEmpty) ""
      else {
        val path = tgt.substring(tgt.indexOf('/', "http://".length))
        mix(spec.seed, h, i, 25) % 3 match {
          case 0 => s"""\n<meta http-equiv="refresh" content="0; url='$path'">"""
          case 1 => s"""\n<META HTTP-EQUIV="Refresh" CONTENT="2; URL=$tgt">"""
          case _ => s"""\n<meta http-equiv="refresh" content="0 ; url = $path">"""
        }
      }
    }
    // rel=canonical head link (ground truth canonicalTargetOf): raw
    // spelling alternates absolute url / relative path; the REL value
    // carries case variation on the self-canonical class
    val canonicalLink = {
      val tgt = canonicalTargetOf(spec, h, i)
      if (tgt.isEmpty) ""
      else if (mix(spec.seed, h, i, 29) % 2 == 0)
        s"""\n<link rel="canonical" href="$tgt">"""
      else {
        val path = tgt.substring(tgt.indexOf('/', "http://".length))
        s"""\n<link REL="Canonical" HREF="$path">"""
      }
    }
    s"""<html><head><title>${pageTitle(h, i)}</title>$headDeco$metaRobots$metaRefresh$canonicalLink
       |<style>body { margin: 0; }</style>
       |<link rel="stylesheet" href="/static/site.css">
       |</head><body>
       |<script>window.__noise = ${i};</script>
       |<nav class="menu"><a href="/">Home</a></nav>
       |$preArticle$wrapOpen<article>
       |<h1>Heading for page $i of host $h</h1>
       |<p>${filler(spec, h, i, 0)}</p>$afterP0
       |<p>${filler(spec, h, i, 1)} It also links related pages, <strong>important</strong> ones, with <em>notes</em>.</p>
       |$maybeTable
       |$midExtra<ul class="links">
       |${anchors.toString}</ul>
       |$lastFiller
       |${(3 until spec.paragraphs).map(k => s"<p>${filler(spec, h, i, k)}</p>").mkString("\n")}
       |</article>$wrapClose
       |$postArticle<img src="/static/banner-$i.png" alt="banner">
       |<footer><p>Generated corpus page. Host $h.</p></footer>
       |</body></html>""".stripMargin
  }

  /** GFM rendering of the template's constant table (i % 5 == 1 pages). */
  val TableMd: String =
    "| Key | Value |\n| --- | --- |\n| depth | tree |\n| kind | synthetic |"

  /** Ground-truth markdown the readability→GFM pipeline must produce for
    * page (h, i) — derived from the HTML template structure (the generator
    * wrote the HTML, so it knows the content): the article heading, the
    * filler paragraphs, and the table block; nav/footer/link-list are
    * boilerplate readability drops. This is the oracle for the north rule's
    * per-row invariant (byte-identical extracted text per url).
    */
  def expectedMarkdown(spec: CorpusSpec, h: Int, i: Int): String =
    expectedMarkdownImpl(spec, h, i, selectorBranch = false)

  /** Ground-truth markdown for the SELECTOR-MISS branch (processHTML with a
    * selector that matches nothing → readability over the RAW page, no
    * pre-filter, reference processor.go:44-47): identical to
    * [[expectedMarkdown]] except the image variants keep their image —
    * deco 8's noscript unwrap yields the full-quality image, deco 9's lazy
    * promotion turns data-src into src; both are then URL-absolutized.
    */
  def expectedSelectorMarkdown(spec: CorpusSpec, h: Int, i: Int): String =
    expectedMarkdownImpl(spec, h, i, selectorBranch = true)

  private def expectedMarkdownImpl(spec: CorpusSpec, h: Int, i: Int,
      selectorBranch: Boolean): String = {
    if (isEmptyPage(spec, h, i)) return ""
    val deco = decoOf(spec, h, i)
    val sb = new StringBuilder
    sb.append("## Heading for page ").append(i).append(" of host ").append(h)
    sb.append("\n\n").append(filler(spec, h, i, 0))
    sb.append("\n\n").append(filler(spec, h, i, 1))
      .append(" It also links related pages, **important** ones, with *notes*.")
    if (i % 5 == 1) sb.append("\n\n").append(TableMd)
    // decoration effects, derived from the HTML-template semantics (comments
    // and chrome vanish; entities decode; mis-nesting recovers; blockquote
    // and pre render as GFM; images survive only the un-pre-filtered
    // selector branch) — see decoOf for the variant catalog
    deco match {
      case 4 => sb.append("\n\nEntity check — AT&T says \"crawl\" … now.")
      case 5 => sb.append("\n\nClosing notes are ***deeply mis-nested*** here.")
      case 7 =>
        sb.append("\n\n> Quoted wisdom about page ").append(i)
          .append(" of host ").append(h).append('.')
        sb.append("\n\n```\nval page = ").append(i)
          .append("\nval host = ").append(h).append("\n```")
      case 8 if selectorBranch =>
        sb.append("\n\n![photo](http://").append(hostName(h))
          .append("/static/photo-").append(i).append("-full.png)")
      case 9 if selectorBranch =>
        sb.append("\n\n![figure ").append(i).append("](http://").append(hostName(h))
          .append("/static/lazy-").append(i).append(".jpg)")
      case _ =>
    }
    sb.append("\n\n").append(filler(spec, h, i, 2))
    if (deco == 6) sb.append(" Trailing *emphasis unclosed.*")
    (3 until spec.paragraphs).foreach(k => sb.append("\n\n").append(filler(spec, h, i, k)))
    sb.toString
  }

  /** Ground-truth readability article HTML (reference PageData.articleHtml
    * parity) for page (h, i), derived from the template by the readability +
    * serializer rules the reference applies (go-readability then
    * outerHTML): the `<article>` subtree is the top candidate, wrapped in
    * the readability page div; boilerplate (nav, link list, footer, chrome)
    * is removed leaving the template's newline text nodes in place; `<h1>`
    * demotes to `<h2>`; classes are stripped; text serialization escapes
    * `&` and `"`. Decoration effects mirror [[expectedMarkdown]]; for the
    * div-soup variant the single-child wrapper joins the candidate
    * (Readability.js parent-climb), serialized class-less.
    */
  def expectedArticleHtml(spec: CorpusSpec, h: Int, i: Int): String = {
    if (isEmptyPage(spec, h, i)) return ""
    val deco = decoOf(spec, h, i)
    val sb = new StringBuilder
    sb.append("<div id=\"readability-page-1\" class=\"page\">")
    if (deco == 3) sb.append("<div>\n")
    sb.append("<article>\n")
    sb.append("<h2>Heading for page ").append(i).append(" of host ").append(h)
      .append("</h2>\n")
    sb.append("<p>").append(filler(spec, h, i, 0)).append("</p>")
    if (deco == 1) sb.append("\n<!-- inline separator comment -->")
    sb.append('\n')
    sb.append("<p>").append(filler(spec, h, i, 1))
      .append(" It also links related pages, <strong>important</strong> ones, with <em>notes</em>.</p>\n")
    if (i % 5 == 1)
      sb.append("<table><tr><th>Key</th><th>Value</th></tr><tr><td>depth</td><td>tree</td></tr><tr><td>kind</td><td>synthetic</td></tr></table>")
    sb.append('\n')
    deco match {
      case 4 => sb.append("<p>Entity check — AT&amp;T says &#34;crawl&#34; … now.</p>\n")
      case 5 => sb.append("<p>Closing notes are <strong><em>deeply mis-nested</em></strong> here.</p>\n")
      case 7 =>
        sb.append("<blockquote><p>Quoted wisdom about page ").append(i)
          .append(" of host ").append(h).append(".</p></blockquote>\n")
        sb.append("<pre>val page = ").append(i).append("\nval host = ").append(h)
          .append("</pre>\n")
      case 8 | 9 =>
        // the image p is emptied by the pre-filter and removed; only its
        // template trailing newline survives
        sb.append('\n')
      case _ =>
    }
    sb.append('\n') // the removed link list leaves its trailing newline
    sb.append("<p>").append(filler(spec, h, i, 2))
    if (deco == 6) sb.append(" Trailing <em>emphasis unclosed.</em>")
    sb.append("</p>\n")
    sb.append((3 until spec.paragraphs)
      .map(k => s"<p>${filler(spec, h, i, k)}</p>").mkString("\n"))
    sb.append("\n</article>")
    if (deco == 3) sb.append("\n</div>")
    sb.append("</div>")
    sb.toString
  }

  def pageRow(spec: CorpusSpec, h: Int, i: Int): PageRow = {
    val ts = new Timestamp(1700000000000L + (mix(spec.seed, h, i, 9) % 86400000L))
    PageRow(
      url = pageUrl(h, i),
      warc_ts = ts,
      html = pageHtml(spec, h, i).getBytes(StandardCharsets.UTF_8),
      text = filler(spec, h, i, 0),
      lang = Langs((mix(spec.seed, h, i, 4) % Langs.length).toInt))
  }

  /** Page-level robots meta directives, encode-side ground truth: what a
    * `<meta name="robots">` tag in the page's head asks of an indexing
    * crawler (publicly documented REP meta extension). Roots and empty
    * pages never carry one (roots keep every host crawlable; empty pages
    * have no head). Returns (noindex, nofollow) as 0/1 ints.
    */
  def metaRobotsOf(spec: CorpusSpec, h: Int, i: Int): (Int, Int) =
    if (i == 0 || isEmptyPage(spec, h, i)) (0, 0)
    else mix(spec.seed, h, i, 21) % 11 match {
      case 3 => (1, 0)
      case 7 => (0, 1)
      case 9 => (1, 1) // spelled out
      case 1 => (1, 1) // spelled as the documented shorthand "none"
      case _ => (0, 0)
    }

  /** Meta-refresh redirect ground truth: the NORMALIZED absolute target a
    * redirect-following crawler must enqueue instead of saving the page,
    * or "" when the page is not a redirect. ~1/13 of non-root, non-empty
    * pages redirect to a deterministic same-host page; the html spells the
    * target in one of three raw forms (quoted relative, uppercase-URL
    * absolute, space-padded relative) that all resolve to this value.
    */
  def redirectTargetOf(spec: CorpusSpec, h: Int, i: Int): String =
    if (i == 0 || isEmptyPage(spec, h, i) ||
      mix(spec.seed, h, i, 23) % 13 != 4) ""
    else pageUrl(h, (mix(spec.seed, h, i, 24) % spec.hostSizes(h)).toInt)

  /** `<link rel="canonical">` ground truth: the NORMALIZED canonical url a
    * dedup/index fold must group this page under, or "" when the page
    * declares none. ~1/17 of non-root, non-empty, non-redirect pages point
    * at a deterministic same-host page (cross-canonical: mirror/variant
    * pages folding into a representative), and another slice declare
    * THEMSELVES canonical (the production-common self-canonical, which the
    * fold must treat as standalone). Raw spellings alternate absolute /
    * relative.
    */
  def canonicalTargetOf(spec: CorpusSpec, h: Int, i: Int): String =
    if (i == 0 || isEmptyPage(spec, h, i) ||
      redirectTargetOf(spec, h, i).nonEmpty) ""
    else mix(spec.seed, h, i, 27) % 17 match {
      case 6 => pageUrl(h, (mix(spec.seed, h, i, 28) % spec.hostSizes(h)).toInt)
      case 2 => pageUrl(h, i) // self-canonical
      case _ => ""
    }

  def metaRow(spec: CorpusSpec, h: Int, i: Int): MetaRow = {
    val empty = isEmptyPage(spec, h, i)
    val (ni, nf) = metaRobotsOf(spec, h, i)
    MetaRow(
      url = pageUrl(h, i),
      host = hostName(h),
      host_idx = h,
      page_idx = i,
      section = if (i == 0) "" else Sections(i % Sections.length),
      title = if (empty) "" else pageTitle(h, i),
      n_links = if (empty) 0 else linkTargets(spec, h, i).size,
      markdown = if (spec.emitMarkdownTruth) expectedMarkdown(spec, h, i) else "",
      article_html = if (spec.emitMarkdownTruth) expectedArticleHtml(spec, h, i) else "",
      empty_html = if (empty) 1 else 0,
      sel_markdown = if (spec.emitMarkdownTruth) expectedSelectorMarkdown(spec, h, i) else "",
      noindex = ni,
      nofollow = nf,
      redirect_to = redirectTargetOf(spec, h, i),
      canonical_to = canonicalTargetOf(spec, h, i))
  }

  /** Ground-truth extractor output per page — empty for empty-HTML pages
    * (the extractor never runs on a failed fetch, and running it on
    * whitespace yields nothing).
    */
  def linkRows(spec: CorpusSpec, h: Int, i: Int): Seq[LinkRow] =
    if (isEmptyPage(spec, h, i)) Nil
    else linkTargets(spec, h, i).zipWithIndex.map { case (dst, pos) =>
      LinkRow(pageUrl(h, i), dst, pos, anchorTextOf(spec, h, i, dst))
    }

  /** Ground-truth FIRST-anchor text for a dst of page (h, i) — mirrors the
    * template's document order: the nav "Home" anchor always precedes the
    * link list, so the host root's winning text is "Home" (the list's
    * "Link 0" is the first-wins-dropped duplicate); list anchors carry
    * "Link &lt;idx in the deduped target vector&gt;"; the offsite noise
    * anchor reads "Elsewhere"; the cross-host anchor "Partner site".
    */
  def anchorTextOf(spec: CorpusSpec, h: Int, i: Int, dst: String): String =
    if (dst == pageUrl(h, 0)) "Home"
    else if (dst == "http://other.example/offsite") "Elsewhere"
    else {
      val idx = linkTargets(spec, h, i).indexOf(dst)
      if (idx >= 0) s"Link $idx" else "Partner site"
    }

  // ---- multimodal blobs (real binary formats, built + decoded from
  // scratch: 24-bit BMP images and 16-bit PCM WAV audio, plus corrupt
  // payloads exercising the graceful-failure path) ----

  def blobCount(spec: CorpusSpec): Long = math.max(64L, spec.actualTotal / 10)

  private def putU16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
  }

  private def buildBmp(spec: CorpusSpec, id: Long): (Array[Byte], BlobMetaRow) = {
    val w = 2 + (mix(spec.seed, id, 0, 30) % 6).toInt // 2..7
    val h = 2 + (mix(spec.seed, id, 1, 30) % 4).toInt // 2..5
    val rowSize = (3 * w + 3) / 4 * 4
    val dataSize = rowSize * h
    val bytes = new Array[Byte](54 + dataSize)
    bytes(0) = 'B'; bytes(1) = 'M'
    putU32(bytes, 2, 54L + dataSize); putU32(bytes, 10, 54)
    putU32(bytes, 14, 40); putU32(bytes, 18, w); putU32(bytes, 22, h)
    putU16(bytes, 26, 1); putU16(bytes, 28, 24); putU32(bytes, 30, 0)
    putU32(bytes, 34, dataSize); putU32(bytes, 38, 2835); putU32(bytes, 42, 2835)
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var rsR = 0L; var rsG = 0L; var rsB = 0L
    val rs = graft.pipeline.Decoders.ResizeStride
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = mix(spec.seed, id, (y.toLong << 16) | x.toLong, 31)
        val bb = (px & 0xff).toInt; val gg = ((px >> 8) & 0xff).toInt
        val rr = ((px >> 16) & 0xff).toInt
        val o = 54 + y * rowSize + 3 * x
        bytes(o) = bb.toByte; bytes(o + 1) = gg.toByte; bytes(o + 2) = rr.toByte
        sumB += bb; sumG += gg; sumR += rr
        if (y % rs == 0 && x % rs == 0) { rsB += bb; rsG += gg; rsR += rr }
        x += 1
      }
      y += 1
    }
    (bytes, BlobMetaRow(id, "bmp", w, h, sumR, sumG, sumB, 0, 0, 0, bytes.length,
      rs_width = (w + rs - 1) / rs, rs_height = (h + rs - 1) / rs,
      rs_sum_r = rsR, rs_sum_g = rsG, rs_sum_b = rsB))
  }

  private def buildWav(spec: CorpusSpec, id: Long): (Array[Byte], BlobMetaRow) = {
    val rate = 8000 + (mix(spec.seed, id, 0, 32) % 4).toInt * 4000
    val n = 16 + (mix(spec.seed, id, 1, 32) % 50).toInt
    val bytes = new Array[Byte](44 + 2 * n)
    "RIFF".getBytes.copyToArray(bytes, 0)
    putU32(bytes, 4, 36L + 2 * n)
    "WAVE".getBytes.copyToArray(bytes, 8)
    "fmt ".getBytes.copyToArray(bytes, 12)
    putU32(bytes, 16, 16); putU16(bytes, 20, 1); putU16(bytes, 22, 1)
    putU32(bytes, 24, rate); putU32(bytes, 28, rate.toLong * 2)
    putU16(bytes, 32, 2); putU16(bytes, 34, 16)
    "data".getBytes.copyToArray(bytes, 36)
    putU32(bytes, 40, 2L * n)
    var ampSum = 0L
    var fsAmp = 0L
    var fsN = 0L
    val fs = graft.pipeline.Decoders.FrameStride
    var k = 0
    while (k < n) {
      val s = (mix(spec.seed, id, k, 33) % 65536).toInt - 32768
      putU16(bytes, 44 + 2 * k, s & 0xffff)
      ampSum += math.abs(s)
      if (k % fs == 0) { fsAmp += math.abs(s); fsN += 1 }
      k += 1
    }
    (bytes, BlobMetaRow(id, "wav", 0, 0, 0, 0, 0, rate, n, ampSum, bytes.length,
      fs_n_samples = fsN, fs_amp_sum = fsAmp))
  }

  private def buildCorrupt(spec: CorpusSpec, id: Long): (Array[Byte], BlobMetaRow) = {
    val n = 8 + (mix(spec.seed, id, 0, 34) % 24).toInt
    val bytes = Array.tabulate(n)(k => (mix(spec.seed, id, k, 35) & 0xff).toByte)
    bytes(0) = 0x7f.toByte // guaranteed neither "BM" nor "RIFF"
    (bytes, BlobMetaRow(id, "unknown", 0, 0, 0, 0, 0, 0, 0, 0, n))
  }

  /** The blob with global id — every 13th is corrupt, the rest alternate
    * BMP / WAV.
    */
  def blobRow(spec: CorpusSpec, id: Long): (BlobRow, BlobMetaRow) = {
    val (payload, meta) =
      if (id % 13 == 12) buildCorrupt(spec, id)
      else if (id % 2 == 0) buildBmp(spec, id)
      else buildWav(spec, id)
    (BlobRow(id, payload), meta)
  }

  /** Map a global row id to (host_idx, page_idx). */
  def locate(spec: CorpusSpec, globalIdx: Long): (Int, Int) = {
    var lo = 0
    var hi = spec.nHosts - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (spec.hostOffsets(mid) <= globalIdx) lo = mid else hi = mid - 1
    }
    (lo, (globalIdx - spec.hostOffsets(lo)).toInt)
  }

  /** Generate + write all corpus tables under `dir` (idempotent: skipped when
    * the marker file exists). Distributed, partition-independent.
    */
  /** Bumped whenever the emitted schema/content changes so stale on-disk
    * corpora regenerate instead of silently serving the old shape.
    */
  val FormatVersion = 19

  def ensure(spark: SparkSession, dir: String, spec: CorpusSpec): Unit = {
    val marker = new java.io.File(s"$dir/_CORPUS_READY")
    if (marker.exists() &&
      java.nio.file.Files.readString(marker.toPath).contains(s""""version":$FormatVersion"""))
      return
    import spark.implicits._

    val bcSpec = spark.sparkContext.broadcast(spec)
    // enough splits that any later reader can parallelize across 32+ cores
    // regardless of parquet split sizing
    val parts = math.max(spark.sparkContext.defaultParallelism * 4, 64)

    val ids = spark.range(0, spec.actualTotal, 1, parts)
    ids.mapPartitions { it =>
      val s = bcSpec.value
      it.map { id => val (h, i) = CorpusGen.locate(s, id); CorpusGen.pageRow(s, h, i) }
    }.write.mode("overwrite").parquet(s"$dir/pages.parquet")

    ids.mapPartitions { it =>
      val s = bcSpec.value
      it.flatMap { id => val (h, i) = CorpusGen.locate(s, id); CorpusGen.linkRows(s, h, i) }
    }.write.mode("overwrite").parquet(s"$dir/links.parquet")

    ids.mapPartitions { it =>
      val s = bcSpec.value
      it.flatMap { id => val (h, i) = CorpusGen.locate(s, id); CorpusGen.xlinkRows(s, h, i) }
    }.write.mode("overwrite").parquet(s"$dir/xlinks.parquet")

    ids.mapPartitions { it =>
      val s = bcSpec.value
      it.map { id => val (h, i) = CorpusGen.locate(s, id); CorpusGen.metaRow(s, h, i) }
    }.write.mode("overwrite").parquet(s"$dir/meta.parquet")

    robotsRules(spec).toDS().write.mode("overwrite").parquet(s"$dir/robots.parquet")
    robotsTxtRows(spec).toDS().write.mode("overwrite").parquet(s"$dir/robots_txt.parquet")
    sitemapRows(spec).toDS().write.mode("overwrite").parquet(s"$dir/sitemaps.parquet")

    // encode each blob ONCE: cache the (payload, meta) pairs, then project
    // the two tables from the cached set (the second write re-encodes
    // nothing — previously both jobs ran the pixel/sample loops in full)
    val blobIds = spark.range(0, blobCount(spec), 1,
      math.max(4, spark.sparkContext.defaultParallelism))
    val blobPairs = blobIds.mapPartitions { it =>
      val s = bcSpec.value
      it.map(id => CorpusGen.blobRow(s, id))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blobPairs.map(_._1).write.mode("overwrite").parquet(s"$dir/blobs.parquet")
    blobPairs.map(_._2).write.mode("overwrite").parquet(s"$dir/blob_meta.parquet")
    blobPairs.unpersist()

    marker.getParentFile.mkdirs()
    java.nio.file.Files.writeString(marker.toPath,
      s"""{"version":$FormatVersion,"nHosts":${spec.nHosts},"totalPages":${spec.totalPages},"seed":${spec.seed},"actualTotal":${spec.actualTotal}}""")
  }

  /** Spec for a given sf directory label (deterministic scale mapping). */
  def specFor(sfDir: String): CorpusSpec = {
    val label = sfDir.replaceAll("/+$", "").split('/').last
    label match {
      case "sf0.001" => CorpusSpec(nHosts = 4, totalPages = 600, seed = 42L)
      case "sf0.01"  => CorpusSpec(nHosts = 8, totalPages = 6000, seed = 42L)
      case "sf0.1"   => CorpusSpec(nHosts = 16, totalPages = 60000, seed = 42L)
      // scaling-evidence corpus: realistic ~10 KB pages so per-page work
      // (readability over real-web-sized HTML) dominates fixed overhead
      case "sf1"     => CorpusSpec(nHosts = 8, totalPages = 160000, seed = 42L,
                          paragraphs = 24, emitMarkdownTruth = false)
      case _         => CorpusSpec(nHosts = 4, totalPages = 600, seed = 42L)
    }
  }

  /** Canonical on-disk location of the corpus for an sf dir. */
  def corpusDir(sfDir: String): String = {
    val label = sfDir.replaceAll("/+$", "").split('/').last
    s"/root/repo/work/corpus/$label"
  }

  def ensureFor(spark: SparkSession, sfDir: String): String = {
    val dir = corpusDir(sfDir)
    ensure(spark, dir, specFor(sfDir))
    dir
  }

  def pages(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/pages.parquet")
}
