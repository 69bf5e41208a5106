package graft.tools

import graft.extract.Processor

/** The golden-fixture corpus for byte-exact extraction parity (SURVEY.md §5
  * item 2, FIXTURES.md §5). Inputs mirror the reference's own test pages
  * (/root/reference/processor_test.go:32-144, integration_test.go:69-78)
  * plus GFM coverage. Goldens are pinned in
  * src/test/resources/golden/extract_goldens.tsv; regenerate ONLY
  * deliberately via `sbt "runMain graft.tools.GenGoldens"` after validating
  * every reference assertion still holds (ProcessorSpec).
  */
object GoldenFixtures {
  private val commonStyle = "<style>body { font-family: sans-serif; }</style>"
  private val commonScript = "<script>console.log('test');</script>"
  private val commonNav = "<nav><a href='/home'>Home</a></nav>"
  private val commonFooter = "<footer><p>&copy; 2025 Test Inc.</p></footer>"
  private val commonImg = "<img src='test.jpg' alt='Test Image'>"
  private val commonVideo = "<video><source src='test.mp4' type='video/mp4'></video>"
  private val commonLink = "<link rel='stylesheet' href='style.css'>"

  /** (name, pageUrl, rawHtml, contentSelector) */
  lazy val cases: Seq[(String, String, String, String)] = Seq(
    ("simple_prefilter", "http://example.com/simple",
      s"<html><head><title>Simple Page</title>$commonStyle$commonScript$commonLink</head><body>" +
        commonNav + commonImg + commonVideo +
        "<h1>Main Title</h1><p>This is simple content.</p>" + commonFooter + "</body></html>", ""),
    ("selector_hit", "http://example.com/selector",
      s"""<html><head><title>Selector Test</title></head><body>
                <div class="ignored">Ignored text. $commonScript</div>
                <article class="main-content">
                    <h2>Article Title</h2>
                    <p>Selected content here. <img src="inline.jpg" alt="Inline"></p>
                </article>
                <div class="ignored-after">More ignored text.</div>
            </body></html>""", ".main-content"),
    ("selector_miss", "http://example.com/selector-miss",
      s"""<html><head><title>Selector Miss</title>$commonScript</head><body>
                <div class="actual-content">
                    <h1>Page Header</h1>
                    <p>Some text. <img src="important.jpg"></p>
                </div>
            </body></html>""", ".non-existent-selector"),
    ("empty_html", "http://example.com/fail", "", ""),
    ("emptyish_nav", "http://example.com/emptyish",
      s"<html><head><title>Emptyish</title></head><body>$commonNav$commonFooter</body></html>", ""),
    ("fixture_page1", "http://host.test/page1",
      "<html><head><title>Page 1</title></head><body><h1>Hello</h1><p>This is page 1.</p><a href=\"/page2\">Page 2</a></body></html>", ""),
    ("fixture_page2", "http://host.test/page2",
      "<html><head><title>Page 2</title></head><body><p>This is page 2.</p></body></html>", ""),
    ("gfm_rich", "http://example.com/gfm",
      """<html><head><title>GFM Rich Article With A Long Title</title></head><body><article>
        |<h1>Feature Survey</h1>
        |<p>This paragraph has <strong>bold text</strong>, <em>italics</em>, <del>strikethrough</del>, and a <a href="/rel/link?x=1">relative link</a>. It is long enough to be scored by readability as real content, with several clauses, commas, and sentences to cross the length threshold comfortably.</p>
        |<h2>Data Table</h2>
        |<table><tr><th>Name</th><th>Count</th></tr><tr><td>alpha</td><td>1</td></tr><tr><td>beta</td><td>2</td></tr></table>
        |<h3>Checklist</h3>
        |<ul><li>first item</li><li>second item</li></ul>
        |<ol><li>step one</li><li>step two</li></ol>
        |<pre>val x = 1
        |println(x)</pre>
        |<blockquote><p>A quoted insight about crawling the web at scale.</p></blockquote>
        |<p>Closing paragraph with an image <img src="figure.png" alt="Figure 1"> inline, plus enough following text that the paragraph still counts as content for the scorer, including more words, more commas, and a second sentence.</p>
        |</article></body></html>""".stripMargin, ""),
    ("unicode_page", "http://example.com/%E6%97%A5%E6%9C%AC%E8%AA%9E/article",
      """<html><head><title>日本語のページ</title></head><body><article>
        |<h1>見出しテキスト</h1>
        |<p>これは日本語の本文です。読みやすさアルゴリズムがこの段落を本物のコンテンツとして採点できるよう、十分に長いテキストを含み、読点、句点、そして複数の文を備えています。</p>
        |<p>二つ目の段落です。<a href="/日本語/次の記事">次の記事</a>へのリンクがあります。こちらも長さのしきい値を超えるよう、追加の説明文をいくつか含んでいます。</p>
        |</article></body></html>""".stripMargin, "")
  ) ++ realWorldCases

  // ---- real-world-HTML fixtures (round-3 breadth: retry-flag paths,
  // byline/share/chrome removal, malformed nesting, entities, GFM corners;
  // reference behavior anchors: Readability.js/go-readability semantics as
  // exercised by /root/reference/processor.go:86-108) ----

  /** Three long, comma-rich paragraphs (~750 chars total) so a block
    * containing them passes readability's 500-char threshold on its own.
    */
  val P1 = "Signal corpus frontier lattice harbor, index vector shard beacon crawler, " +
    "anchor cache meridian passage. This long paragraph exists so the readability " +
    "scorer treats the enclosing block as genuine article content, with clauses, " +
    "commas, and full sentences that comfortably pass the scoring thresholds."
  val P2 = "A second paragraph continues the discussion of wave scheduling, frontier " +
    "state, and politeness budgets, adding commas, more clauses, and further " +
    "sentences so the candidate block accumulates a healthy content score from " +
    "length and punctuation alike, just as a genuine article would."
  val P3 = "The third paragraph closes the argument with measurements, caveats, and a " +
    "summary, once again long enough, and with enough commas, to contribute to the " +
    "readability score of its container and push the total text comfortably past " +
    "the five hundred character threshold used by the retry loop."

  private val longContent = s"<p>$P1</p>\n<p>$P2</p>\n<p>$P3</p>"

  /** (name, pageUrl, rawHtml, contentSelector) */
  val realWorldCases: Seq[(String, String, String, String)] = Seq(
    // -- readability retry-flag paths --
    ("retry_sidebar_content", "http://example.com/retry-sidebar",
      s"""<html><head><title>Sidebar Holds The Content</title></head><body>
         |<nav><a href="/home">Home</a></nav>
         |<div class="sidebar">
         |<h1>Real Heading</h1>
         |$longContent
         |</div>
         |<footer><p>footer chrome</p></footer>
         |</body></html>""".stripMargin, ""),
    ("short_article", "http://example.com/short",
      """<html><head><title>Short Article</title></head><body><article>
        |<p>Only a short line of genuine content lives here, well under threshold.</p>
        |</article></body></html>""".stripMargin, ""),
    // -- byline / share / chrome removal --
    ("byline_class", "http://example.com/byline",
      s"""<html><head><title>Byline Page</title></head><body><article>
         |<p class="byline">By Jane Doe</p>
         |$longContent
         |</article></body></html>""".stripMargin, ""),
    ("byline_rel_author", "http://example.com/byline-rel",
      s"""<html><head><title>Rel Author Page</title></head><body><article>
         |<p><a rel="author" href="/about/jane">Jane Roe</a></p>
         |$longContent
         |</article></body></html>""".stripMargin, ""),
    ("share_widget", "http://example.com/share",
      s"""<html><head><title>Share Widget Page</title></head><body><article>
         |$longContent
         |<div class="share">Share this article on your networks</div>
         |</article></body></html>""".stripMargin, ""),
    ("pagination_chrome", "http://example.com/pagination",
      s"""<html><head><title>Pagination Page</title></head><body>
         |<article>$longContent</article>
         |<div class="pagination"><a href="/p/1">1</a> <a href="/p/2">2</a> <a href="/p/3">3</a></div>
         |</body></html>""".stripMargin, ""),
    ("unlikely_chrome_page", "http://example.com/chrome",
      s"""<html><head><title>Chrome Laden Page</title></head><body>
         |<div class="comment">A user comment that is pure chrome.</div>
         |<article>$longContent</article>
         |<div class="sidebar">Related sidebar chrome text.</div>
         |</body></html>""".stripMargin, ""),
    // -- structure soup --
    ("div_soup_deep", "http://example.com/soup",
      s"""<html><head><title>Deep Soup</title></head><body>
         |<div class="l1"><div class="l2"><div class="l3"><div class="l4"><div class="l5">
         |<h1>Soup Heading</h1>
         |$longContent
         |</div></div></div></div></div>
         |</body></html>""".stripMargin, ""),
    ("two_h1s", "http://example.com/two-h1",
      s"""<html><head><title>Two Headings</title></head><body><article>
         |<h1>First Heading</h1>
         |<p>$P1</p>
         |<h1>Second Heading</h1>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    ("nested_table", "http://example.com/nested-table",
      s"""<html><head><title>Nested Table</title></head><body><article>
         |<p>$P1</p>
         |<table><tr><th>Outer</th><th>Col</th></tr>
         |<tr><td><table><tr><td>inner-a</td><td>inner-b</td></tr></table></td><td>plain</td></tr></table>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    // -- comments / CDATA / malformed nesting --
    ("comments_cdata", "http://example.com/comments",
      s"""<html><head><title>Comment Page</title><!-- head comment --></head><body>
         |<!-- layout boundary --><![CDATA[tracker:noise]]>
         |<article>
         |<p>$P1</p>
         |<!-- interstitial comment -->
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    ("misnested_strong_em", "http://example.com/misnested",
      s"""<html><head><title>Misnested Inline</title></head><body><article>
         |<p>$P1</p>
         |<p>Closing order is <strong><em>inverted right here</strong></em> in this line.</p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    ("unclosed_em_last", "http://example.com/unclosed",
      s"""<html><head><title>Unclosed Inline</title></head><body><article>
         |<p>$P1</p><p>$P2</p>
         |<p>$P3 Trailing <em>emphasis left open.</p>
         |</article></body></html>""".stripMargin, ""),
    // -- entities --
    ("entities_sampler", "http://example.com/entities",
      s"""<html><head><title>Entity Sampler</title></head><body><article>
         |<p>$P1</p>
         |<p>Dash &#8212; heart &#x2764; half &frac12; amp AT&amp;T legacy AT&amp bogus &bogus; quote &quot;q&quot; nbsp&nbsp;end.</p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    // -- GFM corners --
    ("task_list", "http://example.com/tasks",
      s"""<html><head><title>Task List</title></head><body><article>
         |<p>$P1</p>
         |<ul><li><input type="checkbox" checked> done item</li><li><input type="checkbox"> open item</li></ul>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    ("dl_definitions", "http://example.com/dl",
      s"""<html><head><title>Definition List</title></head><body><article>
         |<p>$P1</p>
         |<dl><dt>frontier</dt><dd>the urls not yet fetched</dd><dt>seen</dt><dd>the urls already enqueued</dd></dl>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    ("hr_and_br", "http://example.com/hr-br",
      s"""<html><head><title>Rule And Break</title></head><body><article>
         |<p>$P1</p>
         |<hr>
         |<p>line one<br>line two</p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    ("inline_code_kbd", "http://example.com/code",
      s"""<html><head><title>Inline Code</title></head><body><article>
         |<p>$P1</p>
         |<p>Run <code>sbt -batch test</code> then press <kbd>Ctrl+C</kbd> to stop the run.</p>
         |<pre>val frontier = seen.unionByName(next)
         |frontier.count()</pre>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    ("strike_sub_sup", "http://example.com/strike",
      s"""<html><head><title>Strike Sub Sup</title></head><body><article>
         |<p>$P1</p>
         |<p>Old claim <s>now retracted</s> holds for H<sub>2</sub>O at 10<sup>3</sup> pascals.</p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    ("blockquote_nested", "http://example.com/bq",
      s"""<html><head><title>Nested Quote</title></head><body><article>
         |<p>$P1</p>
         |<blockquote><p>Outer wisdom.</p><blockquote><p>Inner wisdom.</p></blockquote></blockquote>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    ("image_only_paragraph", "http://example.com/img-para",
      s"""<html><head><title>Image Paragraph</title></head><body><article>
         |<p>$P1</p>
         |<p><img src="/charts/throughput.png" alt="throughput chart"></p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    // -- titles --
    ("title_separator", "http://example.com/title-sep",
      s"""<html><head><title>The Very Long Article Name Here | ExampleSite</title></head><body><article>
         |$longContent
         |</article></body></html>""".stripMargin, ""),
    ("title_separator_short", "http://example.com/title-sep-short",
      s"""<html><head><title>Short Name Only | ExampleSite</title></head><body><article>
         |$longContent
         |</article></body></html>""".stripMargin, ""),
    ("title_hierarchy", "http://example.com/title-hier",
      s"""<html><head><title>ExampleSite » Section » Article Piece Here</title></head><body><article>
         |$longContent
         |</article></body></html>""".stripMargin, ""),
    // -- relative URI fixups against a deep page url --
    ("relative_uris", "http://example.com/a/b/page.html",
      s"""<html><head><title>Relative Uris</title></head><body><article>
         |<p>$P1 See <a href="../up">the parent doc</a> and <a href="./sib">a sibling doc</a> and <a href="/root">the root doc</a> for details.</p>
         |<p>$P2 <img src="../../i.png" alt="relative image"></p>
         |<p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    // -- conditional cleaning stays bounded: promo block beside real content --
    ("negative_promo_block", "http://example.com/promo",
      s"""<html><head><title>Promo Beside Content</title></head><body><article>
         |$longContent
         |<div class="promo related">Buy the thing now, limited offer.</div>
         |</article></body></html>""".stripMargin, ""),
    // -- round-4 tranche: noscript image swaps, lazy/srcset promotion,
    // tables-in-tables + span-aware sizing (go-shiori behaviors pinned at
    // /root/reference/processor.go:86-95, go.mod:8). The ".nope" selector
    // misses → the raw-HTML fallback (processor.go:44-47), the only path
    // where images reach readability un-pre-filtered. --
    ("noscript_unwrap", "http://example.com/noscript",
      s"""<html><head><title>Noscript Unwrap Page</title></head><body><article>
         |<p>$P1</p>
         |<p><img src="/static/low.png" alt="hero"><noscript><img src="/static/full.png" alt="hero"></noscript></p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("noscript_no_prev_image", "http://example.com/noscript-noprev",
      s"""<html><head><title>Noscript Without Preceding Image</title></head><body><article>
         |<p>$P1</p>
         |<noscript><img src="/static/orphan.png" alt="orphan"></noscript>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("noscript_prefiltered", "http://example.com/noscript-prefilter",
      s"""<html><head><title>Noscript On The Prefilter Path</title></head><body><article>
         |<p>$P1</p>
         |<p><img src="/static/low.png" alt="hero"><noscript><img src="/static/full.png" alt="hero"></noscript></p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ""),
    ("noscript_fallback_text", "http://example.com/noscript-text",
      s"""<html><head><title>Noscript Fallback Text</title></head><body><article>
         |<p>$P1</p>
         |<noscript><p>Please enable scripting to view charts.</p></noscript>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("lazy_data_src", "http://example.com/lazy-src",
      s"""<html><head><title>Lazy Data Src</title></head><body><article>
         |<p>$P1</p>
         |<p><img class="lazy" data-src="/static/real.jpg" alt="lazy fig"></p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("lazy_srcset_descriptor", "http://example.com/lazy-srcset",
      s"""<html><head><title>Lazy Srcset Descriptor</title></head><body><article>
         |<p>$P1</p>
         |<p><img class="lazyload" data-srcset="/static/a.jpg 2x, /static/b.jpg 1x" alt="responsive"></p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("lazy_class_overrides_src", "http://example.com/lazy-override",
      s"""<html><head><title>Lazy Class Overrides Src</title></head><body><article>
         |<p>$P1</p>
         |<p><img class="lazyloaded" src="/static/placeholder.jpg" data-src="/static/actual.jpg" alt="swap"></p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("figure_lazy_attr", "http://example.com/figure-lazy",
      s"""<html><head><title>Figure Lazy Attribute</title></head><body><article>
         |<p>$P1</p>
         |<figure data-src="/static/fig.jpg"><figcaption>A chart caption.</figcaption></figure>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("b64_placeholder_src", "http://example.com/b64",
      s"""<html><head><title>Base64 Placeholder</title></head><body><article>
         |<p>$P1</p>
         |<p><img src="data:image/png;base64,iVBORw0KGgoAAAANSUhEUg" data-src="/static/real2.jpg" alt="swapped"></p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("img_no_source_removed", "http://example.com/img-nosrc",
      s"""<html><head><title>Sourceless Image Removed</title></head><body><article>
         |<p>$P1 <img alt="tracker pixel"> trailing words.</p>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("colspan_data_table", "http://example.com/colspan",
      s"""<html><head><title>Colspan Sized Table</title></head><body><article>
         |<p>$P1</p>
         |<table><tr><td colspan="5">strip.</td></tr></table>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("rowspan_sized_table", "http://example.com/rowspan",
      s"""<html><head><title>Rowspan Sized Table</title></head><body><article>
         |<p>$P1</p>
         |<table><tr rowspan="12"><td>r.</td></tr></table>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("small_layout_table_removed", "http://example.com/layout-table",
      s"""<html><head><title>Small Layout Table Removed</title></head><body><article>
         |<p>$P1</p>
         |<table><tr><td>tiny.</td></tr></table>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("nested_table_th_inner", "http://example.com/nested-th",
      s"""<html><head><title>Nested Table With Inner Headers</title></head><body><article>
         |<p>$P1</p>
         |<table><tr><td><table><tr><th>K</th><th>V</th></tr><tr><td>depth</td><td>tree</td></tr></table></td></tr></table>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope"),
    ("nested_table_plain_removed", "http://example.com/nested-plain",
      s"""<html><head><title>Nested Plain Tables Removed</title></head><body><article>
         |<p>$P1</p>
         |<table><tr><td><table><tr><td>in.</td></tr></table></td></tr></table>
         |<p>$P2</p><p>$P3</p>
         |</article></body></html>""".stripMargin, ".nope")
  )
}

/** Regenerates the golden TSV. Columns: name, url, selector, title,
  * markdown, article_html (markdown/article backslash-escaped).
  */
object GenGoldens {
  def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")

  def main(args: Array[String]): Unit = {
    val out = new StringBuilder
    GoldenFixtures.cases.foreach { case (name, url, html, sel) =>
      Processor.processHTML(url, html, sel) match {
        case Right(pd) =>
          out.append(Seq(name, url, sel, esc(pd.title), esc(pd.markdown), esc(pd.articleHtml))
            .mkString("\t")).append('\n')
        case Left(err) =>
          out.append(Seq(name, url, sel, "<ERROR>", esc(err), "").mkString("\t")).append('\n')
      }
    }
    val path = java.nio.file.Paths.get("src/test/resources/golden/extract_goldens.tsv")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, out.toString)
    println(s"wrote ${GoldenFixtures.cases.size} goldens to $path")
  }
}
