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
  val cases: Seq[(String, String, String, String)] = Seq(
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
