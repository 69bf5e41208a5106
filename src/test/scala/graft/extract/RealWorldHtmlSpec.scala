package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.GoldenFixtures
import graft.tools.GoldenFixtures.{P1, P2, P3}

/** Behavioral assertions for the real-world-HTML fixture set — each pins a
  * property the reference pipeline (go-readability, mirroring Readability.js,
  * then html-to-markdown; /root/reference/processor.go:86-108) guarantees,
  * independent of our implementation: retry-flag recovery, byline/share/
  * chrome removal, malformed-markup recovery, entity decoding, GFM corners,
  * and relative-URI fixups. Byte-level pinning of the same fixtures lives in
  * GoldenSpec (extract_goldens.tsv).
  */
class RealWorldHtmlSpec extends AnyFunSuite {

  private val byName: Map[String, (String, String, String)] =
    GoldenFixtures.cases.map { case (n, u, h, s) => n -> ((u, h, s)) }.toMap

  private def md(name: String): PageData = {
    val (url, html, sel) = byName(name)
    Processor.processHTML(url, html, sel).toOption.get
  }

  test("retry path: content inside an unlikely-candidate div is recovered") {
    // first grab strips class=sidebar (FlagStripUnlikelys) → < 500 chars →
    // the retry without the flag must recover the real content
    val pd = md("retry_sidebar_content")
    assert(pd.markdown.contains(P1) && pd.markdown.contains(P3))
    assert(pd.markdown.contains("Real Heading"))
  }

  test("short article falls through the retry ladder to the best attempt") {
    val pd = md("short_article")
    assert(pd.markdown.contains("Only a short line of genuine content"))
  }

  test("byline nodes are captured and removed (class and rel=author)") {
    val c = md("byline_class")
    assert(!c.markdown.contains("Jane Doe"), s"byline survived:\n${c.markdown}")
    assert(c.markdown.contains(P1))
    val r = md("byline_rel_author")
    assert(!r.markdown.contains("Jane Roe"), s"rel=author byline survived:\n${r.markdown}")
    assert(r.markdown.contains(P1))
  }

  test("share widgets are removed from the article") {
    val pd = md("share_widget")
    assert(!pd.markdown.contains("Share this article"))
    assert(pd.markdown.contains(P1))
  }

  test("pagination / comment / sidebar chrome never reaches the markdown") {
    val p = md("pagination_chrome")
    assert(!p.markdown.contains("/p/1"))
    assert(p.markdown.contains(P1))
    val c = md("unlikely_chrome_page")
    assert(!c.markdown.contains("user comment") && !c.markdown.contains("sidebar chrome"))
    assert(c.markdown.contains(P1))
  }

  test("deep div soup is transparent") {
    val pd = md("div_soup_deep")
    assert(pd.markdown.contains("Soup Heading"))
    assert(pd.markdown.contains(P1) && pd.markdown.contains(P3))
  }

  test("h1 headings inside content demote to h2 (readability H1→H2)") {
    val pd = md("two_h1s")
    assert(pd.markdown.contains("## First Heading"))
    assert(pd.markdown.contains("## Second Heading"))
    assert(!pd.markdown.contains("# First Heading\n".prependedAll("\n")))
  }

  test("comments and bogus CDATA leave no trace") {
    val pd = md("comments_cdata")
    assert(!pd.markdown.contains("comment") && !pd.markdown.contains("tracker"))
    assert(pd.markdown.contains(P1) && pd.markdown.contains(P2))
  }

  test("mis-nested strong/em recovers as nested emphasis") {
    val pd = md("misnested_strong_em")
    assert(pd.markdown.contains("***inverted right here***"))
  }

  test("unclosed trailing em cannot leak past its paragraph") {
    val pd = md("unclosed_em_last")
    assert(pd.markdown.contains("Trailing *emphasis left open.*"))
    assert(!pd.markdown.contains("**emphasis left open"))
  }

  test("character references decode (numeric, hex, named, legacy, unknown kept)") {
    val m = md("entities_sampler").markdown
    assert(m.contains("Dash — heart ❤ half ½"))
    assert(m.contains("AT&T legacy AT&"))
    assert(m.contains("&bogus;"), "unknown entity must stay verbatim")
    assert(m.contains("\"q\""))
  }

  test("task-list inputs are stripped by readability before markdown (reference parity)") {
    // the reference runs readability BEFORE html-to-markdown, and readability
    // cleans <input> (Readability.js _prepArticle _clean("input")) — so the
    // checkbox marks never reach the markdown; plain list items remain.
    // (Markdown.renderList's GFM task-list support is exercised directly in
    // MarkdownSpec for selector-sliced paths that bypass input cleaning.)
    val m = md("task_list").markdown
    assert(m.contains("- done item"))
    assert(m.contains("- open item"))
    assert(!m.contains("[x]") && !m.contains("[ ]"))
  }

  test("hr renders ---; br forces a hard line break") {
    val m = md("hr_and_br").markdown
    assert(m.contains("---"))
    assert(m.contains("line one  \nline two"))
  }

  test("inline code and pre blocks render as code spans / fences") {
    val m = md("inline_code_kbd").markdown
    assert(m.contains("`sbt -batch test`"))
    assert(m.contains("`Ctrl+C`"))
    assert(m.contains("```\nval frontier = seen.unionByName(next)\nfrontier.count()\n```"))
  }

  test("strikethrough renders ~~; sub/sup pass through as text") {
    val m = md("strike_sub_sup").markdown
    assert(m.contains("~~now retracted~~"))
    assert(m.contains("H2O at 103 pascals"))
  }

  test("nested blockquotes stack > prefixes") {
    val m = md("blockquote_nested").markdown
    assert(m.contains("> Outer wisdom."))
    assert(m.contains("> > Inner wisdom."))
  }

  test("images are pre-filtered in the no-selector path (reference parity)") {
    // processor.go's pre-filter removes script/style/link/img/video BEFORE
    // readability when no selector is set, so the image — and its emptied
    // paragraph — never reach the markdown. (The selector path keeps images:
    // ProcessorSpec "selector matches" asserts the resolved inline img.)
    val m = md("image_only_paragraph").markdown
    assert(!m.contains("!["))
    assert(m.contains(P1) && m.contains(P2))
  }

  test("title separators: site suffix stripped, but short titles revert (js guard)") {
    assert(md("title_separator").title == "The Very Long Article Name Here")
    // Readability.js reverts to the original when the kept part is <= 4
    // words and the separators were not hierarchical
    assert(md("title_separator_short").title == "Short Name Only | ExampleSite")
  }

  test("relative hrefs resolve against the page url") {
    val m = md("relative_uris").markdown
    assert(m.contains("(http://example.com/a/up)"), s"../ fixup failed:\n$m")
    assert(m.contains("(http://example.com/a/b/sib)"), s"./ fixup failed:\n$m")
    assert(m.contains("(http://example.com/root)"))
  }

  test("real content survives next to a negative-class promo block") {
    val pd = md("negative_promo_block")
    assert(pd.markdown.contains(P1) && pd.markdown.contains(P3))
  }
}
