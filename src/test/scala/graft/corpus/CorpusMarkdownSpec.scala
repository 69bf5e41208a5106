package graft.corpus

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Processor

/** Pins the generator's ground-truth markdown (CorpusGen.expectedMarkdown)
  * to the actual readability→GFM pipeline output, byte-for-byte, across the
  * template grid (all sections, table/no-table, dangling-link variants,
  * short and 24-paragraph pages). The sf0.01 driver oracle then checks the
  * same invariant over every corpus page (crawl_extract_markdown).
  */
class CorpusMarkdownSpec extends AnyFunSuite {

  test("expectedMarkdown matches the extraction pipeline across the template grid") {
    val specs = Seq(
      CorpusGen.specFor("/x/sf0.001"),
      CorpusSpec(nHosts = 2, totalPages = 40, seed = 7L, paragraphs = 24))
    // the grid must exercise every adversarial decoration variant (comments/
    // CDATA, unlikely-candidate chrome, div soup, entities, mis-nesting,
    // unclosed inline, blockquote+pre, noscript-image swap, lazy image) —
    // not just the clean template
    val decos = (for {
      spec <- specs
      h <- 0 until spec.nHosts
      i <- 0 until math.min(spec.hostSizes(h), 12)
      if !CorpusGen.isEmptyPage(spec, h, i)
    } yield CorpusGen.decoOf(spec, h, i)).toSet
    assert(decos == (0 until 10).toSet, s"grid covers only variants $decos")
    for {
      spec <- specs
      h <- 0 until spec.nHosts
      i <- 0 until math.min(spec.hostSizes(h), 12)
    } {
      val url = CorpusGen.pageUrl(h, i)
      val html = CorpusGen.pageHtml(spec, h, i)
      if (CorpusGen.isEmptyPage(spec, h, i)) {
        // P8: empty-HTML page — extraction yields nothing either way
        val (t, m) = Processor.processHTML(url, html, "")
          .fold(_ => ("", ""), pd => (pd.title, pd.markdown))
        assert(t == "" && m == "", s"empty page h=$h i=$i must extract to nothing")
      } else {
        val pd = Processor.processHTML(url, html, "")
          .fold(e => fail(s"extract failed h=$h i=$i: $e"), identity)
        assert(pd.title == CorpusGen.pageTitle(h, i), s"title h=$h i=$i")
        assert(pd.markdown == CorpusGen.expectedMarkdown(spec, h, i), s"markdown h=$h i=$i")
        assert(pd.articleHtml == CorpusGen.expectedArticleHtml(spec, h, i),
          s"article_html h=$h i=$i deco=${CorpusGen.decoOf(spec, h, i)}")
        // selector-miss branch (readability over the RAW page, no pre-filter):
        // image variants keep their noscript-unwrapped / lazy-promoted image
        val sel = Processor.processHTML(url, html, "#no-such-element")
          .fold(e => fail(s"selector extract failed h=$h i=$i: $e"), identity)
        assert(sel.markdown == CorpusGen.expectedSelectorMarkdown(spec, h, i),
          s"sel_markdown h=$h i=$i deco=${CorpusGen.decoOf(spec, h, i)}")
      }
    }
  }

  test("selector=table slices to the constant table markdown; miss falls back to full page") {
    val spec = CorpusGen.specFor("/x/sf0.001")
    val tableI = (1 until spec.hostSizes(0))
      .find(i => i % 5 == 1 && !CorpusGen.isEmptyPage(spec, 0, i)).get
    val hit = Processor.processHTML(
      CorpusGen.pageUrl(0, tableI), CorpusGen.pageHtml(spec, 0, tableI), "table")
      .fold(e => fail(e), identity)
    assert(hit.title == "")
    assert(hit.markdown == CorpusGen.TableMd)
    val miss = Processor.processHTML(
      CorpusGen.pageUrl(0, 0), CorpusGen.pageHtml(spec, 0, 0), "table")
      .fold(e => fail(e), identity)
    assert(miss.title == CorpusGen.pageTitle(0, 0))
    assert(miss.markdown == CorpusGen.expectedMarkdown(spec, 0, 0))
  }
}
