package graft.html

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.GoldenFixtures

/** Pins the two properties the crawl kernel's no-serialize pre-filter path
  * rests on (Processor.processParsed):
  *
  *  1. `outerHtmlLength == outerHtml.length` — the length-only walk must
  *     mirror the serializer branch for branch, or the pre-filter
  *     acceptance decision (serialized length vs raw length) drifts.
  *  2. Re-deriving the pre-filtered tree (parse raw + removeTags +
  *     mergeAdjacentText) serializes byte-identically to re-parsing the
  *     tree's own serialization — the property that lets readability's
  *     retry attempts re-derive instead of consuming a materialized
  *     `modified` string.
  */
class SerializerLengthSpec extends AnyFunSuite {

  private val preFilterTags = Set("script", "style", "link", "img", "video")

  private val edgeCases = Seq(
    "<p>a &amp; b &lt;c&gt; 'q' \"d\"</p>",
    "<!DOCTYPE html><!-- lead --><html><head><title>T &amp; t</title></head><body><p>x</p></body></html>",
    "<div data-x=\"a&quot;b\" empty>text<br><img src=x.png></div>",
    "<pre>  spaced\n\ttabbed</pre><textarea>&lt;raw&gt;</textarea>",
    "<noscript><img src=\"n.png\"></noscript><iframe>inner</iframe>",
    "<ul><li>one<li>two</ul><table><tr><td>a<td>b</tr></table>",
    "<p>unterminated <em>em",
    "",
    "&#x41;&#66;&unknown;&amp",
    // plaintext is raw text in BOTH parser and serializer — entities and
    // tag-ish bytes inside must survive the round trip untouched
    "<div><plaintext>a &lt;b <c> &amp;</plaintext><p>after</p></div>",
    "<xmp>raw &lt;x&gt;</xmp><iframe><p>inner</p></iframe>"
  )

  // real corpus pages too — the pre-filter acceptance decision for the
  // whole crawl path rests on these properties, so they are pinned over
  // generated-corpus HTML, not just the hand-picked fixtures
  private lazy val corpusPages: Seq[(String, String)] = {
    val spec = graft.corpus.CorpusSpec(nHosts = 3, totalPages = 90, seed = 7L)
    for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h))
      yield (s"corpus-$h-$i", graft.corpus.CorpusGen.pageHtml(spec, h, i))
  }

  private def allInputs: Seq[(String, String)] =
    GoldenFixtures.cases.map { case (name, _, html, _) => (name, html) } ++
      edgeCases.zipWithIndex.map { case (h, i) => (s"edge$i", h) } ++
      corpusPages

  test("outerHtmlLength equals outerHtml.length, pristine and pre-filtered") {
    for ((name, html) <- allInputs) {
      val doc = HtmlParser.parse(html)
      assert(doc.outerHtmlLength == doc.outerHtml.length.toLong, s"pristine: $name")
      val removed = doc.removeTags(preFilterTags)
      if (removed > 0) doc.mergeAdjacentText()
      assert(doc.outerHtmlLength == doc.outerHtml.length.toLong, s"pre-filtered: $name")
    }
  }

  test("re-derived pre-filtered tree == re-parse of its serialization") {
    for ((name, html) <- allInputs) {
      val doc = HtmlParser.parse(html)
      val removed = doc.removeTags(preFilterTags)
      if (removed > 0) doc.mergeAdjacentText()
      val serialized = doc.outerHtml
      // what the old retry path consumed
      val viaString = HtmlParser.parse(serialized).outerHtml
      // what the new retry path derives
      val d2 = HtmlParser.parse(html)
      val r2 = d2.removeTags(preFilterTags)
      if (r2 > 0) d2.mergeAdjacentText()
      assert(r2 == removed, s"removal drift: $name")
      assert(d2.outerHtml == serialized, s"re-derive drift: $name")
      assert(viaString == serialized, s"round-trip drift: $name")
    }
  }
}
