package graft.extract

import org.scalatest.funsuite.AnyFunSuite

import graft.html.HtmlParser

/** Differential pin for the single-builder Markdown rewrite:
  * `Markdown.convert` must be BYTE-IDENTICAL to `MarkdownReference.convert`
  * (the verbatim string-per-element formulation it replaced, kept in the
  * test tree) over golden fixtures, generated corpus pages, and hand-built
  * adversarial snippets covering every renderer branch (empty/whitespace
  * inline wraps, links with/without href/title/empty-title, nested lists,
  * task lists, blockquotes, tables with and without th, pre, headings with
  * embedded newlines, block-inside-inline).
  *
  * convert() parses fresh trees for both sides, so the comparison also
  * covers convertElement's shared renderer (same into-functions).
  */
class MarkdownDiffSpec extends AnyFunSuite {

  private def both(html: String, label: String): Unit = {
    val got = Markdown.convert(html)
    val want = MarkdownReference.convert(html)
    assert(got == want,
      s"$label drift:\n--- new ---\n$got\n--- reference ---\n$want")
  }

  test("diff: golden fixture pages") {
    for ((name, _, html, _) <- graft.tools.GoldenFixtures.cases)
      both(html, s"golden $name")
  }

  test("diff: generated corpus pages") {
    val spec = graft.corpus.CorpusSpec(nHosts = 3, totalPages = 90, seed = 7L)
    for (h <- 0 until 3; i <- 0 until 30)
      both(graft.corpus.CorpusGen.pageHtml(spec, h, i), s"corpus h$h-$i")
  }

  test("diff: adversarial renderer-branch snippets") {
    val cases = Seq(
      // inline wraps: empty, whitespace-only, nested
      "<p><b></b><i>  </i><strong>x</strong><em> y </em><del>z</del></p>",
      "<p><b><i>deep</i></b><s>s</s><strike>k</strike></p>",
      // links: no href, empty href, empty text, title, EMPTY title, spaces
      "<p><a>no href</a><a href=''>empty</a><a href='u'>t</a></p>",
      "<p><a href='u' title='T'>t</a><a href='u' title=''>t2</a></p>",
      "<p><a href='a b'>sp</a><a href='u'>  </a></p>",
      // images: no src, title, empty alt/title, spaces in src
      "<p><img><img src='s'><img src='a b' alt='A' title='T'><img src='s' alt='' title=''></p>",
      // code family
      "<p><code>c</code><kbd></kbd><samp> s </samp><tt>t</tt></p>",
      // headings: embedded newlines, empty
      "<h1>a\nb\n\nc</h1><h2>  </h2><h3>x</h3><h6>z</h6>",
      // paragraphs, br, hr
      "<p>  </p><p>a<br>b</p><hr>",
      // blockquotes: nested, trailing ws lines, empty
      "<blockquote><p>q </p><blockquote>inner</blockquote></blockquote><blockquote>  </blockquote>",
      // pre
      "<pre>code\nline\n</pre><pre></pre>",
      // lists: nested, ordered, task, empty li, block children in li
      "<ul><li>a</li><li><ul><li>n</li></ul></li><li><p>p</p>t</li></ul>",
      "<ol><li>one</li><li>two<ol><li>x</li></ol></li></ol>",
      "<ul><li><input type=checkbox checked>done</li><li><input type=checkbox>todo</li></ul>",
      "<ul></ul><ul><li></li></ul>",
      // tables: th header, headerless, ragged, pipes in cells, newlines in cells
      "<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>",
      "<table><tr><td>a|x</td><td>b</td><td>c</td></tr><tr><td>d</td></tr></table>",
      "<table><tr><td>l1<br>l2</td></tr></table>",
      "<table></table><table><tr></tr></table>",
      // block-inside-inline and transparent containers
      "<span>s<div>d</div>t</span><section><p>sec</p></section>",
      "<p>x<span>y<b>z</b></span></p>",
      // whitespace-only text nodes between blocks, entities
      "<div> <p>a</p> \n <p>b</p> </div>",
      "<p>&amp; &lt;tag&gt; &quot;q&quot;</p>",
      // unknown inline elements fall through to inline()
      "<p><custom>inside</custom><u>u</u><mark>m</mark></p>",
      // dt/dd
      "<dl><dt>term</dt><dd>def</dd><dt> </dt></dl>",
      // dropped elements
      "<p>a<iframe>x</iframe><object>o</object><svg>v</svg>b</p>")
    cases.zipWithIndex.foreach { case (html, i) => both(html, s"snippet[$i]") }
  }

  test("diff: whitespace/newline torture") {
    val cases = Seq(
      "<p>ab</p>", "<p>ab</p>", "<p>\t\n a \f b \r\n</p>",
      "<p> </p><p>\n</p><p> </p>", // NBSP is NOT \s: survives collapse
      "<h2>x \n\n y</h2>", "<li>bare li outside list</li>",
      "<ul><li>a\n\n\n\nb</li></ul>",
      "<blockquote>l1\n   \nl2</blockquote>")
    cases.zipWithIndex.foreach { case (html, i) => both(html, s"ws[$i]") }
  }
}
