package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit tests of the HTML→GFM converter (H5) — the paths a full
  * processHTML run can't reach because readability's cleaning removes the
  * input first (checkboxes, raw fragments), modeled on html-to-markdown
  * v1.6.0 + GitHubFlavored as the reference configures it
  * (/root/reference/processor.go:97-98).
  */
class MarkdownSpec extends AnyFunSuite {

  test("GFM task lists render checkbox markers") {
    val md = Markdown.convert(
      """<ul><li><input type="checkbox" checked> done item</li>
        |<li><input type="checkbox"> open item</li></ul>""".stripMargin)
    assert(md.contains("- [x] done item"))
    assert(md.contains("- [ ] open item"))
  }

  test("nested lists indent four spaces") {
    val md = Markdown.convert(
      "<ul><li>outer<ul><li>inner one</li><li>inner two</li></ul></li></ul>")
    assert(md.contains("- outer"))
    assert(md.contains("    - inner one"))
  }

  test("ordered lists number sequentially") {
    val md = Markdown.convert("<ol><li>first</li><li>second</li><li>third</li></ol>")
    assert(md == "1. first\n2. second\n3. third")
  }

  test("tables without th get an empty GFM header row") {
    val md = Markdown.convert(
      "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>")
    assert(md == "|  |  |\n| --- | --- |\n| a | b |\n| c | d |")
  }

  test("pipe characters inside cells are escaped") {
    val md = Markdown.convert("<table><tr><th>x|y</th></tr><tr><td>a|b</td></tr></table>")
    assert(md.contains("| x\\|y |"))
    assert(md.contains("| a\\|b |"))
  }

  test("img without src renders nothing; a without href renders bare text") {
    assert(Markdown.convert("<p><img alt='x'> tail</p>") == "tail")
    assert(Markdown.convert("<p><a>just text</a></p>") == "just text")
  }

  test("strong/em/del collapse empty content") {
    assert(Markdown.convert("<p>a <strong></strong>b <em> </em>c</p>") == "a b c")
  }
}
