package graft.html

import org.scalatest.funsuite.AnyFunSuite

class HtmlParserSpec extends AnyFunSuite {

  test("basic skeleton with head and body") {
    val d = HtmlParser.parse(
      "<html><head><title>Page 1</title></head><body><h1>Hello</h1><p>This is page 1.</p><a href=\"/page2\">Page 2</a></body></html>")
    assert(d.head.get.findFirst("title").get.text == "Page 1")
    assert(d.find("h1").head.text == "Hello")
    assert(d.find("a").head.attr("href").contains("/page2"))
  }

  test("missing html/head/body synthesized") {
    val d = HtmlParser.parse("<p>hello</p>")
    assert(d.body.get.find("p").head.text == "hello")
  }

  test("anchors in document order") {
    val html = """<html><body>
      <a href="/one">1</a><div><a href="/two">2</a></div><a href="/three">3</a>
      </body></html>"""
    val d = HtmlParser.parse(html)
    assert(d.find("a[href]").map(_.attr("href").get) == Vector("/one", "/two", "/three"))
  }

  test("a without href excluded by a[href]") {
    val d = HtmlParser.parse("""<body><a name="x">no href</a><a href="/y">y</a></body>""")
    assert(d.find("a[href]").map(_.attr("href").get) == Vector("/y"))
  }

  test("void elements don't nest") {
    val d = HtmlParser.parse("<body><img src='a.jpg'><p>text</p></body>")
    val img = d.find("img").head
    assert(img.children.isEmpty)
    assert(d.find("p").head.text == "text")
    assert(d.find("img").head.parent.tag == "body")
  }

  test("p auto-closes on block") {
    val d = HtmlParser.parse("<body><p>one<div>two</div></body>")
    val p = d.find("p").head
    assert(p.text == "one")
    assert(d.find("div").head.parent.tag == "body")
  }

  test("li auto-closes") {
    val d = HtmlParser.parse("<ul><li>a<li>b<li>c</ul>")
    assert(d.find("li").map(_.text) == Vector("a", "b", "c"))
    assert(d.find("li").forall(_.parent.tag == "ul"))
  }

  test("script content is raw") {
    val d = HtmlParser.parse("<head><script>if (a < b) { x(); }</script></head><body>t</body>")
    val s = d.find("script").head
    assert(s.text == "if (a < b) { x(); }")
    assert(s.outerHtml == "<script>if (a < b) { x(); }</script>")
  }

  test("style in head, raw") {
    val d = HtmlParser.parse("<style>body { font-family: sans-serif; }</style><p>x</p>")
    assert(d.find("style").head.text == "body { font-family: sans-serif; }")
  }

  test("noscript content is raw text (scripting-enabled parse, x/net/html parity)") {
    val d = HtmlParser.parse(
      """<body><p>t</p><noscript><a href="/hidden">h</a><img src="/i.png"></noscript></body>""")
    val ns = d.find("noscript").head
    // content is ONE text node — no element children, so the pre-filter and
    // the link extractor cannot see inside (exactly goquery's view)
    assert(ns.children.size == 1 && ns.children.head.isInstanceOf[HText])
    assert(ns.text == """<a href="/hidden">h</a><img src="/i.png">""")
    assert(d.find("a").isEmpty && d.find("img").isEmpty)
    // serialization round-trips the raw content verbatim
    assert(ns.outerHtml ==
      """<noscript><a href="/hidden">h</a><img src="/i.png"></noscript>""")
  }

  test("entities decoded in text and attrs") {
    val d = HtmlParser.parse("""<body><p title="a&amp;b">&copy; 2025 &lt;x&gt; &#65;&#x42;</p></body>""")
    val p = d.find("p").head
    assert(p.attr("title").contains("a&b"))
    assert(p.text == "© 2025 <x> AB")
  }

  test("comments preserved") {
    val d = HtmlParser.parse("<body><!-- hi --><p>x</p></body>")
    assert(d.body.get.children.exists { case c: HComment => c.data == " hi "; case _ => false })
  }

  test("unquoted and single-quoted attrs") {
    val d = HtmlParser.parse("<body><img src=test.jpg alt='Test Image'></body>")
    val img = d.find("img").head
    assert(img.attr("src").contains("test.jpg"))
    assert(img.attr("alt").contains("Test Image"))
  }

  test("selector: class, id, descendant, comma, attr value") {
    val html = """<body>
      <div class="ignored">no</div>
      <article class="main-content extra"><h2 id="t">Title</h2><p>body</p></article>
      <span data-x="1">s</span>
    </body>"""
    val d = HtmlParser.parse(html)
    assert(d.findFirst(".main-content").get.tag == "article")
    assert(d.findFirst("#t").get.text == "Title")
    assert(d.findFirst("article p").get.text == "body")
    assert(d.find("h2, span").map(_.tag) == Vector("h2", "span"))
    assert(d.findFirst("span[data-x=1]").isDefined)
    assert(d.findFirst("article > h2").isDefined)
    assert(d.findFirst("body > h2").isEmpty)
    assert(d.findFirst(".nope").isEmpty)
  }

  test("removeAll removes in place and count returned") {
    val html = "<html><head><title>T</title><style>s</style></head>" +
      "<body><script>x</script><p>keep</p><img src='i.jpg'><video><source src='v.mp4'></video></body></html>"
    val d = HtmlParser.parse(html)
    val removed = Seq("script", "style", "link", "img", "video").map(d.removeAll).sum
    assert(removed == 4)
    assert(d.find("script").isEmpty && d.find("img").isEmpty && d.find("video").isEmpty)
    assert(d.findFirst("p").get.text == "keep")
  }

  test("outerHtml round trip is stable") {
    val html = "<html><head><title>T</title></head><body><p>a &amp; b</p></body></html>"
    val d = HtmlParser.parse(html)
    val once = d.outerHtml
    val twice = HtmlParser.parse(once).outerHtml
    assert(once == twice)
    assert(once.contains("a &amp; b"))
  }

  test("doctype preserved in preamble") {
    val d = HtmlParser.parse("<!DOCTYPE html><html><body><p>x</p></body></html>")
    assert(d.outerHtml.startsWith("<!DOCTYPE html>"))
  }

  test("table structure") {
    val d = HtmlParser.parse("<table><tr><td>a<td>b<tr><td>c</table>")
    assert(d.find("tr").size == 2)
    assert(d.find("td").map(_.text) == Vector("a", "b", "c"))
  }

  test("nested a closes previous a") {
    val d = HtmlParser.parse("<body><a href='/a'>x<a href='/b'>y</a></body>")
    assert(d.find("a").map(_.attr("href").get) == Vector("/a", "/b"))
  }

  test("malformed: unclosed tags tolerated") {
    val d = HtmlParser.parse("<body><div><p>text")
    assert(d.findFirst("p").get.text == "text")
  }

  test("title entity decoding") {
    val d = HtmlParser.parse("<head><title>A &amp; B</title></head>")
    assert(d.findFirst("title").get.text == "A & B")
  }

  test("element nesting depth is clamped like a browser (Blink 512)") {
    val html = "<body>" + "<div>" * 5000 + "deep text" + "</div>" * 5000
    val d = HtmlParser.parse(html)
    // iterative max-depth walk (must not itself rely on the clamp under test)
    var maxDepth = 0
    val st = scala.collection.mutable.ArrayBuffer[(HNode, Int)]((d.root, 1))
    while (st.nonEmpty) {
      val (node, dep) = st.remove(st.length - 1)
      maxDepth = math.max(maxDepth, dep)
      node match {
        case e: HElement => e.children.foreach(c => st += ((c, dep + 1)))
        case _           =>
      }
    }
    assert(maxDepth <= HtmlParser.MaxTreeDepth + 4)
    // every element survives — deeper opens become siblings, not drops
    assert(d.find("div").size == 5000)
    assert(d.root.text.contains("deep text"))
  }
}
