package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.glob.Glob
import graft.url.UrlNorm

/** The 24 link-extraction cases pinned verbatim from
  * /root/reference/crawler_test.go:507-768 (TestExtractAndFilterLinks).
  * The reference compares sets; we additionally assert first-occurrence order.
  */
class LinkExtractorSpec extends AnyFunSuite {

  private def run(pageUrl: String, html: String, follow: Seq[String] = Nil): Vector[String] = {
    val globs = follow.map(Glob.compileOrThrow)
    LinkExtractor.extract(pageUrl, UrlNorm.hostnameOf(pageUrl), html, globs)
  }

  test("no links") {
    assert(run("http://example.com/", "<html><body><p>No links here.</p></body></html>") == Vector())
  }
  test("one valid same-domain link") {
    assert(run("http://example.com/", """<html><body><a href="/page1">Page 1</a></body></html>""") ==
      Vector("http://example.com/page1"))
  }
  test("absolute same-domain link") {
    assert(run("http://example.com/", """<html><body><a href="http://example.com/page2">Page 2</a></body></html>""") ==
      Vector("http://example.com/page2"))
  }
  test("multiple valid links") {
    val html = """<html><body>
                <a href="sub1">Sub Page 1</a>
                <a href="/otherpath">Other Path</a>
                <a href="http://example.com/another">Another Absolute</a>
            </body></html>"""
    assert(run("http://example.com/path/", html) == Vector(
      "http://example.com/path/sub1",
      "http://example.com/otherpath",
      "http://example.com/another"))
  }
  test("duplicate links") {
    val html = """<html><body>
                <a href="/page1">Page 1</a>
                <a href="/page1">Page 1 Again</a>
                <a href="http://example.com/page1">Page 1 Absolute</a>
            </body></html>"""
    assert(run("http://example.com/", html) == Vector("http://example.com/page1"))
  }
  test("external domain link") {
    assert(run("http://example.com/", """<html><body><a href="http://othersite.com/page">Other Site</a></body></html>""") == Vector())
  }
  test("mailto and tel links") {
    val html = """<html><body>
                <a href="mailto:test@example.com">Email</a>
                <a href="tel:+123456789">Call</a>
            </body></html>"""
    assert(run("http://example.com/", html) == Vector())
  }
  test("ftp link") {
    assert(run("http://example.com/", """<html><body><a href="ftp://example.com/file">FTP</a></body></html>""") == Vector())
  }
  test("link with fragment") {
    assert(run("http://example.com/", """<html><body><a href="/page#section">Page with fragment</a></body></html>""") ==
      Vector("http://example.com/page"))
  }
  test("link to root, page is root") {
    assert(run("http://example.com/", """<html><body><a href="/">Home</a></body></html>""") ==
      Vector("http://example.com/"))
  }
  test("link to root, page is subpage") {
    assert(run("http://example.com/sub/page", """<html><body><a href="/">Home</a></body></html>""") ==
      Vector("http://example.com/"))
  }
  test("link relative to current directory") {
    assert(run("http://example.com/blog/post1/", """<html><body><a href="edit">Edit Post</a></body></html>""") ==
      Vector("http://example.com/blog/post1/edit"))
  }
  test("link with .. (parent directory)") {
    assert(run("http://example.com/blog/category/post/", """<html><body><a href="../other-post">Other Post in Category</a></body></html>""") ==
      Vector("http://example.com/blog/category/other-post"))
  }
  test("invalid href (just fragment)") {
    assert(run("http://example.com/", """<html><body><a href="#section-only">Section</a></body></html>""") ==
      Vector("http://example.com/"))
  }
  test("empty href") {
    assert(run("http://example.com/", """<html><body><a href="">Empty Href</a></body></html>""") ==
      Vector("http://example.com/"))
  }
  test("link with spaces (should be handled by url.Parse)") {
    assert(run("http://example.com/", """<html><body><a href="/path with spaces">Path With Spaces</a></body></html>""") ==
      Vector("http://example.com/path%20with%20spaces"))
  }
  test("complex scenario with mixed links") {
    val html = """
                <html><body>
                    <a href="intro.html">Intro</a>
                    <a href="/api/v1/method">API Method</a>
                    <a href="https://sub.example.com/docs/v1/examples/ex1.html">Full Example Link</a>
                    <a href="https://anothersub.example.com/page">Another Subdomain (same base)</a>
                    <a href="https://othersite.net/resource">External Site</a>
                    <a href="mailto:support@example.com">Support</a>
                    <a href="intro.html#part2">Intro Part 2</a>
                    <a href="/docs/v1/intro.html">Duplicate of Intro via absolute path</a>
                </body></html>"""
    assert(run("https://sub.example.com/docs/v1/", html) == Vector(
      "https://sub.example.com/docs/v1/intro.html",
      "https://sub.example.com/api/v1/method",
      "https://sub.example.com/docs/v1/examples/ex1.html"))
  }
  test("page URL with no trailing slash, relative link") {
    assert(run("http://example.com/folder", """<html><body><a href="item">Item</a></body></html>""") ==
      Vector("http://example.com/item"))
  }
  test("page URL with trailing slash, relative link") {
    assert(run("http://example.com/folder/", """<html><body><a href="item">Item</a></body></html>""") ==
      Vector("http://example.com/folder/item"))
  }
  test("with follow-match, one matching link") {
    assert(run("http://example.com/",
      """<html><body><a href="/allowed/page1">Allowed</a> <a href="/denied/page2">Denied</a></body></html>""",
      Seq("/allowed/*")) == Vector("http://example.com/allowed/page1"))
  }
  test("with follow-match, no matching links") {
    assert(run("http://example.com/", """<html><body><a href="/other/page1">Other</a></body></html>""",
      Seq("/allowed/*")) == Vector())
  }
  test("with follow-match, multiple patterns, some matching") {
    val html = """<html><body>
                <a href="/blog/post1">Blog Post 1</a>
                <a href="/docs/guide/topic">Docs Guide</a>
                <a href="/news/update">News Update</a>
            </body></html>"""
    assert(run("http://example.com/", html, Seq("/blog/*", "/docs/**")) == Vector(
      "http://example.com/blog/post1",
      "http://example.com/docs/guide/topic"))
  }
  test("no follow-match (nil), should behave as before") {
    assert(run("http://example.com/",
      """<html><body><a href="/page1">Page 1</a> <a href="http://external.com">External</a></body></html>""") ==
      Vector("http://example.com/page1"))
  }
  test("no follow-match (empty slice), should behave as before") {
    assert(run("http://example.com/",
      """<html><body><a href="/page1">Page 1</a> <a href="/page2">Page 2</a></body></html>""",
      Seq()) == Vector("http://example.com/page1", "http://example.com/page2"))
  }
  test("follow-match with root path /") {
    assert(run("http://example.com/",
      """<html><body><a href="/">Home</a> <a href="/about">About</a></body></html>""",
      Seq("/")) == Vector("http://example.com/"))
  }
  test("follow-match with path containing special glob chars (literal match)") {
    val html = """<html><body>
                <a href="/path/to/[id]">Item ID</a>
                <a href="/path/to/other">Other</a>
            </body></html>"""
    // Go keeps [ ] literal via the RawPath hint (validEncoded allows them)
    assert(run("http://example.com/", html, Seq("/path/to/\\[id\\]")) ==
      Vector("http://example.com/path/to/[id]"))
  }

  // ---- extractWithText: anchor-text capture -------------------------------

  private def runText(pageUrl: String, html: String): Vector[(String, String)] =
    LinkExtractor.extractWithText(pageUrl, UrlNorm.hostnameOf(pageUrl), html, Nil)

  test("anchor text: first occurrence wins, duplicates keep the first text") {
    val html = """<html><body>
                <a href="/p">First Label</a>
                <a href="/p">Second Label</a>
            </body></html>"""
    assert(runText("http://example.com/", html) ==
      Vector(("http://example.com/p", "First Label")))
  }
  test("anchor text: nested markup flattens, whitespace collapses") {
    val html = "<html><body><a href=\"/p\">  read\n  <strong>the <em>full</em></strong>\tstory </a></body></html>"
    assert(runText("http://example.com/", html) ==
      Vector(("http://example.com/p", "read the full story")))
  }
  test("anchor text: empty anchors yield empty text; urls match extract()") {
    val html = """<html><body>
                <a href="/a"></a>
                <a href="/b"><img src="x.png"></a>
                <a href="/c">c text</a>
                <a href="mailto:x@y.z">mail</a>
            </body></html>"""
    val withText = runText("http://example.com/", html)
    assert(withText == Vector(
      ("http://example.com/a", ""),
      ("http://example.com/b", ""),
      ("http://example.com/c", "c text")))
    // the with-text variant must walk the exact same predicate chain
    assert(withText.map(_._1) ==
      LinkExtractor.extract("http://example.com/", "example.com", html, Nil))
  }
}
