package graft.glob

import org.scalatest.funsuite.AnyFunSuite
import graft.url.UrlNorm

/** Match-predicate cases pinned from
  * /root/reference/crawler_test.go:304-505 (TestShouldProcessContent):
  * (patterns, url-path) → expected, path canon "" → "/" applied.
  */
class GlobSpec extends AnyFunSuite {

  private def shouldProcess(patterns: Seq[String], urlPath: String): Boolean = {
    val globs = patterns.map(Glob.compileOrThrow)
    GlobSet.shouldProcess(globs, urlPath)
  }

  private val cases: Seq[(String, Seq[String], String, Boolean)] = Seq(
    ("no patterns", Nil, "/page", true),
    ("single matching pattern (exact)", Seq("/page"), "/page", true),
    ("single non-matching pattern", Seq("/other"), "/page", false),
    ("single matching pattern (wildcard *)", Seq("/blog/*"), "/blog/my-post", true),
    ("single non-matching pattern (wildcard *)", Seq("/news/*"), "/blog/my-post", false),
    ("single matching pattern (double wildcard **)", Seq("/docs/**/getting-started"), "/docs/v1/guide/getting-started", true),
    ("multiple patterns, one matches", Seq("/about", "/products/*", "/contact"), "/products/widget", true),
    ("multiple patterns, none match", Seq("/about", "/products/*", "/contact"), "/services/consulting", false),
    ("root path matches /", Seq("/"), "/", true),
    ("root path (no slash) matches /", Seq("/"), "", true),
    ("specific path does not match /", Seq("/"), "/specific", false),
    ("pattern is just * (does not match non-empty paths)", Seq("*"), "/anypage", false),
    ("pattern is just * (does not match root path)", Seq("*"), "/", false),
    ("pattern is just **, root path", Seq("**"), "/", true),
    ("pattern is just **, any path", Seq("**"), "/foo/bar/baz", true),
    ("subpath match with double wildcard", Seq("/blog/**"), "/blog/2023/article123", true),
    ("subpath unmatch with double wildcard", Seq("/blog/**"), "/news/2023/article123", false),
    ("root path with trailing slash", Seq("/"), "/", true),
    ("exact path with query params should match", Seq("/search"), "/search", true),
    ("exact path with fragment should match", Seq("/about"), "/about", true),
    ("multiple patterns match", Seq("/contact", "/team/*"), "/team/john", true),
    ("japanese path match", Seq("/日本語/**"), "/日本語/記事タイトル", true),
    ("single wildcard match with multiple segments", Seq("/products/*"), "/products/widget123", true),
    ("single wildcard unmatch with multiple segments", Seq("/products/*"), "/products/widget123/details", false)
  )

  for ((name, patterns, path, expected) <- cases) {
    test(name) {
      assert(shouldProcess(patterns, path) == expected)
    }
  }

  test("invalid pattern is a compile error") {
    assert(Glob.compile("/path[/").isLeft)
  }
  test("unclosed brace is a compile error") {
    assert(Glob.compile("/a/{x,y").isLeft)
  }
  test("escaped glob special chars match literally") {
    val g = Glob.compileOrThrow("/path/to/\\[id\\]")
    assert(g.matches("/path/to/[id]"))
    assert(!g.matches("/path/to/x"))
  }
  test("alternation") {
    val g = Glob.compileOrThrow("/{blog,docs}/**")
    assert(g.matches("/blog/a/b"))
    assert(g.matches("/docs/x"))
    assert(!g.matches("/news/x"))
  }
  test("char class and negation") {
    assert(Glob.compileOrThrow("/p/[abc]").matches("/p/b"))
    assert(!Glob.compileOrThrow("/p/[abc]").matches("/p/d"))
    assert(Glob.compileOrThrow("/p/[a-z]x").matches("/p/qx"))
    assert(Glob.compileOrThrow("/p/[!a-z]").matches("/p/9"))
    assert(!Glob.compileOrThrow("/p/[!a-z]").matches("/p/q"))
  }
  test("? matches one non-separator char") {
    val g = Glob.compileOrThrow("/a/?")
    assert(g.matches("/a/b"))
    assert(!g.matches("/a/"))
    assert(!g.matches("/a/bc"))
  }
  test("query is ignored via pathForMatch upstream") {
    // the crawler matches on URL.Path only; "/search?q=x" never reaches the glob
    assert(UrlNorm.pathOf("http://e.com/search?q=golang") == "/search")
  }
}
