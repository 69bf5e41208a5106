package graft.url

import org.scalatest.funsuite.AnyFunSuite

/** The 16 normalization cases pinned verbatim from
  * /root/reference/crawler_test.go:27-150 (TestNormalizeURLtoString).
  */
class UrlNormSpec extends AnyFunSuite {

  private val cases: Seq[(String, String, String, Boolean)] = Seq(
    ("simple http", "http://example.com", "http://example.com/", false),
    ("simple https", "https://example.com", "https://example.com/", false),
    ("with trailing slash", "http://example.com/", "http://example.com/", false),
    ("with path", "http://example.com/path/to/page", "http://example.com/path/to/page", false),
    ("with path and trailing slash", "http://example.com/path/to/page/", "http://example.com/path/to/page", false),
    ("with fragment", "http://example.com/page#section", "http://example.com/page", false),
    ("domain with fragment", "http://example.com#section", "http://example.com/", false),
    ("with query parameters", "http://example.com/search?q=term", "http://example.com/search?q=term", false),
    ("with query and fragment", "http://example.com/search?q=term#results", "http://example.com/search?q=term", false),
    ("complex URL with port", "https://sub.example.co.uk:8080/path?name=val&name2=val2#frag", "https://sub.example.co.uk:8080/path?name=val&name2=val2", false),
    ("URL with only domain and query", "http://example.com?query=true", "http://example.com/?query=true", false),
    ("invalid URL scheme", "ftp://example.com/file", "ftp://example.com/file", false),
    ("invalid URL structure", "://example.com", "", true),
    ("empty string", "", "", true),
    ("just a fragment", "#fragment", "", true),
    ("relative path", "/just/a/path", "/just/a/path", false),
    ("relative path with fragment", "/just/a/path#frag", "/just/a/path", false)
  )

  for ((name, input, want, wantErr) <- cases) {
    test(name) {
      UrlNorm.normalize(input) match {
        case Left(err) =>
          assert(wantErr, s"unexpected error: $err")
        case Right(got) =>
          assert(!wantErr, s"expected error, got $got")
          assert(got == want)
      }
    }
  }

  test("schemeless bare host") {
    assert(UrlNorm.normalize("example.com") == Right("http://example.com/"))
  }
  test("schemeless host with path") {
    assert(UrlNorm.normalize("example.com/foo") == Right("http://example.com/foo"))
  }
  test("whitespace trimmed") {
    assert(UrlNorm.normalize("  http://example.com/a  ") == Right("http://example.com/a"))
  }
  test("query kept verbatim, not sorted") {
    assert(UrlNorm.normalize("http://e.com/p?b=2&a=1") == Right("http://e.com/p?b=2&a=1"))
  }
  test("host case not folded") {
    assert(UrlNorm.normalize("http://EXAMPLE.com/P") == Right("http://EXAMPLE.com/P"))
  }
  test("scheme case folded by parser") {
    assert(UrlNorm.normalize("HTTP://example.com") == Right("http://example.com/"))
  }
  test("space in path reencoded as %20") {
    assert(UrlNorm.normalize("http://example.com/path with spaces") ==
      Right("http://example.com/path%20with%20spaces"))
  }

  test("pathForMatch") {
    assert(UrlNorm.pathForMatch("") == "/")
    assert(UrlNorm.pathForMatch("abc") == "/abc")
    assert(UrlNorm.pathForMatch("/abc") == "/abc")
  }

  test("hostname strips port") {
    assert(UrlNorm.hostnameOf("https://sub.example.co.uk:8080/path") == "sub.example.co.uk")
    assert(UrlNorm.hostnameOf("http://example.com/x") == "example.com")
  }
}

/** RFC-3986 reference resolution parity (F2) — the resolution shapes pinned
  * by the link-extraction table /root/reference/crawler_test.go:507-768.
  */
class GoUrlResolveSpec extends AnyFunSuite {
  private def resolve(page: String, href: String): String = {
    val base = GoUrl.parse(page).toOption.get
    base.parseRef(href).toOption.get.toUrlString
  }

  test("relative to current directory") {
    assert(resolve("http://example.com/blog/post1/", "edit") == "http://example.com/blog/post1/edit")
  }
  test("relative from file-ish page (no trailing slash)") {
    assert(resolve("http://example.com/folder", "item") == "http://example.com/item")
  }
  test("relative from dir page (trailing slash)") {
    assert(resolve("http://example.com/folder/", "item") == "http://example.com/folder/item")
  }
  test("parent directory ..") {
    assert(resolve("http://example.com/blog/category/post/", "../other-post") ==
      "http://example.com/blog/category/other-post")
  }
  test("absolute path") {
    assert(resolve("http://example.com/path/", "/otherpath") == "http://example.com/otherpath")
  }
  test("fragment only resolves to page itself (plus fragment)") {
    assert(resolve("http://example.com/", "#section-only") == "http://example.com/#section-only")
  }
  test("empty href resolves to page itself") {
    assert(resolve("http://example.com/", "") == "http://example.com/")
    assert(resolve("http://example.com/a?q=1", "") == "http://example.com/a?q=1")
  }
  test("spaces become %20") {
    assert(resolve("http://example.com/", "/path with spaces") ==
      "http://example.com/path%20with%20spaces")
  }
  test("mailto stays opaque non-http") {
    val r = GoUrl.parse("http://example.com/").toOption.get.parseRef("mailto:test@example.com").toOption.get
    assert(r.scheme == "mailto")
    assert(r.host == "")
  }
  test("ftp absolute keeps scheme") {
    val r = GoUrl.parse("http://example.com/").toOption.get.parseRef("ftp://example.com/file").toOption.get
    assert(r.scheme == "ftp")
  }
  test("absolute http href replaces") {
    assert(resolve("https://sub.example.com/docs/v1/", "https://anothersub.example.com/page") ==
      "https://anothersub.example.com/page")
  }
  test("query-relative href") {
    assert(resolve("http://example.com/a/b", "?x=1") == "http://example.com/a/b?x=1")
  }
  test("unicode path escaped per byte") {
    val n = UrlNorm.normalize("http://example.com/日本語/記事")
    assert(n.isRight)
    // Go re-encodes non-ASCII path bytes as UTF-8 percent escapes
    assert(n.toOption.get == "http://example.com/%E6%97%A5%E6%9C%AC%E8%AA%9E/%E8%A8%98%E4%BA%8B")
  }
  test("decoded path used for matching") {
    assert(UrlNorm.pathOf("http://example.com/%E6%97%A5%E6%9C%AC%E8%AA%9E/x") == "/日本語/x")
  }

  test("normalizeParsed reuse == reparse of the normalized string (adversarial grid)") {
    // the link extractor evaluates its predicates on normalizeParsed's
    // result WITHOUT reparsing the serialized string — pin the identity
    val structured = Seq(
      "http://example.com", "http://example.com/", "http://example.com/a/b/",
      "HTTP://EXAMPLE.com/Path", "//example.com/x", "example.com/x.html",
      "http://example.com/a%20b/c", "http://example.com/a b",
      "http://example.com/%e6%97%a5", "http://example.com/?q=a b&r=%zz",
      "http://example.com/a?q=1#frag", "http://user:pw@example.com:8080/p",
      "mailto:team@example.com", "ftp://example.com/f", "tel:+1-555",
      "http://example.com/../..", "http://example.com/a/./b/../c",
      "/relative/only", "rel/ative", "?onlyquery", "#onlyfrag", "",
      "http://[::1]:80/x", "http://example.com/%", "http://example.com/%2",
      "http://example.com/日本語", " http://spaces.example/  ",
      "https://example.com/a//b", "http://example.com//double",
      "javascript:void(0)", "data:text/plain,hi")
    val rnd = new scala.util.Random(20260817)
    val alphabet = "abz09/:?#%&=._~!$'()*+,;@[]- \t\u00e9\u65e5"
    val fuzz = (1 to 4000).map { _ =>
      val n = 1 + rnd.nextInt(24)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val prefixes = Seq("", "http://h.test/", "http://h.test/a/", "//h.test/", "x:")
    var checked = 0
    (structured ++ fuzz.flatMap(f => prefixes.map(_ + f))).foreach { s =>
      UrlNorm.normalizeParsed(s) match {
        case Left(_) =>
        case Right(u) =>
          val str = u.toUrlString
          GoUrl.parse(str) match {
            case Left(err) => fail(s"normalized '$s' -> '$str' fails reparse: $err")
            case Right(v) =>
              assert(v.scheme == u.scheme, s"'$s': scheme ${v.scheme} != ${u.scheme}")
              assert(v.hostname == u.hostname, s"'$s': host ${v.hostname} != ${u.hostname}")
              assert(v.path == u.path, s"'$s': path '${v.path}' != '${u.path}'")
              assert(v.toUrlString == str, s"'$s': serialize not a fixpoint")
              checked += 1
          }
      }
    }
    assert(checked > 5000, s"grid too small: only $checked urls normalized")
  }
}
