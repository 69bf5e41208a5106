package graft.url

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[UrlNorm.normalizeResolved]] (the link extractor's per-href fast
  * path) against the string formulation it replaced,
  * `normalizeParsed(u.toUrlString)`, as FULL case-class equality of the
  * results — over every (page, href) pair of an adversarial grid biased
  * toward the guard's edge cases: queries/fragments with trailing Go
  * whitespace, opaque refs, scheme-less refs, dot segments, percent junk,
  * non-ASCII, userinfo, ports, empty paths.
  */
class NormalizeResolvedSpec extends AnyFunSuite {

  private val pages = Seq(
    "http://host0.test/",
    "http://host0.test/a/b",
    "https://user:pw@h.test:8080/deep/path?q=1",
    "http://h.test/a%20b/c",
    "http://[::1]:80/x")

  private val hrefs = Seq(
    "", "#", "#frag", "?q", "?q=1", "?q=a b", "?q=a b ", "?q= ",
    "/abs", "/abs/", "rel", "rel/", "./x", "../up", "../../..", "a//b",
    "//other.test/x", "//other.test", "http://x.test/p", "HTTP://X.test/P/",
    "mailto:a@b", "javascript:void(0)", "tel:+1", "data:text/plain,hi",
    "http:/no-host", "x:y", "a:b/c", "%zz", "%2", "%20", "a%20b",
    "sp ace", "sp ace ", " lead", "trail ", "\ttab\t", "q?x=1#f", "#f ",
    "# ", "?", "?#", "a?b#c", "/a/b/../c/./d", "日本語", "/日本語",
    "a#b c ", "?end= ", "...", "..", ".", "a:1", "s:",
    "http://q.test/p?x= ", "HTTPS://UP.test",
    "?q=a\u00A0", "?q=\u2007", "#f\u00A0", "?x=1\u202F", "/p\u00A0q",
    "?a=b\u0085") ++
    (0 until 500).map { i =>
      val rnd = new scala.util.Random(i)
      val alphabet = "abz09/:?#%&=._~!$'()*+,;@[] -\t  é"
      (1 to 1 + rnd.nextInt(20)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }

  test("normalizeResolved ≡ normalizeParsed∘toUrlString over the href grid") {
    var checked = 0
    for (p <- pages; h <- hrefs) {
      GoUrl.parse(p).toOption.foreach { pageUrl =>
        pageUrl.parseRef(h) match {
          case Left(_) =>
          case Right(abs) =>
            val slow = UrlNorm.normalizeParsed(abs.toUrlString)
            val fast = UrlNorm.normalizeResolved(abs)
            assert(fast == slow, s"page='$p' href='${h.map(_.toInt).mkString(",")}'\n fast=$fast\n slow=$slow")
            checked += 1
        }
      }
    }
    assert(checked > 1200, s"grid too small: $checked")
  }
}
