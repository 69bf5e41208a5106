package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.html.{HElement, HText, HtmlParser}

/** Pins the fused [[Readability.linkDensity]] walk against the two-walk
  * formulation it replaced, with EXACT Double equality (the fused walk must
  * keep the floating-point accumulation order: per-a contributions in entry
  * order):
  *
  *   textLen = normTextLen(e); if 0 → 0
  *   linkLen = Σ over a in (e if a) ++ descendants-a of normTextLen(a) * coeff
  *   coeff   = 0.3 if href startsWith "#" else 1.0
  *
  * Covers the link-free fast path, whitespace boundaries between element
  * edges, '#' anchors, as with no href, and generated corpus pages.
  */
class LinkDensitySpec extends AnyFunSuite {

  private def reference(e: HElement): Double = {
    val textLen = Readability.normTextLen(e)
    if (textLen == 0) return 0
    var linkLen = 0.0
    def addA(a: HElement): Unit = {
      val href = a.attrOrNull("href")
      val coeff = if (href != null && href.startsWith("#")) 0.3 else 1.0
      linkLen += Readability.normTextLen(a) * coeff
    }
    if (e.tag == "a") addA(e)
    e.foreachElement(el => if (el.tag == "a") addA(el))
    linkLen / textLen
  }

  private def assertSame(e: HElement, label: String): Unit = {
    val got = Readability.linkDensity(e)
    val want = reference(e)
    // exact bit equality — the fused walk preserves the FP sum order
    assert(java.lang.Double.doubleToRawLongBits(got) ==
      java.lang.Double.doubleToRawLongBits(want),
      s"$label: got $got want $want")
  }

  test("linkDensity ≡ two-walk formulation on hand-built trees") {
    val cases = Seq(
      "<div>no links at all</div>",
      "<div>  </div>",
      "<div><a href='u'>link</a></div>",
      "<div>text <a href='u'>link</a> more</div>",
      "<div>text <a href='#frag'>anchor</a> more</div>",
      "<div><a>no href</a> rest</div>",
      "<div><a href='u'>  ws only  </a>solid</div>",
      "<div><a href='u'> lead</a><a href='#x'>tail </a></div>",
      "<div><span><a href='u'>deep <b>bold</b></a></span> out</div>",
      "<div><a href='u'></a>empty link</div>",
      "<a href='u'>root is the link</a>",
      "<a href='#f'>root anchor <a href='u'>inner-ish</a></a>",
      "<div><ul><li><a href='1'>one</a></li><li><a href='#2'>two</a></li><li><a href='3'>three</a></li></ul></div>")
    cases.zipWithIndex.foreach { case (html, i) =>
      val doc = HtmlParser.parse(html)
      // check density on body AND every descendant element
      val body = doc.body.get
      assertSame(body, s"case[$i] body")
      body.foreachElement(e => assertSame(e, s"case[$i] ${e.tag}"))
    }
  }

  test("linkDensity ≡ two-walk formulation on generated link trees") {
    val word: Gen[String] = Gen.frequency(
      5 -> Gen.alphaStr.map(_.take(6)), 2 -> Gen.const(" "), 1 -> Gen.const("  x "),
      1 -> Gen.const("\n\t"))
    def nodeGen(depth: Int): Gen[HElement] =
      for {
        tag <- Gen.frequency(4 -> Gen.const("div"), 3 -> Gen.const("a"),
          2 -> Gen.const("span"), 1 -> Gen.const("p"))
        href <- Gen.option(Gen.oneOf("u", "#f", "", "#"))
        nKids <- Gen.chooseNum(0, if (depth >= 3) 0 else 4)
        kids <- Gen.listOfN(nKids, Gen.frequency(
          3 -> word.map(w => Left(w)),
          2 -> nodeGen(depth + 1).map(e => Right(e))))
      } yield {
        val e = new HElement(tag)
        if (tag == "a") href.foreach(h => e.setAttr("href", h))
        kids.foreach {
          case Left(w)  => e.appendChild(new HText(w))
          case Right(c) => e.appendChild(c)
        }
        e
      }
    val prop: Prop = forAll(nodeGen(0)) { e =>
      val got = Readability.linkDensity(e)
      val want = reference(e)
      java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(want)
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(2000)
      .withInitialSeed(org.scalacheck.rng.Seed(19L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("linkDensity ≡ two-walk formulation over generated corpus pages") {
    val spec = graft.corpus.CorpusSpec(nHosts = 3, totalPages = 45, seed = 23L)
    for (h <- 0 until 3; i <- 0 until 15) {
      val doc = HtmlParser.parse(graft.corpus.CorpusGen.pageHtml(spec, h, i))
      val body = doc.body.get
      assertSame(body, s"page h$h-$i body")
      body.foreachElement(e => assertSame(e, s"page h$h-$i ${e.tag}"))
    }
  }
}
