package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.html.{HDocument, HElement, HText, HtmlParser}

/** Pins [[Readability.normLenCommas]] against the string formulation it
  * replaced in the scoring and conditional-clean gates:
  *
  *   val t = innerTextNorm(e)            // normSpace(e.text): collapse+trim
  *   (t.length, t.split(",").length - 1)
  *
  * The adversarial generator is biased toward the corner cases: commas
  * (runs, trailing runs, all-comma strings), the Java \s set, and non-\s
  * control chars <= 0x20 that String.trim strips from the ends (the cascade
  * through collapse-emitted spaces). A generated-corpus sweep checks every
  * element of real pages too.
  */
class NormLenCommasSpec extends AnyFunSuite {

  private def reference(e: HElement): (Int, Int) = {
    val t = Readability.innerTextNorm(e)
    (t.length, t.split(",").length - 1)
  }

  private def fused(e: HElement): (Int, Int) = {
    val packed = Readability.normLenCommas(e)
    (Readability.packedLen(packed), Readability.packedCommaSegs(packed))
  }

  private def leafElem(text: String): HElement = {
    val e = new HElement("p")
    e.appendChild(new HText(text))
    e
  }

  /** Split the text parts into a small tree so element boundaries land
    * inside whitespace/comma runs (the walk's state must carry across text
    * nodes).
    */
  private def treeOf(parts: List[String]): HElement = {
    val root = new HElement("div")
    var cur = root
    parts.zipWithIndex.foreach { case (p, i) =>
      if (i % 3 == 2) {
        val child = new HElement("span")
        cur.appendChild(child)
        cur = child
      }
      cur.appendChild(new HText(p))
    }
    root
  }

  private val trickyText: Gen[String] = {
    val ch = Gen.frequency(
      6 -> Gen.const(','), 4 -> Gen.const(' '), 2 -> Gen.const('\t'),
      2 -> Gen.const('\n'), 2 -> Gen.const('\u0001'), 1 -> Gen.const('\u0000'),
      1 -> Gen.const('\u001f'), 1 -> Gen.const('\u0007'), 1 -> Gen.const('\r'),
      1 -> Gen.const('\f'), 1 -> Gen.const('\u000b'), 6 -> Gen.alphaChar)
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, ch)).map(_.mkString)
  }

  test("normLenCommas ≡ string formulation on adversarial single-text elements") {
    val prop: Prop = forAll(trickyText) { s =>
      val e = leafElem(s)
      val ok = fused(e) == reference(e)
      if (!ok) println(s"COUNTEREXAMPLE codepoints=${s.map(_.toInt).mkString(",")}")
      ok
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(3000)
      .withInitialSeed(org.scalacheck.rng.Seed(13L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("normLenCommas ≡ string formulation on multi-node trees") {
    val gen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, trickyText))
    val prop: Prop = forAll(gen) { parts =>
      val e = treeOf(parts)
      val ok = fused(e) == reference(e)
      if (!ok) println(
        s"COUNTEREXAMPLE parts=${parts.map(_.map(_.toInt).mkString("·")).mkString("|")}")
      ok
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(2000)
      .withInitialSeed(org.scalacheck.rng.Seed(17L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("normLenCommas ≡ string formulation on hand-picked edges") {
    val cases = Seq(
      "", ",", ",,", ",,,", "a,", "a,,", ",a", ",a,", "a,b", "a,,b",
      ", ,", " , ", ",\u0001", "\u0001,", "\u0001a\u0001", "a \u0001",
      "x,,\u0001", "x,\u0001,y", "x, y", ",\u0001,", " \u0001 ",
      "\u0000", "a\u0000b", ",  ,,  ", "abc, def, ghi", "a  ,  b",
      "\u0001 , \u0001", ", \u0001", "words, and, more, commas,")
    cases.foreach { s =>
      val e = leafElem(s)
      assert(fused(e) == reference(e), s"input=${s.map(_.toInt).mkString(",")}")
    }
  }

  test("normLenCommas ≡ string formulation over every element of generated corpus pages") {
    val spec = graft.corpus.CorpusSpec(nHosts = 3, totalPages = 60, seed = 11L)
    for (h <- 0 until 3; i <- 0 until 20) {
      val html = graft.corpus.CorpusGen.pageHtml(spec, h, i)
      val doc: HDocument = HtmlParser.parse(html)
      (Iterator(doc.root) ++ doc.root.descendants).foreach { e =>
        assert(fused(e) == reference(e), s"page h$h-$i tag=${e.tag}")
      }
    }
  }
}
