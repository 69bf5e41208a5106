package graft.html

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Pins the tokenizer's interned-name fast path and the serializer's
  * string-switch membership predicates against the formulations they
  * replaced:
  *  - Names.lowerName(src, start, end) ≡ src.substring(start, end).toLowerCase
  *    for every known name in every case mixture, names embedded mid-string,
  *    and unknown/non-ASCII fuzz (the fallback IS that expression, so the
  *    property proves the fast path agrees with it).
  *  - HtmlSerializer.isVoid/isRawText ≡ the documented element sets.
  */
class NamesSpec extends AnyFunSuite {

  private def ref(src: String, start: Int, end: Int): String =
    src.substring(start, end).toLowerCase

  test("lowerName ≡ substring+toLowerCase for every known name, all case mixtures") {
    for (name <- Names.knownNames) {
      val variants = Seq(
        name, name.toUpperCase,
        name.zipWithIndex.map { case (c, i) => if (i % 2 == 0) c.toUpper else c }.mkString,
        name.capitalize)
      for (v <- variants) {
        // bare
        assert(Names.lowerName(v, 0, v.length) == ref(v, 0, v.length), s"bare $v")
        // embedded mid-string (exercises the region offsets)
        val embedded = s"<x $v=1>"
        assert(Names.lowerName(embedded, 3, 3 + v.length) ==
          ref(embedded, 3, 3 + v.length), s"embedded $v")
      }
      // interning: the all-lowercase form must return a canonical instance
      assert(Names.lowerName(name, 0, name.length) eq
        Names.lowerName(name.toUpperCase, 0, name.length))
    }
  }

  test("lowerName ≡ substring+toLowerCase on fuzz (unknown, non-ASCII, empty)") {
    val gen: Gen[String] = {
      val ch = Gen.frequency(
        8 -> Gen.alphaChar, 2 -> Gen.numChar, 1 -> Gen.const('-'),
        1 -> Gen.const('_'), 1 -> Gen.oneOf('é', 'Ü', 'ß', 'İ', ' '))
      Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, ch)).map(_.mkString)
    }
    val prop: Prop = forAll(gen) { s =>
      Names.lowerName(s, 0, s.length) == ref(s, 0, s.length)
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(2000)
      .withInitialSeed(org.scalacheck.rng.Seed(11L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("isVoid / isRawText ≡ the element sets") {
    val universe = Names.knownNames.toSet ++ HtmlSerializer.voidElements ++
      HtmlSerializer.rawTextElements ++ Set("", "x", "unknown", "BR", "Br", "br ")
    for (t <- universe) {
      assert(HtmlSerializer.isVoid(t) == HtmlSerializer.voidElements.contains(t), s"isVoid($t)")
      assert(HtmlSerializer.isRawText(t) == HtmlSerializer.rawTextElements.contains(t), s"isRawText($t)")
    }
  }
}
