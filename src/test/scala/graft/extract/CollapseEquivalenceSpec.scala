package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Pins the hand-rolled [[Markdown.collapse]] against the regex
  * formulation it replaced: `(?m)^[ \t]+$` → "" then `\n{3,}` → "\n\n".
  * The generator is biased toward the characters that exercise the Java
  * MULTILINE corner cases (all five line-terminator kinds, tabs/spaces,
  * runs of newlines).
  */
class CollapseEquivalenceSpec extends AnyFunSuite {

  private val WsOnlyLine = java.util.regex.Pattern.compile("(?m)^[ \\t]+$")
  private val NewlineRun3 = java.util.regex.Pattern.compile("\\n{3,}")

  private def reference(s: String): String =
    NewlineRun3.matcher(WsOnlyLine.matcher(s).replaceAll("")).replaceAll("\n\n")

  private val tricky: Gen[String] = {
    val ch = Gen.frequency(
      6 -> Gen.const('\n'), 3 -> Gen.const(' '), 2 -> Gen.const('\t'),
      2 -> Gen.const('\r'), 1 -> Gen.const('\u0085'), 1 -> Gen.const('\u2028'),
      1 -> Gen.const('\u2029'), 6 -> Gen.alphaChar)
    Gen.listOf(ch).map(_.mkString)
  }

  test("collapse ≡ regex formulation on adversarial strings") {
    val prop: Prop = forAll(tricky) { s =>
      val ok = Markdown.collapse(s) == reference(s)
      if (!ok) println(s"COUNTEREXAMPLE codepoints=${s.map(_.toInt).mkString(",")}")
      ok
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(2000)
      .withInitialSeed(org.scalacheck.rng.Seed(7L)) // deterministic in CI
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("collapse ≡ regex formulation on hand-picked edges") {
    val cases = Seq(
      "", "\n", "\n\n", "\n\n\n", "\n\n\n\n\n", " ", " \t ", "a\n \nb",
      "a\n \n\nb", "a\r\n  \r\nb", "a\r\n\r\n\r\nb", " \nx", "x\n ",
      "\t", "a   b", "\r\r\r", "a\n\t\n\n\n\nb", "  a  \n   \n b",
      "\n \n \n \n", "x\r\ny", "\r\n", "a\rb\nc", "> q\n   \n> r")
    cases.foreach(s => assert(Markdown.collapse(s) == reference(s),
      s"input=${s.map(_.toInt).mkString(",")}"))
  }
}
