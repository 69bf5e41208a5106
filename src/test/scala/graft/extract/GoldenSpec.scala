package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.GoldenFixtures

/** Byte-exact extraction goldens (FIXTURES.md §5): every fixture page's
  * (title, markdown, article_html) must equal the pinned TSV exactly —
  * the per-row invariant from BASELINE.json (`byte-identical extracted text
  * per url`), enforced at `sbt -batch test` time.
  */
class GoldenSpec extends AnyFunSuite {

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'  => sb.append('\n'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case c    => sb.append(c); i += 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private val goldens: Map[String, (String, String, String)] = {
    val in = getClass.getResourceAsStream("/golden/extract_goldens.tsv")
    assert(in != null, "golden TSV missing — run: sbt 'runMain graft.tools.GenGoldens'")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val cols = line.split("\t", -1)
      cols(0) -> ((unesc(cols(3)), unesc(cols(4)), unesc(cols(5))))
    }.toMap
    finally src.close()
  }

  for ((name, url, html, sel) <- GoldenFixtures.cases) {
    test(s"golden: $name") {
      val (wantTitle, wantMd, wantArticle) = goldens(name)
      val pd = Processor.processHTML(url, html, sel).toOption.get
      assert(pd.title == wantTitle, "title drift")
      assert(pd.markdown == wantMd, "markdown drift")
      assert(pd.articleHtml == wantArticle, "article_html drift")
    }
  }
}
