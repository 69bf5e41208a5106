package graft.app

import org.scalatest.funsuite.AnyFunSuite

/** CLI flag semantics mirror /root/reference/cmd/scrape.go:52-66. */
class MainSpec extends AnyFunSuite {

  test("parse: seed url + repeated match/follow flags") {
    val a = Main.parse(List("http://h.test/", "--pages", "/p",
      "--match", "/a/**", "--match", "/b/*", "--follow-match", "/c/**",
      "--limit", "5", "--format", "jsonl"))
    assert(a.seed == "http://h.test/")
    assert(a.pages == "/p")
    assert(a.matches == Vector("/a/**", "/b/*"))
    assert(a.follows == Vector("/c/**"))
    assert(a.limit == 5)
    assert(a.format == "jsonl")
  }

  test("parse: url-file mode + scale flags") {
    val a = Main.parse(List("--pages", "/p", "--url-file", "/tmp/urls.txt",
      "--host-budget", "10", "--robots", "--checkpoint", "/tmp/ck", "--resume"))
    assert(a.urlFile == "/tmp/urls.txt")
    assert(a.seed.isEmpty)
    assert(a.hostBudget == 10)
    assert(a.robots && a.resume)
    assert(a.checkpoint == "/tmp/ck")
  }

  test("parse: unknown flag rejected") {
    intercept[IllegalArgumentException](Main.parse(List("--bogus", "x")))
  }

  test("parse: reference flag names and short forms (scrape.go:56-66, root.go:67-70)") {
    val a = Main.parse(List("http://h.test/", "--pages", "/p",
      "-m", "/a/**", "-o", "/tmp/out.txt", "-f", "xml-like", "--silent"))
    assert(a.matches == Vector("/a/**"))
    assert(a.outfile == "/tmp/out.txt")
    assert(a.format == "xml-like")
    assert(a.silent)
    val b = Main.parse(List("--version"))
    assert(b.version)
    val c = Main.parse(List("http://h.test/", "--pages", "/p",
      "--outfile", "f1", "--output-format", "jsonl", "--output-dir", "/tmp/d"))
    assert(c.outfile == "f1" && c.format == "jsonl" && c.outputDir == "/tmp/d")
  }

  test("streamOut framing is byte-identical to the batch sinks") {
    import graft.extract.PageData
    import graft.sinks.Sinks
    val pages = Seq(
      PageData("T1", "http://h/a", "m1\nline2 with \"quotes\" & <tags>", "", ""),
      PageData("T2", "http://h/b", "m2", "", ""))
    def rows(fmt: String) = pages.map(p => fmt match {
      case "json"  => Sinks.jsonItem(p.title, p.url, p.markdown)
      case "jsonl" => Sinks.jsonlLine(p.title, p.url, p.markdown)
      case _       => Sinks.pageAsXmlLike(p.title, p.url, p.markdown)
    })
    for (fmt <- Seq("xml-like", "json", "jsonl")) {
      val bos = new java.io.ByteArrayOutputStream()
      Main.streamOut(rows(fmt).iterator, fmt, bos)
      val expected = fmt match {
        case "json"  => Sinks.json(pages)
        case "jsonl" => Sinks.jsonl(pages)
        case _       => Sinks.xmlLike(pages)
      }
      assert(bos.toString("UTF-8") == expected, s"format $fmt")
    }
    val bos = new java.io.ByteArrayOutputStream()
    Main.streamOut(Iterator.empty, "json", bos)
    assert(bos.toString("UTF-8") == "[]")
  }
}
