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

  test("--output-dir rejects -f json (shards cannot form one valid array)") {
    val a = Main.parse(List("http://h.test/", "--pages", "/p",
      "-f", "json", "--output-dir", "/tmp/d"))
    intercept[IllegalArgumentException](Main.validateFormat(a))
    // jsonl and xml-like stay accepted
    assert(Main.validateFormat(a.copy(format = "jsonl")) == "jsonl")
    assert(Main.validateFormat(a.copy(format = "xml")) == "xml-like")
  }

  test("--output-dir shards carry per-format framing (concat reproduces the single file)") {
    import graft.SparkTestBase
    import graft.corpus.{CorpusGen, CorpusSpec}
    val spark = SparkTestBase.spark
    val spec = CorpusSpec(nHosts = 2, totalPages = 20, seed = 11L)
    val dir = java.nio.file.Files.createTempDirectory("graftmain").toString
    CorpusGen.ensure(spark, dir, spec)
    val urlFile = java.nio.file.Files.createTempFile("urls", ".txt")
    java.nio.file.Files.writeString(urlFile,
      (0 until 6).map(i => CorpusGen.pageUrl(0, i)).mkString("\n"))

    def concatShards(out: String): String = {
      val files = new java.io.File(out).listFiles()
        .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
      files.map(f => java.nio.file.Files.readString(f.toPath)).mkString
    }

    for (fmt <- Seq("xml-like", "jsonl")) {
      val single = java.nio.file.Files.createTempFile("graftout", ".txt").toString
      val sharded = java.nio.file.Files.createTempDirectory("graftshards").toString
      val base = List("--pages", s"$dir/pages.parquet",
        "--url-file", urlFile.toString, "-f", fmt, "--silent")
      Main.run(Main.parse(base ++ List("-o", single)), spark)
      Main.run(Main.parse(base ++ List("--output-dir", sharded)), spark)
      val one = java.nio.file.Files.readString(java.nio.file.Paths.get(single))
      val cat = concatShards(sharded)
      val expected = if (fmt == "xml-like") one + "\n\n" else one
      assert(cat == expected, s"shard framing drift for $fmt")
    }
  }
}
