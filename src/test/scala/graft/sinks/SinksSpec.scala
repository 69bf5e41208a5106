package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.PageData

/** Output-format goldens pinned verbatim from the reference:
  * xml-like /root/reference/processor_test.go:247-302,
  * json     /root/reference/crawler_test.go:211-302,
  * jsonl    /root/reference/crawler_test.go:152-209.
  */
class SinksSpec extends AnyFunSuite {
  private def pd(t: String, u: String, m: String) = PageData(t, u, m, "", "")

  // ---- xml-like ----
  test("xml simple page") {
    assert(Sinks.pageAsXmlLike("Test Title", "http://example.com/test", "## Hello\nThis is content.") ==
      "<page>\n  <title>Test Title</title>\n  <url>http://example.com/test</url>\n  <content>\n## Hello\nThis is content.\n  </content>\n</page>")
  }
  test("xml empty content") {
    assert(Sinks.pageAsXmlLike("Empty Content Page", "http://example.com/empty", "") ==
      "<page>\n  <title>Empty Content Page</title>\n  <url>http://example.com/empty</url>\n  <content>\n\n  </content>\n</page>")
  }
  test("xml empty title") {
    assert(Sinks.pageAsXmlLike("", "http://example.com/no-title", "Some markdown.") ==
      "<page>\n  <title></title>\n  <url>http://example.com/no-title</url>\n  <content>\nSome markdown.\n  </content>\n</page>")
  }
  test("xml special chars unescaped") {
    assert(Sinks.pageAsXmlLike("Special Chars < > &", "http://example.com/special",
      "Text with <, >, &, ' and \" should appear as is.") ==
      "<page>\n  <title>Special Chars < > &</title>\n  <url>http://example.com/special</url>\n  <content>\nText with <, >, &, ' and \" should appear as is.\n  </content>\n</page>")
  }

  // ---- jsonl ----
  test("jsonl empty results") {
    assert(Sinks.jsonl(Nil) == "")
  }
  test("jsonl single page") {
    assert(Sinks.jsonl(Seq(pd("Page 1", "http://example.com/1", "Content 1"))) ==
      "{\"title\":\"Page 1\",\"url\":\"http://example.com/1\",\"content\":\"Content 1\"}\n")
  }
  test("jsonl multiple pages") {
    assert(Sinks.jsonl(Seq(
      pd("Page A", "http://example.com/a", "Content A"),
      pd("Page B", "http://example.com/b", "## Content B\nWith newlines."))) ==
      "{\"title\":\"Page A\",\"url\":\"http://example.com/a\",\"content\":\"Content A\"}\n" +
        "{\"title\":\"Page B\",\"url\":\"http://example.com/b\",\"content\":\"## Content B\\nWith newlines.\"}\n")
  }
  test("jsonl special characters use Go HTML escaping") {
    assert(Sinks.jsonl(Seq(pd("Special \"Chars\" Page", "http://example.com/special", "Content with <>&'\""))) ==
      "{\"title\":\"Special \\\"Chars\\\" Page\",\"url\":\"http://example.com/special\",\"content\":\"Content with \\u003c\\u003e\\u0026'\\\"\"}\n")
  }

  // ---- json ----
  test("json empty results") {
    assert(Sinks.json(Nil) == "[]")
  }
  test("json single page") {
    assert(Sinks.json(Seq(pd("Page 1", "http://example.com/1", "Content 1"))) ==
      "[\n  {\n    \"title\": \"Page 1\",\n    \"url\": \"http://example.com/1\",\n    \"content\": \"Content 1\"\n  }\n]")
  }
  test("json multiple pages") {
    assert(Sinks.json(Seq(
      pd("Page A", "http://example.com/a", "Content A"),
      pd("Page B", "http://example.com/b", "## Content B\nWith newlines."))) ==
      "[\n  {\n    \"title\": \"Page A\",\n    \"url\": \"http://example.com/a\",\n    \"content\": \"Content A\"\n  },\n" +
        "  {\n    \"title\": \"Page B\",\n    \"url\": \"http://example.com/b\",\n    \"content\": \"## Content B\\nWith newlines.\"\n  }\n]")
  }
  test("json special characters") {
    assert(Sinks.json(Seq(pd("Special \"Chars\" Page", "http://example.com/special", "Content with <>&'\""))) ==
      "[\n  {\n    \"title\": \"Special \\\"Chars\\\" Page\",\n    \"url\": \"http://example.com/special\",\n    \"content\": \"Content with \\u003c\\u003e\\u0026'\\\"\"\n  }\n]")
  }
  test("json empty title and content") {
    assert(Sinks.json(Seq(pd("", "http://example.com/empty", ""))) ==
      "[\n  {\n    \"title\": \"\",\n    \"url\": \"http://example.com/empty\",\n    \"content\": \"\"\n  }\n]")
  }

  test("warc records: CRLF framing, exact Content-Length, re-derivable digest") {
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val dir = graft.corpus.CorpusGen.ensureFor(spark, sf)
    val pages = graft.corpus.CorpusGen.pages(spark, dir)
      .select("url", "html").limit(50).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val recs = graft.sinks.Warc.warcRecords(spark, sf).limit(50).collect()
    assert(recs.nonEmpty)
    recs.foreach { r =>
      val url = r.getString(0)
      val rec = r.getString(1)
      assert(rec.startsWith("WARC/1.0\r\n"))
      assert(rec.endsWith("\r\n\r\n"))
      val sep = rec.indexOf("\r\n\r\n")
      val headers = rec.substring(0, sep).split("\r\n").map { l =>
        val i = l.indexOf(": "); if (i < 0) (l, "") else (l.substring(0, i), l.substring(i + 2))
      }.toMap
      val payload = rec.substring(sep + 4, rec.length - 4)
      pages.get(url).foreach { html =>
        assert(payload == new String(html, java.nio.charset.StandardCharsets.UTF_8))
        assert(headers("Content-Length").toLong == html.length.toLong)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val hex = graft.pipeline.TextAnalysis.hexOf(md.digest(html))
        assert(headers("WARC-Block-Digest") == s"sha256:$hex")
      }
      assert(headers("WARC-Target-URI") == url)
      assert(headers("WARC-Type") == "response")
      assert(headers("WARC-Record-ID").matches("<urn:uuid:[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}>"))
      assert(headers("WARC-Date").matches("\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}Z"))
    }
  }

  test("cdx index: surt keys reverse host labels and sort host-contiguously") {
    val spark = graft.SparkTestBase.spark
    val rows = graft.sinks.Warc.cdxIndex(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val surt = r.getString(0)
      val url = r.getString(2)
      val host = url.replaceFirst("^https?://", "").takeWhile(_ != '/')
      val path = url.replaceFirst("^https?://[^/]+", "")
      assert(surt == host.split("\\.").reverse.mkString(",") + ")" + path, s"$url -> $surt")
      assert(r.getString(1).matches("\\d{14}"))
      assert(r.getString(3).matches("[0-9a-f]{64}"))
      assert(r.getLong(4) > 0L)
    }
    // a host's captures are one contiguous run of the sorted key space
    val sorted = rows.map(_.getString(0)).sorted
    val firstHostPrefix = "test,host0)"
    val run = sorted.dropWhile(!_.startsWith(firstHostPrefix)).takeWhile(_.startsWith(firstHostPrefix))
    assert(run.length == rows.count(_.getString(2).startsWith("http://host0.test/")))
  }
}
