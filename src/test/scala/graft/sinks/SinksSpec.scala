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
}
