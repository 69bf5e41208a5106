package graft.sinks

import graft.extract.PageData

/** Byte-exact output formats (S4-S7, F6-F7 in SURVEY.md §2):
  *
  *   - xml-like: fixed template, NO escaping, blocks joined by "\n\n"
  *     (/root/reference/processor.go:117-120, crawler.go:439-448)
  *   - json: Go `json.MarshalIndent(…, "", "  ")` parity incl. Go's HTML
  *     escaping of `<` `>` `&` as </>/&; `[]` when empty
  *     (/root/reference/crawler.go:592-605)
  *   - jsonl: one compact object + "\n" per page
  *     (/root/reference/crawler.go:607-623)
  *
  * Formatting is a pure per-row function: at scale each sink is a
  * `select(format_udf(...))` written with `write.text`, ordered by
  * (depth, seq); the driver-side string variants below exist for golden
  * comparison and small outputs (the reference writes a single file).
  */
object Sinks {

  /** Go encoding/json string escaping: `"` `\` control chars, plus
    * HTML-safe escaping of < > & as < > & (and U+2028/U+2029).
    */
  def goJsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '<'  => sb.append("\\u003c")
        case '>'  => sb.append("\\u003e")
        case '&'  => sb.append("\\u0026")
        case c if c.toInt == 0x2028 => sb.append("\\u2028")
        case c if c.toInt == 0x2029 => sb.append("\\u2029")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** formatPageDataAsXML parity (/root/reference/processor.go:117-120). */
  def pageAsXmlLike(title: String, url: String, markdown: String): String =
    s"<page>\n  <title>$title</title>\n  <url>$url</url>\n  <content>\n$markdown\n  </content>\n</page>"

  def xmlLike(pages: Seq[PageData]): String =
    pages.map(p => pageAsXmlLike(p.title, p.url, p.markdown)).mkString("\n\n")

  /** One compact JSON object per page ({"title","url","content"}). */
  def jsonlLine(title: String, url: String, markdown: String): String =
    s"""{"title":"${goJsonEscape(title)}","url":"${goJsonEscape(url)}","content":"${goJsonEscape(markdown)}"}"""

  def jsonl(pages: Seq[PageData]): String =
    pages.map(p => jsonlLine(p.title, p.url, p.markdown) + "\n").mkString

  /** One MarshalIndent array element (2-space indent), per-row computable. */
  def jsonItem(title: String, url: String, markdown: String): String =
    s"""  {\n    "title": "${goJsonEscape(title)}",\n    "url": "${goJsonEscape(url)}",\n    "content": "${goJsonEscape(markdown)}"\n  }"""

  /** Go json.MarshalIndent(pages, "", "  ") parity; "[]" when empty. */
  def json(pages: Seq[PageData]): String = {
    if (pages.isEmpty) return "[]"
    "[\n" + pages.map(p => jsonItem(p.title, p.url, p.markdown)).mkString(",\n") + "\n]"
  }

  /** Same payload from per-row [[jsonItem]] strings streamed
    * partition-at-a-time (`toLocalIterator`) — items are formatted on
    * executors and never materialize as a collected row array; only the
    * payload string itself (inherent to a one-payload sink) lives on the
    * driver.
    */
  def jsonFromItems(items: Iterator[String]): String = {
    val sb = new StringBuilder
    var first = true
    items.foreach { r =>
      sb.append(if (first) "[\n" else ",\n")
      first = false
      sb.append(r)
    }
    sb.append(if (first) "[]" else "\n]")
    sb.toString
  }
}
