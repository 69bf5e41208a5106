package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The 5 extraction-pipeline cases from
  * /root/reference/processor_test.go:8-225 (TestProcessHTML), asserting the
  * same contains/structural properties the reference asserts.
  */
class ProcessorSpec extends AnyFunSuite {

  private val commonStyle = "<style>body { font-family: sans-serif; }</style>"
  private val commonScript = "<script>console.log('test');</script>"
  private val commonNav = "<nav><a href='/home'>Home</a></nav>"
  private val commonFooter = "<footer><p>&copy; 2025 Test Inc.</p></footer>"
  private val commonImg = "<img src='test.jpg' alt='Test Image'>"
  private val commonVideo = "<video><source src='test.mp4' type='video/mp4'></video>"
  private val commonLink = "<link rel='stylesheet' href='style.css'>"

  private def stripTags(html: String): String = {
    val sb = new StringBuilder
    var inTag = false
    html.foreach {
      case '<'            => inTag = true
      case '>'            => inTag = false
      case c if !inTag    => sb.append(c)
      case _              =>
    }
    sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  test("Simple content, no selector (pre-filtering applies)") {
    val rawHTML = s"<html><head><title>Simple Page</title>$commonStyle$commonScript$commonLink</head><body>" +
      commonNav + commonImg + commonVideo +
      "<h1>Main Title</h1><p>This is simple content.</p>" +
      commonFooter + "</body></html>"
    val pd = Processor.processHTML("http://example.com/simple", rawHTML, "").toOption.get
    assert(pd.rawHtml == rawHTML, "RawHTML must be the unmodified original")
    assert(pd.title.contains("Simple Page"))
    assert(pd.markdown.contains("Main Title"))
    val ah = pd.articleHtml
    assert(!ah.contains("<script"))
    assert(!ah.contains("<style"))
    assert(!ah.contains("<img src='test.jpg'"))
    assert(!ah.contains("<video"))
    assert(!ah.contains("<link rel='stylesheet'"))
    assert(ah.contains("Main Title"))
    // go-readability makes the main title H2
    assert(ah.contains("<h2>") || ah.contains("<h1>"))
    assert(ah.contains("<p>"))
    assert(stripTags(ah).contains("Main Title"))
    assert(stripTags(ah).contains("This is simple content."))
  }

  test("With content selector, selector matches") {
    val rawHTML = s"""<html><head><title>Selector Test</title></head><body>
                <div class="ignored">Ignored text. $commonScript</div>
                <article class="main-content">
                    <h2>Article Title</h2>
                    <p>Selected content here. <img src="inline.jpg" alt="Inline"></p>
                </article>
                <div class="ignored-after">More ignored text.</div>
            </body></html>"""
    val pd = Processor.processHTML("http://example.com/selector", rawHTML, ".main-content").toOption.get
    assert(pd.rawHtml == rawHTML)
    // a snippet has no <title>; readability yields no title
    assert(pd.title == "")
    assert(pd.markdown.contains("Article Title"))
    val ah = pd.articleHtml
    assert(!ah.contains("Ignored text"))
    assert(ah.contains("src=\"http://example.com/inline.jpg\""))
    assert(ah.contains("Article Title"))
    assert(stripTags(ah).contains("Article Title Selected content here."))
  }

  test("With content selector, selector does NOT match (fallback, no pre-filter)") {
    val rawHTML = s"""<html><head><title>Selector Miss</title>$commonScript</head><body>
                <div class="actual-content">
                    <h1>Page Header</h1>
                    <p>Some text. <img src="important.jpg"></p>
                </div>
            </body></html>"""
    val pd = Processor.processHTML("http://example.com/selector-miss", rawHTML, ".non-existent-selector").toOption.get
    assert(pd.title.contains("Selector Miss"))
    assert(pd.markdown.contains("Page Header"))
    val ah = pd.articleHtml
    // no pre-filter on selector miss: readability keeps + resolves the img
    assert(ah.contains("src=\"http://example.com/important.jpg\""))
    assert(ah.contains("Page Header"))
    assert(stripTags(ah).contains("Page Header Some text."))
  }

  test("Readability with empty rawHTML") {
    val pd = Processor.processHTML("http://example.com/fail", "", "").toOption.get
    assert(pd.title == "")
    assert(pd.markdown.trim == "")
  }

  test("Content that results in some markdown after readability (nav link)") {
    val rawHTML = s"<html><head><title>Emptyish</title></head><body>$commonNav$commonFooter</body></html>"
    val pd = Processor.processHTML("http://example.com/emptyish", rawHTML, "").toOption.get
    assert(pd.title.contains("Emptyish"))
    assert(pd.markdown.contains("[Home](http://example.com/home)"))
    assert(pd.articleHtml.contains("<a href=\"http://example.com/home\">Home</a>"))
  }
}
