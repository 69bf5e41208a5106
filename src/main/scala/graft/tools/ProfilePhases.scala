package graft.tools

import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import org.apache.spark.sql.SparkSession

import graft.extract.{Markdown, Processor, Readability}
import graft.html.HtmlParser
import graft.url.GoUrl

/** Phase-level microbenchmark of the list-mode extraction kernel (guide §1:
  * measure first): separately times parse, pre-filter+serialize, readability
  * and markdown over real corpus pages, single-thread (cleanest signal on a
  * noisy shared host). Distinguishes which phase of processParsed the next
  * optimization should target.
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val repeats = sys.env.get("SPARK_GRAFT_MICRO_REPEAT").map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = graft.corpus.CorpusGen.ensureFor(spark, sfDir)
    val pages = graft.corpus.CorpusGen.pages(spark, dir)
      .select($"url", $"html").as[(String, Array[Byte])]
      .limit(4000).collect()
    spark.stop()
    println(s"pages: ${pages.length}, repeats: $repeats")

    val htmls = pages.map { case (u, b) => (u, new String(b, StandardCharsets.UTF_8)) }

    // SPARK_GRAFT_PHASES=substr limits which benches run (JFR isolation)
    val only = sys.env.get("SPARK_GRAFT_PHASES")

    def bench(label: String)(body: (String, String) => Long): Unit = {
      if (only.exists(f => !label.contains(f))) return
      // warmup
      htmls.take(1000).foreach { case (u, h) => body(u, h) }
      var best = Double.MaxValue
      (1 to repeats).foreach { _ =>
        val t0 = System.nanoTime()
        var acc = 0L
        htmls.foreach { case (u, h) => acc += body(u, h) }
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
        if (acc == Long.MinValue) println("?") // keep acc live
      }
      println(f"$label%-34s ${best * 1e6 / htmls.length}%8.1f us/page  (${htmls.length / best}%.0f pages/s)")
    }

    bench("parse")((u, h) => HtmlParser.parse(h).root.children.length.toLong)
    bench("parse+prefilter")((u, h) => {
      val doc = HtmlParser.parse(h)
      val removed = doc.removeTags(Set("script", "style", "link", "img", "video"))
      if (removed > 0) doc.mergeAdjacentText()
      removed.toLong
    })
    bench("parse+prefilter+outerHtml")((u, h) => {
      val doc = HtmlParser.parse(h)
      val removed = doc.removeTags(Set("script", "style", "link", "img", "video"))
      if (removed > 0) doc.mergeAdjacentText()
      doc.outerHtml.length.toLong
    })
    bench("full processParsed (crawl path)")((u, h) => {
      val doc = HtmlParser.parse(h)
      Processor.processParsed(u, h, doc, "", needArticleHtml = false)
        .fold(_ => 0L, _.markdown.length.toLong)
    })
    bench("readability only (pre-parsed)")((u, h) => {
      val doc = HtmlParser.parse(h)
      val removed = doc.removeTags(Set("script", "style", "link", "img", "video"))
      if (removed > 0) doc.mergeAdjacentText()
      val modified = doc.outerHtml
      val pu = GoUrl.parse(u).toOption.get
      val (_, resultEl) = Readability.parseToDom(modified, pu, doc, needContent = false)
      if (resultEl != null) 1L else 0L
    })
    bench("readability+markdown (pre-parsed)")((u, h) => {
      val doc = HtmlParser.parse(h)
      val removed = doc.removeTags(Set("script", "style", "link", "img", "video"))
      if (removed > 0) doc.mergeAdjacentText()
      val modified = doc.outerHtml
      val pu = GoUrl.parse(u).toOption.get
      val (a, resultEl) = Readability.parseToDom(modified, pu, doc, needContent = false)
      val md = (if (resultEl != null) Markdown.convertElement(resultEl)
                else Markdown.convert(a.content)).trim
      md.length.toLong
    })
  }
}
