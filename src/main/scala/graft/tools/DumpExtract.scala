package graft.tools

import graft.corpus.{CorpusGen, CorpusSpec}
import graft.extract.Processor

/** Debug tool: print processHTML output for corpus pages.
  * Usage: DumpExtract [sfLabel] [selector] h,i h,i ...
  */
object DumpExtract {
  def main(args: Array[String]): Unit = {
    val spec: CorpusSpec = CorpusGen.specFor(s"/x/${args(0)}")
    val selector = args(1)
    args.drop(2).foreach { hi =>
      val Array(h, i) = hi.split(',').map(_.toInt)
      val url = CorpusGen.pageUrl(h, i)
      val html = CorpusGen.pageHtml(spec, h, i)
      Processor.processHTML(url, html, selector) match {
        case Right(pd) =>
          println(s"=== h=$h i=$i url=$url title=[${pd.title}]")
          println("--- markdown start")
          println(pd.markdown)
          println("--- markdown end")
        case Left(err) =>
          println(s"=== h=$h i=$i ERROR: $err")
      }
    }
  }
}
