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

/** Debug: print articleHtml for corpus pages. */
object DumpArticleHtml {
  def main(args: Array[String]): Unit = {
    val spec = graft.corpus.CorpusGen.specFor(s"/x/${args(0)}")
    args.drop(1).foreach { hi =>
      val Array(h, i) = hi.split(',').map(_.toInt)
      val url = graft.corpus.CorpusGen.pageUrl(h, i)
      val html = graft.corpus.CorpusGen.pageHtml(spec, h, i)
      graft.extract.Processor.processHTML(url, html, "") match {
        case Right(pd) =>
          println(s"=== h=$h i=$i deco=${graft.corpus.CorpusGen.decoOf(spec, h, i)}")
          println(pd.articleHtml)
          println("=== end")
        case Left(e) => println(s"ERR $e")
      }
    }
  }
}

/** Debug: find one non-empty page per decoration variant and dump articleHtml. */
object DumpAllDecos {
  def main(args: Array[String]): Unit = {
    val spec = graft.corpus.CorpusGen.specFor("/x/sf0.001")
    val picked = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h)
         if !graft.corpus.CorpusGen.isEmptyPage(spec, h, i)) {
      val d = graft.corpus.CorpusGen.decoOf(spec, h, i)
      if (!picked.contains(d) && i % 5 != 1) picked(d) = (h, i) // no-table pages first
    }
    picked.toSeq.sortBy(_._1).foreach { case (d, (h, i)) =>
      val url = graft.corpus.CorpusGen.pageUrl(h, i)
      val html = graft.corpus.CorpusGen.pageHtml(spec, h, i)
      val pd = graft.extract.Processor.processHTML(url, html, "").toOption.get
      println(s"@@@DECO $d h=$h i=$i")
      println(pd.articleHtml)
      println("@@@END")
    }
    // and one table page
    val ti = (0 until spec.hostSizes(0)).find(i => i % 5 == 1 &&
      !graft.corpus.CorpusGen.isEmptyPage(spec, 0, i)).get
    val pd = graft.extract.Processor.processHTML(
      graft.corpus.CorpusGen.pageUrl(0, ti), graft.corpus.CorpusGen.pageHtml(spec, 0, ti), "").toOption.get
    println(s"@@@TABLE deco=${graft.corpus.CorpusGen.decoOf(spec, 0, ti)} i=$ti")
    println(pd.articleHtml)
    println("@@@END")
  }
}
