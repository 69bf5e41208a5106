package graft.tools

import graft.extract.Processor

/** Debug tool: print processHTML output for named golden fixtures. */
object DumpFixture {
  def main(args: Array[String]): Unit = {
    val byName = GoldenFixtures.cases.map { case (n, u, h, s) => n -> ((u, h, s)) }.toMap
    args.foreach { name =>
      val (url, html, sel) = byName(name)
      Processor.processHTML(url, html, sel) match {
        case Right(pd) =>
          println(s"=== $name title=[${pd.title}]")
          println(pd.markdown)
          println(s"=== end $name")
        case Left(err) => println(s"=== $name ERROR: $err")
      }
    }
  }
}
