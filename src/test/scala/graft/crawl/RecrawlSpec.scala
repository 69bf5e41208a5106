package graft.crawl

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Behavioral contract of the incremental recrawl: the kernel touches ONLY
  * delta rows (unchanged urls keep their prior extraction verbatim — proved
  * with a sentinel the extractor could never produce), new urls appear,
  * retired urls drop. The corpus-scale end-to-end (changed pages come back
  * with the donor page's ground-truth markdown) is the driver row
  * `crawl_recrawl_delta`.
  */
class RecrawlSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def html(body: String): Array[Byte] =
    s"""<html><head><title>T</title></head><body>
       |<article><p>$body content long enough to extract as the article
       |body of this synthetic page with several words.</p></article>
       |</body></html>""".stripMargin
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("old-side snapshot scan is pruned to (url, warc_ts) — html never read") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graftrecrawl").toString
    val t1 = new Timestamp(1700000000000L)
    Seq(("http://h.test/a", t1, html("alpha")))
      .toDF("url", "warc_ts", "html").write.parquet(s"$tmp/old")
    Seq(("http://h.test/a", t1, html("alpha")))
      .toDF("url", "warc_ts", "html").write.parquet(s"$tmp/new")
    Seq(("http://h.test/a", "m")).toDF("url", "markdown").write.parquet(s"$tmp/prior")
    val out = Recrawl.refresh(spark,
      spark.read.parquet(s"$tmp/old"), spark.read.parquet(s"$tmp/new"),
      spark.read.parquet(s"$tmp/prior"))
    val plan = out.queryExecution.executedPlan.toString()
    val oldScan = plan.linesIterator.mkString("\n").split("FileScan")
      .find(_.contains(s"$tmp/old"))
    assert(oldScan.isDefined, s"no scan of the old snapshot in:\n$plan")
    val readSchema = "ReadSchema: ([^\\n]*)".r.findFirstMatchIn(oldScan.get).map(_.group(1))
    assert(readSchema.exists(rs => !rs.contains("html")),
      s"old-side scan reads html: ${readSchema.getOrElse("?")}")
  }

  test("refresh re-extracts the delta only; keeps prior; drops retired") {
    val spark2 = spark
    import spark2.implicits._
    val t1 = new Timestamp(1700000000000L)
    val t2 = new Timestamp(1700086400000L)
    val oldPages = Seq(
      ("http://h.test/a", t1, html("alpha")),
      ("http://h.test/b", t1, html("beta")),
      ("http://h.test/c", t1, html("gamma")) // retired in v2
    ).toDF("url", "warc_ts", "html")
    val newPages = Seq(
      ("http://h.test/a", t1, html("alpha")),    // unchanged (ts equal)
      ("http://h.test/b", t2, html("BETA-NEW")), // advanced ts + new content
      ("http://h.test/d", t1, html("delta"))     // brand new url
    ).toDF("url", "warc_ts", "html")
    // sentinel priors: no extractor output ever equals these
    val prior = Seq(
      ("http://h.test/a", "PRIOR_A"),
      ("http://h.test/b", "PRIOR_B"),
      ("http://h.test/c", "PRIOR_C")
    ).toDF("url", "markdown")

    val out = Recrawl.refresh(spark, oldPages, newPages, prior)
      .as[(String, String)].collect().toMap

    assert(out.keySet == Set("http://h.test/a", "http://h.test/b", "http://h.test/d"))
    assert(out("http://h.test/a") == "PRIOR_A", "unchanged url was re-extracted")
    assert(out("http://h.test/b").contains("BETA-NEW"), "advanced url kept stale prior")
    assert(!out("http://h.test/b").contains("PRIOR"))
    assert(out("http://h.test/d").contains("delta"), "new url missing from refresh")
  }
}
