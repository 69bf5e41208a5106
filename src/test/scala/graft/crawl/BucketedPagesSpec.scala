package graft.crawl

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.corpus.{CorpusGen, CorpusSpec}

/** The 10^10 J1 path made concrete: the corpus stored as a url-bucketed
  * table lets every wave's frontier ⋈ pages join run as a sort-merge join
  * with NO shuffle on the pages side — only the (much smaller) frontier is
  * exchanged into the bucket layout. This is the "sort-merge for frontier
  * dedup joins / url-bucketed pages" design SURVEY §4.3 documents for the
  * design point where broadcasting the wave is no longer possible.
  */
class BucketedPagesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val spec = CorpusSpec(nHosts = 3, totalPages = 90, seed = 7L)

  private lazy val bucketedPages = {
    val dir = java.nio.file.Files.createTempDirectory("graftbuckets").toString
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until spec.nHosts).flatMap { h =>
      (0 until spec.hostSizes(h)).map { i =>
        (CorpusGen.pageUrl(h, i),
          CorpusGen.pageHtml(spec, h, i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")
    spark.sparkContext.parallelize(rows, 4).toDF("url", "html")
      .write.bucketBy(4, "url").sortBy("url")
      .option("path", s"$dir/pages_bucketed")
      .saveAsTable("pages_bucketed")
    spark.table("pages_bucketed")
  }

  test("bucketed pages join plans with no Exchange on the pages side") {
    val spark2 = spark
    import spark2.implicits._
    val frontier = Seq(
      ("http://host0.test/", 0), ("http://host1.test/", 0), ("http://host2.test/", 0))
      .toDF("url", "depth")
    // merge hint models the design point where the wave is too big to
    // broadcast (what broadcastFrontierMax=0 selects inside the crawler)
    val joined = frontier.hint("merge").join(bucketedPages, Seq("url"), "inner")
      .queryExecution.executedPlan.toString()
    // exactly one Exchange: the frontier shuffled into the bucket layout;
    // the bucketed scan feeds the sort-merge join directly
    val exchanges = "Exchange hashpartitioning".r.findAllIn(joined).length
    assert(joined.contains("SortMergeJoin"), s"expected SMJ in:\n$joined")
    assert(exchanges == 1, s"expected 1 exchange (frontier side only), got $exchanges in:\n$joined")
    assert(joined.contains("SelectedBucketsCount") || joined.contains("Bucketed: true"),
      s"expected a bucketed scan in:\n$joined")
  }

  test("crawl over the bucketed table equals the reference (shuffle-J1, no broadcast)") {
    val web = (0 until spec.nHosts).flatMap(h => (0 until spec.hostSizes(h)).map { i =>
      CorpusGen.pageUrl(h, i) -> CorpusGen.pageHtml(spec, h, i)
    }).toMap
    val ref = RefCrawler.crawl(web, CrawlParams(startUrl = "http://host0.test/"))
    val out = WaveCrawler.crawl(spark, bucketedPages,
      CrawlConfig(startUrl = "http://host0.test/",
        broadcastFrontierMax = 0L, // force the shuffle/sort-merge J1 path
        cachePages = false)) // read the bucketed table directly every wave
    val saved = out.saved.orderBy("depth", "seq").select("url")
      .collect().map(_.getString(0)).toVector
    assert(saved == ref.savedUrls)
    assert(out.seen.select("url").collect().map(_.getString(0)).toSet == ref.visited)
  }
}
