package graft.crawl

import org.apache.spark.sql.functions.col
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.corpus.{CorpusGen, CorpusSpec}

/** The sharded Bloom seen-filter's lifecycle at realistic settings:
  *
  *   - MID-CRAWL ENGAGEMENT: bloomMinSeen crossed between two waves — the
  *     engagement wave's own new urls must be inside the filter (they join
  *     seenParts before the build), or links to them later probe
  *     "definitely new", skip the exact anti-join, and re-enter the
  *     frontier as duplicate crawls.
  *   - CAPACITY: segments are sized from the actual seen count (2×
  *     headroom) and rebuilt when outgrown, so fpp stays ≈1% instead of
  *     silently degrading toward 1 as the seen set grows past a fixed
  *     capacity.
  *   - B=4096 SHARDING: the design-point bucket count, with segment sizes
  *     asserted against the documented sizing math.
  */
class BloomSeenSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val spec = CorpusSpec(nHosts = 3, totalPages = 90, seed = 7L)
  private lazy val corpusDir = {
    val dir = java.nio.file.Files.createTempDirectory("graftbloom").toString
    CorpusGen.ensure(spark, dir, spec)
    dir
  }
  private lazy val pages = spark.read.parquet(s"$corpusDir/pages.parquet")

  private lazy val web: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    for (h <- 0 until spec.nHosts; i <- 0 until spec.hostSizes(h))
      b += CorpusGen.pageUrl(h, i) -> CorpusGen.pageHtml(spec, h, i)
    b.result()
  }

  private val seed0 = "http://host0.test/"
  private lazy val ref = RefCrawler.crawl(web, CrawlParams(startUrl = seed0))

  private def assertEqualsRef(out: CrawlOutput): Unit = {
    val saved = out.saved.orderBy("depth", "seq").select("url")
      .collect().map(_.getString(0)).toVector
    assert(saved == ref.savedUrls)
    assert(saved.distinct == saved, "duplicate saves — a url re-entered the frontier")
    assert(out.seen.select("url").collect().map(_.getString(0)).toSet == ref.visited)
    val seenN = out.seen.count()
    assert(seenN == ref.visited.size.toLong, "seen table holds duplicates")
  }

  test("mid-crawl engagement covers the engagement wave's own urls (default-config path)") {
    // after wave k the seen set is every url at depth <= k; pick a threshold
    // strictly between the wave-1 and wave-2 totals so engagement happens
    // mid-crawl (the default-config shape: bloomMinSeen=2M crossed mid-run)
    val byDepth = ref.visitDepth.values.groupBy(identity).view.mapValues(_.size).toMap
    val d1 = (0 to 1).map(byDepth.getOrElse(_, 0)).sum
    val d2 = (0 to 2).map(byDepth.getOrElse(_, 0)).sum
    assert(d2 > d1 + 1, "corpus too shallow for a mid-crawl engagement test")
    val out = WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, bloomMinSeen = d1 + 1L))
    assertEqualsRef(out)
  }

  test("outgrown segments rebuild at 2x and the crawl stays exact") {
    // floor=1, B=4 → the generation built at engagement (seen=1) holds ~4
    // urls total; every few waves the seen set outgrows it and the filter
    // must be rebuilt from the full seen state
    val out = WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, bloomMinSeen = 0L,
        seenBuckets = 4, bloomMinSegCapacity = 1L))
    assert(out.bloomRebuilds >= 1, "expected at least one mid-crawl rebuild")
    assertEqualsRef(out)
  }

  test("crawl at the design-point bucket count B=4096 stays exact") {
    val out = WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, bloomMinSeen = 0L, seenBuckets = 4096))
    assertEqualsRef(out)
  }

  test("segment sizing matches the documented math; probe has no false negatives") {
    val spark2 = spark
    import spark2.implicits._
    val n = 20000
    val urls = spark.range(n).map(i => s"http://sized.test/p-$i").toDF("url")
    val buckets = 4096
    val cap = WaveCrawler.segCapacityFor(n.toLong, buckets, 16L)
    assert(cap == 16L) // floor dominates at this n: 2*20000/4096+1 = 10 < 16

    val segs = WaveCrawler.buildSegs(spark, urls, buckets, cap)
      .collect().map(r => (r.getInt(0), r.getAs[Array[Byte]](1)))
    assert(segs.length <= buckets && segs.length > buckets / 2)
    assert(segs.map(_._1).distinct.length == segs.length)

    // every segment serializes to exactly the size of a fresh filter at the
    // same (capacity, fpp) — the mergeInPlace compatibility invariant AND
    // the sizing-math check in one: size is the optimal-bit formula
    // ceil(-n ln p / ln2^2) rounded up, plus a fixed header
    val expected = {
      val bos = new java.io.ByteArrayOutputStream()
      BloomFilter.create(cap, WaveCrawler.BloomFpp).writeTo(bos)
      bos.toByteArray.length
    }
    segs.foreach { case (b, bytes) =>
      assert(bytes.length == expected, s"bucket $b segment size ${bytes.length} != $expected")
    }

    // design-point arithmetic: 10^10 urls over 4096 buckets with 2x headroom
    val designCap = WaveCrawler.segCapacityFor(10000000000L, buckets, 1024L)
    val designBits = math.ceil(-designCap * math.log(WaveCrawler.BloomFpp) /
      (math.log(2) * math.log(2)))
    val perSegMb = designBits / 8 / 1e6
    assert(perSegMb > 3 && perSegMb < 12, f"per-segment $perSegMb%.1f MB off the ~6 MB design")

    // probe: every inserted url must flag maybe_seen (no false negatives);
    // fresh urls flag definitely-new at ≈ fpp
    val links = spark.range(2L * n).map { i =>
      val u = if (i < n) s"http://sized.test/p-$i" else s"http://fresh.test/q-$i"
      (u, "h", i, 0)
    }.toDF("url", "host", "parent_seq", "pos")
    val probed = WaveCrawler.probeSegs(spark, links, segs.toSeq.toDF("bucket", "bloom"), buckets)
    val inserted = probed.filter(!col("url").startsWith("http://fresh"))
    assert(inserted.filter(!col("maybe_seen")).count() == 0, "Bloom false negative")
    val freshMaybe = probed.filter(col("url").startsWith("http://fresh"))
      .filter(col("maybe_seen")).count()
    assert(freshMaybe < n / 10, s"fpp degenerate: $freshMaybe/$n fresh urls flagged maybe")
  }

  test("cuckoo seen-filter: crawl is exact on the forced segment path") {
    val out = WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, seenFilter = "cuckoo", bloomMinSeen = 0L))
    assertEqualsRef(out)
  }

  test("cuckoo seen-filter: outgrown segments rebuild and the crawl stays exact") {
    val out = WaveCrawler.crawl(spark, pages,
      CrawlConfig(startUrl = seed0, seenFilter = "cuckoo", bloomMinSeen = 0L,
        seenBuckets = 4, bloomMinSegCapacity = 1L))
    assert(out.bloomRebuilds >= 1, "expected at least one mid-crawl rebuild")
    assertEqualsRef(out)
  }

  test("cuckoo probe has no false negatives and sharper fpp than bloom") {
    val spark2 = spark
    import spark2.implicits._
    val n = 20000
    val urls = spark.range(n).map(i => s"http://csized.test/p-$i").toDF("url")
    val buckets = 32
    val cap = WaveCrawler.segCapacityFor(n.toLong, buckets, 16L)
    val segs = WaveCrawler.buildSegs(spark, urls, buckets, cap, "cuckoo")
    val links = spark.range(2L * n).map { i =>
      val u = if (i < n) s"http://csized.test/p-$i" else s"http://cfresh.test/q-$i"
      (u, "h", i, 0)
    }.toDF("url", "host", "parent_seq", "pos")
    val probed = WaveCrawler.probeSegs(spark, links, segs, buckets, "cuckoo")
      .persist()
    assert(probed.filter(!col("url").startsWith("http://cfresh"))
      .filter(!col("maybe_seen")).count() == 0, "cuckoo false negative")
    val freshMaybe = probed.filter(col("url").startsWith("http://cfresh"))
      .filter(col("maybe_seen")).count()
    // cuckoo fpp ≈ 0.012% — two orders below the bloom test's n/10 bound
    assert(freshMaybe < n / 100, s"cuckoo fpp degenerate: $freshMaybe/$n")
    probed.unpersist()
  }

  test("host-prune predicate reaches the parquet scan as PushedFilters") {
    val plan = pages.select(col("url"), col("html"))
      .filter(WaveCrawler.hostPrunePredicate("host0.test"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters:") &&
      plan.contains("StartsWith(url,http://host0.test/"),
      s"host prune did not push into the scan:\n$plan")
    // and the prune is exact over canonical keys: same rows as the udf filter
    val udfCount = {
      val hostOf = org.apache.spark.sql.functions.udf(
        (u: String) => graft.url.UrlNorm.hostnameOf(u))
      pages.filter(hostOf(col("url")) === "host0.test").count()
    }
    val nativeCount = pages.filter(WaveCrawler.hostPrunePredicate("host0.test")).count()
    assert(nativeCount == udfCount)
  }
}
