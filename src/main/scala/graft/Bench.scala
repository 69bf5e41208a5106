package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.crawl.{CrawlConfig, WaveCrawler}
import graft.queries.{AnalyticsQueries, CrawlQueries}

/** Benchmark main (driver contract): runs the headline crawl+extract
  * pipeline and supporting queries on SPARK_GRAFT_SF_DIR at
  * local[SPARK_GRAFT_CPUS], prints ONE JSON line.
  *
  * Headline metric (BASELINE.json): URLs fetched+extracted per second —
  * measured as a list-mode crawl over the full synthetic corpus (every url
  * "fetched" via the frontier ⋈ pages join, readability+markdown extracted
  * for every page). Also reported: the BFS wave crawl (scheduler included)
  * and component timings. Run tools/bench_scaling.sh for the N-vs-4N-cores
  * scaling-efficiency evidence (north rule ≥ 0.8).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = CorpusGen.ensureFor(spark, sfDir)
    val pages = CorpusGen.pages(spark, dir)
    val nPages = pages.count()

    // This JSON line is the round's PERMANENT performance record, measured
    // on a shared virtualized host whose ambient load moves wall-clock by
    // ±40% (BASELINE.md noise note). Defenses: every phase repeats until it
    // CONVERGES — the best two times agree within `tol` (15%) — with a floor
    // of `minReps` (≥3, SPARK_GRAFT_REPEATS can only raise it) and a cap of
    // `maxReps` (8). Each phase carries "converged"; the record carries
    // "clean" = (every phase converged AND both calibration stamps at the
    // quiet-VM nominal) so a contaminated number discounts itself
    // mechanically instead of being adjudicated by hand (it happened two
    // rounds running). Calibration — not loadavg — is the gating signal:
    // on a 32-core box the process's OWN pre-phase work (corpus count,
    // warmup, the settle probes themselves) keeps 1-min loadavg above any
    // threshold for ~a minute even on a perfectly quiet host, which made
    // the old loadavg-based flag a permanent false negative (measured:
    // loadavg_start 6-7 with calib dead-nominal 0.42-0.44 and best-ever
    // phase times). The loadavg stamps remain in the record for context.
    val minReps = math.max(sys.env.getOrElse("SPARK_GRAFT_REPEATS", "1").toInt, 3)
    val maxReps = math.max(sys.env.getOrElse("SPARK_GRAFT_MAX_REPEATS", "8").toInt, minReps)
    val tol = 0.15

    def loadavg(): String =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ").take(3).mkString(",")
      catch { case _: Throwable => "" }

    // CPU calibration: a FIXED integer spin on `cpus` threads whose nominal
    // wall time is independent of any engine change — ambient host
    // contention inflates it proportionally, so two records are comparable
    // by their calib stamps even when every phase "converged" onto a
    // uniformly-degraded plateau (the run6/run7 failure mode: stable
    // external load passes the convergence gate). Measured at start and end.
    def calibrate(): Double = {
      val nThreads = cpus.toInt
      def spin(): Long = {
        var x = 0x9e3779b97f4a7c15L
        var i = 0
        while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
        x
      }
      val best = (1 to 3).map { _ =>
        val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
        val t0 = System.nanoTime()
        val futs = (1 to nThreads).map(_ => pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = spin()
        }))
        futs.foreach(_.get())
        pool.shutdown()
        (System.nanoTime() - t0) / 1e9
      }.min
      best
    }
    // ---- settle gate: the driver launches the bench straight after its
    // own compile+verify workload, so the measurement window's START always
    // eats that tail (the r02-r04 contaminated-record pathology). Bounded
    // wait until a calibration probe lands within 1.2× the quiet-VM
    // nominal, then stamp how long we waited so the record shows the gate
    // ran. Loadavg deliberately does NOT gate: the probes themselves are
    // full-width CPU spins, so on a wide box the gate's own activity (plus
    // the pre-phase corpus jobs) holds 1-min loadavg above any threshold —
    // the old loadavg condition could never clear and self-defeated the
    // flag. Contention is what calibration measures directly.
    val calibNominal =
      sys.env.getOrElse("SPARK_GRAFT_CALIB_NOMINAL", "0.45").toDouble
    val settleCapSec =
      sys.env.getOrElse("SPARK_GRAFT_SETTLE_CAP_SEC", "90").toDouble
    val settleT0 = System.nanoTime()
    var calibStart = calibrate()
    while (calibStart > 1.2 * calibNominal &&
        (System.nanoTime() - settleT0) / 1e9 < settleCapSec) {
      Thread.sleep(5000)
      calibStart = calibrate()
    }
    val settleWaitSec = (System.nanoTime() - settleT0) / 1e9
    val loadStart = loadavg()

    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val allRepeats = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val convergedBy = scala.collection.mutable.LinkedHashMap[String, Boolean]()

    def time[T](label: String)(body: => T): (T, Double) = {
      var best = Double.MaxValue
      var out: Option[T] = None
      val runs = scala.collection.mutable.ArrayBuffer[Double]()
      def isConverged: Boolean = runs.size >= 2 && {
        val sorted = runs.sorted
        (sorted(1) - sorted(0)) / sorted(0) <= tol
      }
      while (runs.size < minReps || (!isConverged && runs.size < maxReps)) {
        val t0 = System.nanoTime()
        val r = body
        val dt = (System.nanoTime() - t0) / 1e9
        runs += dt
        if (dt < best) { best = dt; out = Some(r) }
      }
      allRepeats += label -> runs.toSeq
      convergedBy += label -> isConverged
      (out.get, best)
    }

    // release all crawl state (localCheckpoint RDDs) between phases so one
    // measurement's cache doesn't pressure the next
    def dropCaches(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }

    // headline: fetch+extract every corpus url (list mode = one wave). The
    // url list is a distributed (url_raw, line_no) source — no driver
    // collect, same as Main's --url-file path.
    val allUrls = CrawlQueries.urlLines(spark, dir)
    val nUrls = allUrls.count()

    // untimed warmup (~10% of urls): JIT-compile the extraction hot path so
    // a single-repeat run measures steady state, not C2 compilation
    val warm = allUrls.filter($"line_no" < math.max(500L, nUrls / 10))
    WaveCrawler.crawl(spark, pages,
      CrawlConfig(urlListDf = Some(warm), isUrlListMode = true)).saved.count()
    dropCaches()

    val (extracted, tList) = time("list_extract_all") {
      val n = WaveCrawler.crawl(spark, pages,
        CrawlConfig(urlListDf = Some(allUrls), isUrlListMode = true)).saved.count()
      dropCaches()
      n
    }
    times += "list_extract_all" -> tList

    // BFS wave crawl of host0 (scheduler + extraction end-to-end)
    val (bfsSaved, tBfs) = time("bfs_crawl_host0") {
      val n = WaveCrawler.crawl(spark, pages, CrawlConfig(startUrl = CrawlQueries.Seed))
        .saved.count()
      dropCaches()
      n
    }
    times += "bfs_crawl_host0" -> tBfs

    // scheduling-only BFS (no readability) isolates frontier overhead
    val (_, tSched) = time("bfs_sched_host0") {
      val n = WaveCrawler.crawl(spark, pages,
        CrawlConfig(startUrl = CrawlQueries.Seed, extractContent = false)).saved.count()
      dropCaches()
      n
    }
    times += "bfs_sched_host0" -> tSched

    // component: link extraction over every page
    val (_, tLinks) = time("link_extract_all")(CrawlQueries.linkExtract(spark, sfDir).count())
    times += "link_extract_all" -> tLinks

    // supporting relational queries over the sf tables (skipped for
    // corpus-only scaling dirs like sf1 that have no TPC-H tables)
    if (new java.io.File(s"$sfDir/lineitem.parquet").exists()) {
      times += "q1_agg" -> time("q1_agg")(AnalyticsQueries.q1Agg(spark, sfDir).count())._2
      times += "q_join_agg" -> time("q_join_agg")(AnalyticsQueries.joinAgg(spark, sfDir).count())._2
      times += "q_window_running" ->
        time("q_window_running")(AnalyticsQueries.windowRunning(spark, sfDir).count())._2
    }

    val urlsPerSec = extracted / tList
    val bfsPerSec = bfsSaved / tBfs
    val allConverged = convergedBy.values.forall(identity)
    val calibEnd = calibrate()
    // both ends of the window at the quiet nominal (the end gets 1.3× —
    // the tail drifting is less damaging than starting contaminated, and
    // converged best-of times were taken before it)
    val clean = allConverged && calibStart <= 1.2 * calibNominal &&
      calibEnd <= 1.3 * calibNominal
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val qs = times.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val reps = allRepeats.map { case (k, vs) =>
      "\"" + k + "\":[" + vs.map(v => f"$v%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val conv = convergedBy.map { case (k, v) => "\"" + k + s"""\":$v""" }.mkString("{", ",", "}")
    val json =
      f"""{"metric":"urls_fetched_extracted_per_sec","value":$urlsPerSec%.1f,"unit":"urls/sec","clean":$clean,"converged":$conv,"settle_wait_sec":$settleWaitSec%.1f,"calib_sec_start":$calibStart%.3f,"calib_sec_end":$calibEnd%.3f,"total_sec":${times.values.sum}%.3f,"corpus_pages":$nPages,"extracted":$extracted,"bfs_urls_per_sec":$bfsPerSec%.1f,"cores":$cpus,"heap_mb":$heapMb,"queries":$qs,"repeats":$reps,"loadavg_start":"$loadStart","loadavg_end":"${loadavg()}","sf":"$sfDir"}"""
    // machine-readable copy at a known path — sbt/log4j noise on stdout must
    // never cost the round its bench parse (driver reads either)
    val benchFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "/root/repo/work/bench.json"))
    java.nio.file.Files.createDirectories(benchFile.getParent)
    java.nio.file.Files.writeString(benchFile, json + "\n")
    println(json)
    spark.stop()
  }
}
