package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.crawl.{CrawlConfig, WaveCrawler}

/** Debug tool: time BFS crawl variants (bloom on/off, extract on/off).
  * Usage: CrawlTimer <sfDir> [repeats]
  */
object CrawlTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = CorpusGen.ensureFor(spark, sfDir)
    val pages = CorpusGen.pages(spark, dir)

    // job/task counters: deterministic per-crawl overhead evidence immune to
    // ambient host load (the wall-clock A/B's ±40% noise)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    // per-job detail (SPARK_GRAFT_TIMER=listdetail): job wall + task count
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobTasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobDescs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val detail = sys.env.get("SPARK_GRAFT_TIMER").exists(_.contains("detail"))
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (detail) {
          jobStarts.put(j.jobId, System.nanoTime())
          jobTasks.put(j.jobId, new java.util.concurrent.atomic.AtomicLong)
          j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
          val stageName =
            if (j.stageInfos.nonEmpty) j.stageInfos.maxBy(_.stageId).name else ""
          val desc =
            if (j.properties != null)
              j.properties.getProperty("spark.job.description", stageName)
            else stageName
          jobDescs.put(j.jobId, if (desc == null) "" else desc)
        }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (detail) {
          // evict: bounds all three per-job maps on long crawls
          val t0 = jobStarts.remove(j.jobId) // 0L when absent (unboxed null)
          val n = Option(jobTasks.remove(j.jobId)).map(_.get()).getOrElse(0L)
          val desc = Option(jobDescs.remove(j.jobId)).getOrElse("")
          System.err.println(f"[job ${j.jobId}%3d] ${(System.nanoTime() - t0) / 1e6}%8.1f ms  tasks=$n  $desc")
        }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (detail) {
          val jid = stageToJob.getOrDefault(t.stageId, -1)
          Option(jobTasks.get(jid)).foreach(_.incrementAndGet())
        }
      }
    })

    def runN(label: String, cfg: CrawlConfig, n: Int): Unit = {
      var best = Double.MaxValue
      var saved = 0L
      var lastJobs = 0L
      var lastTasks = 0L
      (1 to n).foreach { _ =>
        val (j0, t0n) = (jobs.get(), tasks.get())
        val t0 = System.nanoTime()
        saved = WaveCrawler.crawl(spark, pages, cfg).saved.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        if (dt < best) best = dt
        lastJobs = jobs.get() - j0; lastTasks = tasks.get() - t0n
      }
      println(f"$label%-28s best=$best%6.2f s  saved=$saved  jobs=$lastJobs  tasks=$lastTasks")
    }
    def run(label: String, cfg: CrawlConfig): Unit = runN(label, cfg, repeats)

    val seed = "http://host0.test/"
    // SPARK_GRAFT_TIMER=list times ONLY the headline list-mode crawl (the
    // bench's measured phase) — repeats until stable, for kernel A/Bs
    if (sys.env.get("SPARK_GRAFT_TIMER").exists(_.startsWith("list"))) {
      val allUrls = graft.queries.CrawlQueries.urlLines(spark, dir)
      (1 to repeats).foreach { _ =>
        val (j0, t0n) = (jobs.get(), tasks.get())
        val t0 = System.nanoTime()
        val n = WaveCrawler.crawl(spark, pages,
          CrawlConfig(urlListDf = Some(allUrls), isUrlListMode = true)).saved.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        println(f"list_extract_all $dt%6.3f s  saved=$n  jobs=${jobs.get() - j0}  tasks=${tasks.get() - t0n}")
      }
      spark.stop()
      return
    }
    // SPARK_GRAFT_TIMER=aqe runs only the AQE A/B in a STRICT A,B,A,B…
    // interleave of single runs (same JVM, shared JIT/cache) — each printed
    // line is one crawl, so ambient-load drifts hit both sides evenly
    if (sys.env.get("SPARK_GRAFT_TIMER").contains("aqe")) {
      (1 to math.max(repeats, 2)).foreach { _ =>
        runN("bfs small-wave-AQE-off", CrawlConfig(startUrl = seed, aqeMinWaveRows = 100000L), 1)
        runN("bfs session-AQE (dflt)", CrawlConfig(startUrl = seed), 1)
      }
    } else {
      run("bfs default (adaptive)", CrawlConfig(startUrl = seed))
      run("bfs default sched-only", CrawlConfig(startUrl = seed, extractContent = false))
      run("bfs forced-bloom sched", CrawlConfig(startUrl = seed, extractContent = false, bloomMinSeen = 0L))
      run("bfs forced-bloom+extract", CrawlConfig(startUrl = seed, bloomMinSeen = 0L))
    }
    spark.stop()
  }
}
