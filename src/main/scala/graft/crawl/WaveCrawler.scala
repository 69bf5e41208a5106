package graft.crawl

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

import graft.extract.{LinkExtractor, Processor}
import graft.glob.{Glob, GlobSet}
import graft.url.UrlNorm

/** Spark-native batch-iterative URL-frontier crawler (SURVEY.md §3.1 engine
  * equivalent; BASELINE.json north_rule).
  *
  * The reference's sequential FIFO loop (/root/reference/crawler.go:315-420)
  * becomes a wave scheduler over Dataset state:
  *
  *   - FIFO queue        → frontier table (url, host, depth, seq); strict BFS
  *     means each wave holds exactly one depth, and the reference's pop order
  *     is the total order (depth asc, seq asc) (SURVEY.md §7.4a)
  *   - "fetch"           → inner equi-join frontier ⋈ pages(url, html); a
  *     frontier url absent from the corpus ≙ non-critical fetch error → skip
  *   - visited map       → seen table; discovered links anti-join seen
  *     (visited-at-enqueue: the first discoverer owns the url)
  *   - link discovery    → typed flatMap running the H1 extractor; seq of new
  *     urls assigned by global order over (parent_seq, link_pos) — computed
  *     with sort + zipWithIndex (range-partitioned, no single-reducer window)
  *   - --limit K         → serialized-prefix cut: the wave may overshoot; keep
  *     saved rows and discovered links only up to the seq of the K-th save
  *   - robots + per-host budget → north-rule additions: broadcast robots
  *     prefix rules filter links at discovery; per-host saved budget applied
  *     with a per-host window before the global cut
  *
  * All state is DataFrames; per-wave snapshots checkpoint to parquet with a
  * manifest (TableIO) so a crawl resumes mid-run with identical results.
  */
final case class CrawlConfig(
    startUrl: String = "",
    urlList: Seq[String] = Nil,
    isUrlListMode: Boolean = false,
    pageLimit: Int = 0,
    matchPatterns: Seq[String] = Nil,
    followPatterns: Seq[String] = Nil,
    contentSelector: String = "",
    hostPageBudget: Int = 0, // 0 = unlimited (reference parity)
    useRobots: Boolean = false,
    maxWaves: Int = 1000,
    checkpointDir: Option[String] = None,
    extractContent: Boolean = true // false → scheduling-only (no readability)
)

final case class ProcLink(dst: String, dstHost: String, pos: Int)
final case class ProcessedRow(
    url: String,
    host: String,
    depth: Int,
    seq: Long,
    ok: Boolean,
    matched: Boolean,
    title: String,
    markdown: String,
    links: Seq[ProcLink])

final case class WaveMetrics(
    wave: Int,
    depth: Int,
    popped: Long,
    fetched: Long,
    fetch_errors: Long,
    saved: Long,
    skipped_match: Long,
    skipped_budget: Long,
    links_extracted: Long,
    duplicates: Long,
    new_urls: Long)

final case class CrawlOutput(
    saved: DataFrame, // url, host, depth, seq, wave, title, markdown
    seen: DataFrame, // url, host, depth, seq
    metrics: Seq[WaveMetrics],
    stopReason: String)

object WaveCrawler {

  /** Assign a 0-based dense global index by sort order without a
    * single-partition window: orderBy gives a range-partitioned sort;
    * zipWithIndex adds per-partition offsets with one lightweight job.
    */
  def withGlobalIndex(df: DataFrame, idxName: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(rdd, schema.add(StructField(idxName, LongType, nullable = false)))
  }

  private final case class State(
      frontier: DataFrame,
      seen: DataFrame,
      saved: DataFrame,
      savedTotal: Long,
      maxSeq: Long,
      wave: Int,
      depth: Int)

  /** Start a crawl from scratch. */
  def crawl(spark: SparkSession, pages: DataFrame, config: CrawlConfig): CrawlOutput = {
    import spark.implicits._

    // validate patterns on the driver (the reference fails at startup)
    config.matchPatterns.foreach(Glob.compileOrThrow)
    config.followPatterns.foreach(Glob.compileOrThrow)

    val frontier0: DataFrame =
      if (config.isUrlListMode) {
        // A3: order-kept first-wins dedup of the url file
        val lines = config.urlList.zipWithIndex
          .flatMap { case (raw, i) => UrlNorm.normalize(raw).toOption.map(u => (u, i.toLong)) }
        val df = lines.toDF("url", "line_no")
          .groupBy($"url").agg(min($"line_no").as("first_line"))
        withGlobalIndex(df, "seq", $"first_line".asc)
          .select($"url",
            udf((u: String) => UrlNorm.hostnameOf(u)).apply($"url").as("host"),
            lit(0).as("depth"), $"seq")
      } else {
        val norm = normalizeOrThrow(config.startUrl)
        Seq((norm, UrlNorm.hostnameOf(norm), 0, 0L)).toDF("url", "host", "depth", "seq")
      }
    val frontier = frontier0.persist(StorageLevel.MEMORY_AND_DISK)
    val n0 = frontier.count()
    val seen = frontier.select($"url", $"host", $"depth", $"seq")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val saved = spark.emptyDataset[(String, String, Int, Long, Int, String, String)]
      .toDF("url", "host", "depth", "seq", "wave", "title", "markdown")

    runLoop(spark, pages, config,
      State(frontier, seen, saved, savedTotal = 0L, maxSeq = n0 - 1, wave = 0, depth = 0))
  }

  /** Resume from the latest complete checkpoint in config.checkpointDir. */
  def resume(spark: SparkSession, pages: DataFrame, config: CrawlConfig): CrawlOutput = {
    val dir = config.checkpointDir.getOrElse(
      throw new IllegalArgumentException("resume requires checkpointDir"))
    TableIO.latestWave(dir) match {
      case None => crawl(spark, pages, config)
      case Some(w) =>
        val m = TableIO.readManifest(dir, w)
        val frontier = TableIO.readTable(spark, dir, w, "frontier")
        val seen = TableIO.readTable(spark, dir, w, "seen")
        val saved = TableIO.readTable(spark, dir, w, "saved")
        if (m.stopped)
          CrawlOutput(saved, seen, Nil, m.stopReason)
        else
          runLoop(spark, pages, config,
            State(frontier, seen, saved, m.savedTotal, m.maxSeq, m.wave, m.nextDepth))
    }
  }

  private def runLoop(
      spark: SparkSession,
      pages: DataFrame,
      config: CrawlConfig,
      state0: State): CrawlOutput = {
    import spark.implicits._

    val bcMatch = spark.sparkContext.broadcast(config.matchPatterns)
    val bcFollow = spark.sparkContext.broadcast(config.followPatterns)
    val bcSelector = spark.sparkContext.broadcast(config.contentSelector)
    val bcExtract = spark.sparkContext.broadcast(config.extractContent)

    // robots rules: tiny per-host prefix table → broadcast (north star)
    val robotsMap: Map[String, Seq[String]] =
      if (config.useRobots) loadRobots(spark, pages) else Map.empty
    val bcRobots = spark.sparkContext.broadcast(robotsMap)

    val startHost =
      if (config.isUrlListMode) ""
      else UrlNorm.hostnameOf(normalizeOrThrow(config.startUrl))
    val bcStartHost = spark.sparkContext.broadcast(startHost)
    val listMode = config.isUrlListMode

    var frontier = state0.frontier
    var seen = state0.seen
    var savedAll = state0.saved
    var savedTotal = state0.savedTotal
    var maxSeq = state0.maxSeq
    var wave = state0.wave
    var depth = state0.depth

    var hostCounts: DataFrame = savedAll.groupBy($"host").agg(count(lit(1)).as("cnt"))

    val pagesSlim = pages.select($"url", $"html")

    var stopReason = "Completed"
    var stopped = false
    val metrics = Seq.newBuilder[WaveMetrics]

    while (!stopped && wave < config.maxWaves && !frontier.isEmpty) {
      wave += 1
      val popped = frontier.count()

      // J1: "fetch" = equi-join against the corpus. Small waves broadcast.
      val frontierForJoin =
        if (popped <= 100000) broadcast(frontier) else frontier
      val joined = frontierForJoin.join(pagesSlim, Seq("url"), "inner")

      val processed = joined
        .select($"url", $"host", $"depth", $"seq", $"html")
        .as[(String, String, Int, Long, Array[Byte])]
        .mapPartitions { it =>
          val matchGlobs = bcMatch.value.map(Glob.compileOrThrow)
          val followGlobs = bcFollow.value.map(Glob.compileOrThrow)
          val robots = bcRobots.value
          val selector = bcSelector.value
          val doExtract = bcExtract.value
          val sHost = bcStartHost.value
          val lm = listMode
          it.map { case (url, host, d, seq, htmlBytes) =>
            val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
            if (html.trim.isEmpty) {
              // P8: empty/whitespace HTML ≙ fetch error → skip
              ProcessedRow(url, host, d, seq, ok = false, matched = false, "", "", Nil)
            } else {
              val path = UrlNorm.pathOf(url)
              val matched = GlobSet.shouldProcess(matchGlobs, path)
              val (title, md) =
                if (matched && doExtract)
                  Processor.processHTML(url, html, selector)
                    .fold(_ => ("", ""), pd => (pd.title, pd.markdown))
                else ("", "")
              val links =
                if (!lm && host == sHost) {
                  val raw = LinkExtractor.extract(url, sHost, html, followGlobs)
                  raw.zipWithIndex.flatMap { case (dst, pos) =>
                    val dstHost = UrlNorm.hostnameOf(dst)
                    val dstPath = UrlNorm.pathOf(dst)
                    val allowed = robots.get(dstHost) match {
                      case Some(prefixes) => !prefixes.exists(p => dstPath.startsWith(p))
                      case None           => true
                    }
                    if (allowed) Some(ProcLink(dst, dstHost, pos)) else None
                  }
                } else Nil
              ProcessedRow(url, host, d, seq, ok = true, matched = matched, title, md, links)
            }
          }
        }
        .persist(StorageLevel.MEMORY_AND_DISK)

      val fetchedOk = processed.filter($"ok").count()
      val fetchErrors = popped - fetchedOk

      // ---- saved rows: per-host budget, then the global limit cut ----
      var savedCand = processed.filter($"ok" && $"matched")
        .select($"url", $"host", $"depth", $"seq", lit(wave).as("wave"), $"title", $"markdown")
      val savedCandN = savedCand.count()

      var skippedBudget = 0L
      if (config.hostPageBudget > 0) {
        val w = Window.partitionBy($"host").orderBy($"seq")
        val ranked = savedCand.withColumn("rk", row_number().over(w))
          .join(hostCounts.withColumnRenamed("cnt", "prior"), Seq("host"), "left")
          .withColumn("prior", coalesce($"prior", lit(0L)))
        savedCand = ranked.filter($"rk" + $"prior" <= config.hostPageBudget)
          .select($"url", $"host", $"depth", $"seq", $"wave", $"title", $"markdown")
        skippedBudget = savedCandN - savedCand.count()
      }

      var cutSeq = Long.MaxValue
      var savedWave = savedCand
      if (config.pageLimit > 0) {
        val remaining = config.pageLimit - savedTotal
        val indexed = withGlobalIndex(savedCand, "rank_idx", $"seq".asc)
        val kept = indexed.filter($"rank_idx" < remaining).drop("rank_idx")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val keptN = kept.count()
        if (keptN >= remaining) {
          // limit reached inside this wave → serialized-prefix cut (L2)
          cutSeq = kept.agg(max($"seq")).as[Long].head()
          stopped = true
          stopReason = s"Page limit reached (${config.pageLimit})"
        }
        savedWave = kept
      }
      val savedWaveN = savedWave.count()
      savedTotal += savedWaveN
      val skippedMatch = fetchedOk - savedCandN

      val prevSaved = savedAll
      savedAll = savedAll.unionByName(savedWave).localCheckpoint(true)
      prevSaved.unpersist()

      if (config.hostPageBudget > 0) {
        hostCounts = savedAll.groupBy($"host").agg(count(lit(1)).as("cnt"))
      }

      // ---- link expansion (only from rows at or before the cut) ----
      val linkSource =
        if (cutSeq != Long.MaxValue) processed.filter($"seq" <= cutSeq) else processed
      val linkCand = linkSource
        .select(explode($"links").as("l"), $"seq".as("parent_seq"))
        .select($"l.dst".as("url"), $"l.dstHost".as("host"), $"parent_seq", $"l.pos".as("pos"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val linksN = linkCand.count()

      // A2/U3: first discoverer owns the url → min (parent_seq, pos)
      val winners = linkCand
        .groupBy($"url")
        .agg(
          min(struct($"parent_seq", $"pos")).as("ord"),
          first($"host").as("host"))
        .select($"url", $"host", $"ord.parent_seq".as("parent_seq"), $"ord.pos".as("pos"))

      // J2: anti-join the seen set
      val fresh = winners.join(seen.select($"url"), Seq("url"), "left_anti")

      val ordered = withGlobalIndex(fresh, "idx", $"parent_seq".asc, $"pos".asc)
      val newFrontier = ordered
        .select($"url", $"host", lit(depth + 1).as("depth"), ($"idx" + lit(maxSeq + 1)).as("seq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val newN = newFrontier.count()
      val dupDropped = linksN - newN // intra-wave dups + already-seen

      maxSeq += newN
      val newSeen = seen.union(newFrontier.select($"url", $"host", $"depth", $"seq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      newSeen.count()

      metrics += WaveMetrics(wave, depth, popped, fetchedOk, fetchErrors, savedWaveN,
        skippedMatch, skippedBudget, linksN, dupDropped, newN)

      // ---- checkpoint / lineage control ----
      val prevFrontier = frontier
      val prevSeen = seen
      config.checkpointDir match {
        case Some(dir) =>
          val paths = TableIO.writeWave(dir, wave, Map(
            "frontier" -> newFrontier,
            "seen" -> newSeen,
            "saved" -> savedAll),
            manifest = TableIO.Manifest(wave, depth + 1, maxSeq, savedTotal,
              stopped || (config.pageLimit > 0 && savedTotal >= config.pageLimit),
              stopReason))
          frontier = spark.read.parquet(paths("frontier"))
          seen = spark.read.parquet(paths("seen"))
          savedAll = spark.read.parquet(paths("saved"))
          newFrontier.unpersist()
          newSeen.unpersist()
        case None =>
          frontier = newFrontier.localCheckpoint(true)
          seen = newSeen.localCheckpoint(true)
          newFrontier.unpersist()
      }
      prevFrontier.unpersist()
      prevSeen.unpersist()
      processed.unpersist()
      linkCand.unpersist()

      depth += 1
      if (listMode) stopped = true // single wave: list mode never expands
      if (!stopped && config.pageLimit > 0 && savedTotal >= config.pageLimit) {
        // limit hit exactly at a wave boundary: the next pop would break
        stopped = true
        stopReason = s"Page limit reached (${config.pageLimit})"
      }
    }

    CrawlOutput(savedAll, seen, metrics.result(), stopReason)
  }

  private def loadRobots(spark: SparkSession, pages: DataFrame): Map[String, Seq[String]] = {
    // robots.parquet lives next to pages.parquet when the corpus provides it
    import spark.implicits._
    val loc = pages.inputFiles.headOption
      .map(f => f.substring(0, f.lastIndexOf("/pages.parquet")))
    loc.map { dir =>
      try {
        spark.read.parquet(s"$dir/robots.parquet")
          .as[(String, String)].collect()
          .groupBy(_._1).map { case (h, rs) => h -> rs.map(_._2).toSeq }
      } catch { case _: Throwable => Map.empty[String, Seq[String]] }
    }.getOrElse(Map.empty)
  }

  private def normalizeOrThrow(u: String): String =
    UrlNorm.normalize(u).fold(e => throw new IllegalArgumentException(e), identity)
}
