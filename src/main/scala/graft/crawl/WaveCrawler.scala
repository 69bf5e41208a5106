package graft.crawl

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import org.apache.spark.util.sketch.BloomFilter

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
  *   - visited map       → seen state; discovered links anti-join seen
  *     (visited-at-enqueue: the first discoverer owns the url)
  *   - link discovery    → typed flatMap running the H1 extractor; seq of new
  *     urls assigned by global order over (parent_seq, link_pos) — computed
  *     with a range repartition + per-partition offsets (no single-reducer
  *     window)
  *   - --limit K         → serialized-prefix cut: the wave may overshoot; keep
  *     saved rows and discovered links only up to the seq of the K-th save
  *   - robots + per-host budget → north-rule additions: broadcast robots
  *     prefix rules filter links at discovery; per-host saved budget applied
  *     with a salted two-phase rank (mega-host skew never lands a whole host
  *     in one task) before the global cut
  *
  * Scale mechanics (SURVEY §4.3):
  *   - ONE aggregation job per wave computes fetched/matched/link counts;
  *     popped is carried from the previous wave's output — no count() storms.
  *   - `seen` and `saved` are per-wave delta parts, never rewritten: the
  *     anti-join reads a union of parts (compacted every few waves); the
  *     checkpoint writes each wave's frontier once (the frontier IS the
  *     wave's seen-delta) plus the wave's saved-delta.
  *   - a driver-merged Bloom filter over all seen urls pre-filters discovered
  *     links: "definitely new" urls skip the exact anti-join entirely; only
  *     Bloom-maybe urls shuffle into it. At 10^10 urls the same structure
  *     shards into per-bucket segments co-partitioned with `seen`.
  *   - wave tables are range-repartitioned to ~100k rows/partition so tiny
  *     waves don't pay 32-partition scheduling overhead and huge waves don't
  *     OOM a task.
  */
final case class CrawlConfig(
    startUrl: String = "",
    urlList: Seq[String] = Nil,
    /** Scalable url-file source: (url_raw: string, line_no: long) rows, e.g.
      * spark.read.textFile + zipWithIndex — a 10^10-line url file never
      * touches the driver. Takes precedence over [[urlList]].
      */
    urlListDf: Option[DataFrame] = None,
    isUrlListMode: Boolean = false,
    /** Cooperative cancel (reference SIGINT semantics: stop after the
      * current page ≙ after the current wave, still emit output+summary).
      */
    cancelled: () => Boolean = () => false,
    pageLimit: Int = 0,
    matchPatterns: Seq[String] = Nil,
    followPatterns: Seq[String] = Nil,
    contentSelector: String = "",
    hostPageBudget: Int = 0, // 0 = unlimited (reference parity)
    useRobots: Boolean = false,
    /** RFC 9309 full-grammar robots gate ([[Robots9309]] rule set, X25) —
      * evaluated in-kernel per discovered link on the RAW url path, on top
      * of (independent of) the corpus prefix rules behind [[useRobots]].
      */
    robots9309: Boolean = false,
    /** Per-host PARSED rules for the RFC 9309 gate (host → ordered
      * (verdict, pattern), the [[RobotsParser]] output). Empty ⇒ the gate
      * falls back to the global grammar-coverage constant. Compiled once
      * on the driver and broadcast; a host absent from the map is fully
      * allowed. At web scale the same rules live as a TABLE and the gate
      * becomes a host-keyed join (robotsAntiJoin's shape) — the broadcast
      * is the small-rule-set fast path.
      */
    robots9309Rules: Map[String, Vector[(String, String)]] = Map.empty,
    /** Per-host RFC 9309 rules as a TABLE — (host, rule_id, verdict,
      * pattern) rows, the [[Robots9309.parsedRules]] output. The scale
      * shape of [[robots9309Rules]]: rules never transit the driver; the
      * gate runs as a host-keyed join of discovered-link winners against
      * the per-host aggregated rules (broadcast-hinted only while the
      * table is ≤ [[WaveCrawler.RobotsBroadcastMaxRows]] rows, a shuffled
      * join above — the robotsAntiJoin discipline). When set, it REPLACES
      * the in-kernel gate ([[robots9309]]'s map/constant path is ignored).
      */
    robots9309RulesDf: Option[DataFrame] = None,
    /** Honor page-level `<meta name="robots">` directives (the publicly
      * documented REP meta extension; off = reference parity, which has no
      * such concept): a `noindex` page is crawled and expanded but never
      * saved; a `nofollow` page's outgoing links never enter the frontier.
      * Evaluated in-kernel off the shared per-page parse — zero extra
      * passes.
      */
    metaRobots: Boolean = false,
    /** Follow `<meta http-equiv="refresh">` redirects (standard HTML, a
      * production-crawl staple; off = reference parity): a redirecting
      * page is never saved and contributes exactly ONE outgoing link — its
      * resolved, normalized target (content anchors are ignored, as a real
      * crawler ignores interstitial bodies). The target runs through the
      * same scheme/host/robots/trap gates as any discovered link.
      */
    followRedirects: Boolean = false,
    /** Reference parity: follow only the seed's hostname
      * (crawler.go:516-518). false = multi-host (Common-Crawl-shaped)
      * frontier: every http(s) link is followed across hosts; robots
      * filtering then runs as a broadcast anti-join of the discovered-link
      * winners against the rules TABLE (no driver-side rule map at any
      * host count), and the corpus scan is not host-pruned.
      */
    sameHostOnly: Boolean = true,
    maxWaves: Int = 1000,
    checkpointDir: Option[String] = None,
    extractContent: Boolean = true, // false → scheduling-only (no readability)
    /** Keep the readability article HTML in the saved table (reference
      * PageData parity, /root/reference/processor.go:15-21) — off by
      * default: at 10^10 pages the extra column roughly doubles the saved
      * table's bytes, so downstream consumers opt in.
      */
    keepArticleHtml: Boolean = false,
    useBloom: Boolean = true,
    /** Approximate-membership structure behind the seen pre-filter:
      * "bloom" (spark.util.sketch, OR-mergeable, ~9.6 bits/url at 1% fpp)
      * or "cuckoo" ([[CuckooFilter]], reinsert-mergeable, deletable,
      * ~12 bits/url at fpp ≈ 0.012% — ~80× fewer false probes falling
      * through to the exact anti-join). Same lifecycle either way:
      * engagement threshold, per-wave fold, outgrow-rebuild.
      */
    seenFilter: String = "bloom",
    /** Seen-set size at which the sharded Bloom segments engage. Below it the
      * plain anti-join is strictly cheaper (the bloom costs a cogroup + a
      * segment-merge job per wave; the exact join's seen-side shuffle is
      * tiny). Above it the segments cut the anti-join's shuffle to the
      * Bloom-maybe links only — at 10^10 seen urls that is the difference
      * between shuffling ~12 GB of segments once vs ~600 GB of urls per
      * wave. 0 forces the segment path (tests).
      */
    bloomMinSeen: Long = 2000000L,
    /** Bucket count B for the sharded seen-segments. Sandbox default 32; the
      * 10^10 design point uses 4096 (≈3 MB/segment at 1% fpp) — tests inject
      * that value to exercise the real sharding arithmetic.
      */
    seenBuckets: Int = WaveCrawler.SeenBuckets,
    /** Floor for the per-segment Bloom capacity. Segments are sized from the
      * ACTUAL seen count at engagement (2× headroom) and rebuilt when the
      * seen set outgrows them — a fixed capacity would silently degrade fpp
      * toward 1 and turn the pre-filter into pure overhead at exactly the
      * scale it targets. Tests shrink the floor to force mid-crawl rebuilds.
      */
    bloomMinSegCapacity: Long = 1024L,
    /** Frontier size up to which J1 broadcasts the wave against the corpus;
      * larger waves fall back to a shuffle join (sort-merge against
      * url-bucketed pages at the 10^10 design point). 0 forces the shuffle
      * path (tests).
      */
    broadcastFrontierMax: Long = 1000000L,
    cachePages: Boolean = true, // re-partition + cache the corpus once per crawl
    /** Wave-size AQE gate: waves with fewer frontier rows than this run
      * with spark.sql.adaptive.enabled=false (AQE materializes every
      * exchange as its own job, and that per-shuffle re-planning is pure
      * scheduling latency when every shuffle is tiny) and larger waves
      * re-enable it (skew-join splitting, partition coalescing — exactly
      * what a 10^8-row wave wants); the caller's session setting is
      * restored on exit. The default matches [[WaveCrawler.RowsPerPartition]]
      * — "small" means the whole wave fits one partition's worth of rows,
      * a data-size bound, not a core-count constant. Round-4 measurements
      * had this off (crossover inside noise); round-6's row-count-derived
      * partitioning removed the coalescing AQE was providing, and the
      * interleaved same-JVM A/B (CrawlTimer SPARK_GRAFT_TIMER=aqe, sf0.1)
      * now shows gate-on winning ~10% with 189 → 65 Spark jobs per crawl.
      * 0 = never touch the session conf (callers running concurrent
      * queries on one session should pass 0).
      */
    aqeMinWaveRows: Long = WaveCrawler.RowsPerPartition,
    /** Politeness rate cap: when > 0, each wave pops at most this many
      * frontier urls PER HOST (FIFO by seq — the reference's queue order)
      * and defers the rest to later waves. This is the per-scheduling-round
      * fetch-rate ceiling a polite 10^10-url crawler enforces per origin
      * (robots "crawl-delay" semantics mapped onto wave scheduling:
      * cap ≈ wave duration ÷ per-host delay). 0 = pop everything (BFS).
      * Depth stays the FIRST-discoverer's depth + 1 (min (parent_seq,pos)),
      * so the seen set and depths are cap-independent; only wave numbers
      * (fetch times) move. Selection is the budget path's salted two-phase
      * rank, so no task ever ranks a whole mega-host's frontier.
      */
    hostWaveCap: Int = 0,
    /** Per-HOST politeness-cap overrides (host → pops/wave), the
      * crawl-delay story end to end: caps derived from each host's parsed
      * robots.txt crawl-delay (cap ≈ wave duration ÷ delay,
      * [[Robots9309.hostDelays]]) override [[hostWaveCap]] for their host;
      * every other host uses the global default (no-cap when it is 0).
      * Host-bounded — rides the wave as a broadcast join.
      */
    hostWaveCaps: Map[String, Int] = Map.empty,
    /** Per-host politeness caps as a TABLE — (host, hcap) rows. Scale
      * shape of [[hostWaveCaps]]: caps ride the existing per-wave join
      * unchanged, but sourced from a DataFrame (e.g. derived from parsed
      * robots crawl-delays without any driver collect) and
      * broadcast-hinted only under the row threshold. Takes precedence
      * over [[hostWaveCaps]] when set.
      */
    hostWaveCapsDf: Option[DataFrame] = None,
    /** Crawler-trap template blocklist (host → digit-collapsed path
      * templates, [[graft.url.UrlNorm.templateOf]]): a discovered link
      * whose (host, template) is listed is DROPPED at extraction — it never
      * enters seen or the frontier, exactly like a robots-disallowed url.
      * Mined offline (the `crawl_url_templates` audit: calendars, session
      * ids, pagination mills) and consumed here as a broadcast map; at
      * 10^10 urls the same gate runs as a host-keyed anti-join against the
      * flagged-template table (robotsAntiJoin's shape).
      */
    trapTemplates: Map[String, Set[String]] = Map.empty,
    /** Trap blocklist as a TABLE — (host, template) rows. Scale shape of
      * [[trapTemplates]]: the gate is a host+template anti-join of
      * discovered-link winners against the blocklist (template derived
      * natively by the documented SQL recipe, byte-identical to
      * [[graft.url.UrlNorm.templateOf]]), broadcast-hinted only under the
      * row threshold. When set, the in-kernel map gate is bypassed.
      */
    trapTemplatesDf: Option[DataFrame] = None,
    /** Best-first frontier scheduling (X27 composed into the wave engine;
      * OPIC / harvest-rank shape — public): per-url priority is the fixed-
      * point integer rank of the url's HOST in this (host, pr) table
      * (host-bounded, broadcast; absent host ⇒ 0). Requires
      * [[priorityPopPerWave]] > 0. Each wave pops the top-P frontier urls
      * by (pr desc, url asc) instead of a whole BFS depth slice and defers
      * the rest; with [[hostWaveCap]] > 0 the per-host politeness cap
      * selects in the SAME priority order (within one host that is url
      * asc — priority is per-host constant) BEFORE the global top-P, so
      * priority + politeness compose in one engine. Both selections are
      * salted two-phase ranks: no task ever ranks a whole mega-host, and
      * the exact global rank only ever orders ≤ salts·P survivors. Depth
      * keeps the first-discoverer semantics of capped waves (mixed-depth
      * pops), so the SEEN SET is schedule-independent; only fetch times
      * (wave numbers) move.
      */
    priorityHostRank: Option[DataFrame] = None,
    priorityPopPerWave: Int = 0
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
    articleHtml: String, // "" unless config.keepArticleHtml
    links: Seq[ProcLink])

final case class WaveMetrics(
    wave: Int,
    depth: Int,
    popped: Long,
    fetched: Long,
    fetch_errors: Long,
    saved: Long,
    skipped_match: Long,
    skipped_budget: Long, // per-host budget drops only
    skipped_limit: Long, // --limit serialized-prefix-cut drops only
    links_extracted: Long,
    duplicates: Long,
    new_urls: Long)

final case class CrawlOutput(
    saved: DataFrame, // url, host, depth, seq, wave, title, markdown, article_html
    seen: DataFrame, // url, host, depth, seq
    metrics: Seq[WaveMetrics],
    stopReason: String,
    /** Times the seen-segment Bloom filter was rebuilt (resized) mid-crawl. */
    bloomRebuilds: Int = 0)

object WaveCrawler {

  private val debug = sys.env.get("SPARK_GRAFT_DEBUG").contains("1")
  @inline private def timed[T](label: String)(body: => T): T = {
    if (!debug) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[wave-timer] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
  }

  val RowsPerPartition = 100000L
  val SeenCompactEvery = 8
  val BudgetSalts = 16

  /** Bloom seen-filter sharding (SURVEY §4.3). The filter is never a single
    * driver-side object: it lives as a `(bucket, bloom_bytes)` Dataset of
    * B segments, bucket = url_hash %% B, built/merged/probed entirely on
    * executors (groupByKey/mapGroups for build+merge, cogroup for the
    * probe — the segment bytes are deserialized once per task, never joined
    * row-wise onto links).
    *
    * Sizing at the 10^10-url design point: 1%% fpp → ~9.6 bits/url ≈ 12 GB
    * of segments total; B = 4096 buckets → ~3 MB/segment, each probe task
    * reads exactly one segment for its co-partitioned slice of links. The
    * sandbox default is B = 32; capacity is NOT fixed — segments are sized
    * from the actual seen count at engagement ([[segCapacityFor]], 2×
    * headroom) and rebuilt at double size when outgrown, so fpp stays ≈1%%
    * however large the seen set grows.
    */
  val SeenBuckets = 32
  val BloomFpp = 0.01

  /** Per-segment capacity for `seenTotal` urls over `buckets` segments:
    * 2× headroom over the mean occupancy, floored (tiny crawls shouldn't
    * produce degenerate 10-bit filters; tests shrink the floor to force the
    * rebuild path).
    */
  def segCapacityFor(seenTotal: Long, buckets: Int, floor: Long): Long =
    math.max(floor, 2L * seenTotal / buckets + 1)

  private def nParts(spark: SparkSession, rows: Long): Int =
    math.max(1, math.min(spark.sparkContext.defaultParallelism.toLong,
      rows / RowsPerPartition + 1)).toInt

  /** Cached-corpus rows per partition: extraction runs ~0.3 ms/page, so
    * ~2000 rows bounds a full-partition extract task near half a second
    * while cutting the per-wave task count ~4× on small host slices.
    */
  val CacheRowsPerPartition = 2000L

  private def cachePartsFor(spark: SparkSession, rows: Long): Int =
    math.max(1, math.min(spark.sparkContext.defaultParallelism.toLong,
      rows / CacheRowsPerPartition + 1)).toInt

  /** Assign a 0-based dense global index by sort order without a
    * single-reducer window: range-repartition on the sort key, sort within
    * partitions, then add per-partition offsets (zipWithIndex).
    *
    * Partitioning is sized from the input's ACTUAL row count (one cheap
    * column-pruned pass), not a core-count constant: a small input takes
    * the single-partition path — no range-sampling pass, no zipWithIndex
    * offsets job, one sort reducer fed by a shuffle (upstream stays wide) —
    * while a large one range-partitions up to defaultParallelism exactly
    * as before. Cost note: the sizing count is one extra execution of the
    * input plan; on the multi-partition path the range partitioner still
    * runs its own sampling pass on top, so callers with an expensive
    * uncached upstream should materialize it first (the list-mode frontier
    * does). Index VALUES are partitioning-independent (guide §2.5: derive
    * partitioning from input size, never from the local core count).
    */
  def withGlobalIndex(df: DataFrame, idxName: String, sortCols: Column*): DataFrame =
    withGlobalIndexN(df, idxName, nParts(df.sparkSession, df.count()), sortCols: _*)

  def withGlobalIndexN(df: DataFrame, idxName: String, numParts: Int, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    // single-partition path goes through a SHUFFLE (repartitionByRange(1)
    // skips range sampling), not coalesce(1): coalesce would fuse the whole
    // upstream — scans, UDFs — into the one sort task, serializing work
    // that should run wide (guide §2.4's accidental-coalesce pitfall)
    val sorted =
      df.repartitionByRange(math.max(1, numParts), sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
    if (numParts <= 1) {
      // one partition ⇒ monotonically_increasing_id IS the dense 0-based
      // index in sort order (partition 0's record number occupies the low
      // bits, so ids are exactly 0..n-1): stays in Tungsten/codegen, no
      // RDD round trip and no per-row Row.toSeq re-encode — the sort task
      // is the crawl's serial bottleneck, so its per-row cost is wall time
      sorted.withColumn(idxName, monotonically_increasing_id())
    } else {
      val schema = sorted.schema
      val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
        Row.fromSeq(row.toSeq :+ idx)
      }
      spark.createDataFrame(rdd, schema.add(StructField(idxName, LongType, nullable = false)))
    }
  }

  // ---- sharded Bloom seen-segments (no driver-side filter, ever) ----------

  private def bucketCol(urlCol: Column, buckets: Int): Column =
    pmod(xxhash64(urlCol), lit(buckets)).cast("int")

  /** Build per-bucket Bloom segments from a url table — one streaming pass
    * per bucket group, memory bounded by the segment (not the group). All
    * segments of one filter generation share `segCapacity` (mergeInPlace
    * compatibility).
    */
  private[crawl] def buildSegs(spark: SparkSession, urls: DataFrame,
      buckets: Int, segCapacity: Long, kind: String = "bloom"): DataFrame = {
    import spark.implicits._
    val grouped = urls.select($"url", bucketCol($"url", buckets).as("bucket"))
      .as[(String, Int)]
      .groupByKey(_._2)
    (kind match {
      case "cuckoo" =>
        grouped.mapGroups { (b, it) =>
          val cf = CuckooFilter.create(segCapacity)
          it.foreach(t => cf.put(t._1))
          (b, cf.serialize)
        }
      case _ =>
        grouped.mapGroups { (b, it) =>
          val bf = BloomFilter.create(segCapacity, BloomFpp)
          it.foreach(t => bf.putString(t._1))
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          (b, bos.toByteArray)
        }
    }).toDF("bucket", "bloom")
  }

  /** Merge segment tables. Both sides come from the same generation's
    * `segCapacity`, so bloom sides are mergeInPlace-compatible and cuckoo
    * sides share a bucket geometry (reinsert-by-stored-bucket merge).
    */
  private[crawl] def mergeSegs(spark: SparkSession, a: DataFrame, b: DataFrame,
      kind: String = "bloom"): DataFrame = {
    import spark.implicits._
    val grouped = a.unionByName(b).as[(Int, Array[Byte])].groupByKey(_._1)
    (kind match {
      case "cuckoo" =>
        grouped.mapGroups { (bkt, it) =>
          var acc: CuckooFilter = null
          it.foreach { case (_, bytes) =>
            val cf = CuckooFilter.deserialize(bytes)
            if (acc == null) acc = cf else acc.mergeInPlace(cf)
          }
          (bkt, acc.serialize)
        }
      case _ =>
        grouped.mapGroups { (bkt, it) =>
          var acc: BloomFilter = null
          it.foreach { case (_, bytes) =>
            val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
            if (acc == null) acc = bf else acc.mergeInPlace(bf): Unit
          }
          val bos = new java.io.ByteArrayOutputStream()
          acc.writeTo(bos)
          (bkt, bos.toByteArray)
        }
    }).toDF("bucket", "bloom")
  }

  /** Probe links against the segments, co-partitioned on bucket: cogroup
    * deserializes each segment once per task and flags every link
    * maybe-seen / definitely-new. Input needs (url, host, parent_seq, pos).
    */
  private[crawl] def probeSegs(spark: SparkSession, links: DataFrame, segs: DataFrame,
      buckets: Int, kind: String = "bloom"): DataFrame = {
    import spark.implicits._
    val linksKV = links
      .select($"url", $"host", $"parent_seq", $"pos", bucketCol($"url", buckets).as("bucket"))
      .as[(String, String, Long, Int, Int)]
      .groupByKey(_._5)
    val segsKV = segs.as[(Int, Array[Byte])].groupByKey(_._1)
    linksKV.cogroup(segsKV) { (_, ls, ss) =>
      if (!ss.hasNext) ls.map { case (u, h, ps, p, _) => (u, h, ps, p, false) }
      else {
        val probe: String => Boolean = kind match {
          case "cuckoo" =>
            val cf = CuckooFilter.deserialize(ss.next()._2); cf.mightContain
          case _ =>
            val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(ss.next()._2))
            bf.mightContainString
        }
        ls.map { case (u, h, ps, p, _) => (u, h, ps, p, probe(u)) }
      }
    }.toDF("url", "host", "parent_seq", "pos", "maybe_seen")
  }

  private final case class State(
      frontier: DataFrame,
      frontierRows: Long,
      seenParts: Vector[DataFrame],
      savedParts: Vector[DataFrame],
      savedTotal: Long,
      maxSeq: Long,
      wave: Int,
      depth: Int)

  private def emptySaved(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(String, String, Int, Long, Int, String, String, String)]
      .toDF("url", "host", "depth", "seq", "wave", "title", "markdown", "article_html")
  }

  /** Start a crawl from scratch. */
  def crawl(spark: SparkSession, pages: DataFrame, config: CrawlConfig): CrawlOutput = {
    import spark.implicits._

    // validate patterns on the driver (the reference fails at startup)
    config.matchPatterns.foreach(Glob.compileOrThrow)
    config.followPatterns.foreach(Glob.compileOrThrow)

    var dedupTmp: DataFrame = null // list-mode dedup checkpoint, released below
    val frontier0: DataFrame =
      if (config.isUrlListMode) {
        // A3: order-kept first-wins dedup of the url file (reference
        // crawler.go:283-295), fully distributed: the line source is either
        // a caller-provided (url_raw, line_no) DataFrame (spark.read.textFile
        // + zipWithIndex in Main — a 10^10-line file never touches the
        // driver) or, for small programmatic lists, parallelize (not toDF on
        // a local Seq: a LocalRelation would inline every url into every
        // plan-tree walk).
        val lines: DataFrame = config.urlListDf.getOrElse {
          val seq = config.urlList.zipWithIndex.map { case (raw, i) => (raw, i.toLong) }
          spark.sparkContext.parallelize(seq, nParts(spark, seq.size)).toDF("url_raw", "line_no")
        }
        val normUdf = udf((s: String) => UrlNorm.normalize(s).toOption.orNull)
        // the line source may arrive in fewer partitions than cores (e.g. a
        // globally-indexed list ends in one sort partition): spread the
        // normalize UDF across the machine before it runs — one tiny
        // shuffle of raw url strings; a no-op at scale, where the list
        // already has ≥ cores partitions
        val cores = spark.sparkContext.defaultParallelism
        val linesWide =
          if (lines.rdd.getNumPartitions < cores) lines.repartition(cores) else lines
        // cache the dedup output so the global index's sizing count and its
        // sort pass both read materialized rows instead of re-running the
        // normalize UDF + groupBy shuffle (the headline's timed region pays
        // this chain once per crawl). persist, not localCheckpoint: a
        // checkpointed Dataset's unpersist() is a CacheManager no-op, so
        // only the cached form is actually releasable below.
        val df = linesWide
          .select(normUdf($"url_raw").as("url"), $"line_no")
          .filter($"url".isNotNull)
          .groupBy($"url").agg(min($"line_no").as("first_line"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        dedupTmp = df
        val nRows = df.count() // also the global index's sizing count
        val sortParts = nParts(spark, nRows)
        val indexed = withGlobalIndexN(df, "seq", sortParts, $"first_line".asc)
        // the single-sort path leaves ONE output partition, which would run
        // the hostname UDF and the frontier checkpoint serialization as one
        // serial task (and feed the wave's join from one partition). seq is
        // already assigned — partitioning is value-irrelevant from here — so
        // respread by the per-row-work sizing (cachePartsFor, same constant
        // as the extract-task sizing) when the sort was narrower than that.
        // At scale the sort is already wide and this is skipped entirely.
        val workParts = cachePartsFor(spark, nRows)
        val spread = if (sortParts < workParts) indexed.repartition(workParts) else indexed
        spread
          .select($"url",
            udf((u: String) => UrlNorm.hostnameOf(u)).apply($"url").as("host"),
            lit(0).as("depth"), $"seq")
      } else {
        val norm = normalizeOrThrow(config.startUrl)
        Seq((norm, UrlNorm.hostnameOf(norm), 0, 0L)).toDF("url", "host", "depth", "seq")
      }
    // lazy checkpoint + count = ONE materialization job (eager + count = two)
    val frontier = frontier0.localCheckpoint(false)
    val n0 = frontier.count()
    if (dedupTmp != null) dedupTmp.unpersist() // frontier is materialized

    val state0 = State(frontier, n0, Vector(frontier), Vector.empty,
      savedTotal = 0L, maxSeq = n0 - 1, wave = 0, depth = 0)

    config.checkpointDir.foreach { dir =>
      // wave=0 snapshot: the initial frontier is wave 0's seen-delta
      TableIO.writeWave(dir, 0, Map("frontier" -> frontier, "saved_delta" -> emptySaved(spark)),
        TableIO.Manifest(0, 0, state0.maxSeq, 0L, stopped = false, "Running"))
    }

    runLoop(spark, pages, config, state0)
  }

  /** Resume from the latest complete checkpoint in config.checkpointDir. */
  def resume(spark: SparkSession, pages: DataFrame, config: CrawlConfig): CrawlOutput = {
    val dir = config.checkpointDir.getOrElse(
      throw new IllegalArgumentException("resume requires checkpointDir"))
    TableIO.latestWave(dir) match {
      case None => crawl(spark, pages, config)
      case Some(w) =>
        val m = TableIO.readManifest(dir, w)
        val frontTables = (0 to w).toVector
          .map(k => TableIO.readTable(spark, dir, k, "frontier"))
        // A checkpointed frontier carries the FULL pending set — fresh rows
        // PLUS any politeness-cap backlog deferred from earlier waves. The
        // deferred rows already sit in the wave they were enqueued at, so
        // seen part k is frontier(k) minus frontier(k-1): without this,
        // resume's seen (a user-facing OUTPUT, compared as a set) holds the
        // backlog once per wave it rode through.
        val seenParts = frontTables.head +: frontTables.sliding(2).collect {
          case Vector(prev, cur) =>
            cur.join(prev.select(col("url")), Seq("url"), "left_anti")
        }.toVector
        val savedParts = (0 to w).toVector
          .map(k => TableIO.readTable(spark, dir, k, "saved_delta"))
        // the live frontier stays the FULL pending set so deferred rows repop
        val frontier = frontTables.last
        if (m.stopped)
          CrawlOutput(unionParts(spark, savedParts, emptySaved(spark)),
            unionParts(spark, seenParts, frontier), Nil, m.stopReason)
        else
          runLoop(spark, pages, config,
            State(frontier, frontier.count(), seenParts, savedParts,
              m.savedTotal, m.maxSeq, m.wave, m.nextDepth))
    }
  }

  private def unionParts(spark: SparkSession, parts: Seq[DataFrame], empty: => DataFrame): DataFrame =
    if (parts.isEmpty) empty else parts.reduce(_ unionByName _)

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
    val bcKeepAH = spark.sparkContext.broadcast(config.keepArticleHtml)

    val startHost =
      if (config.isUrlListMode) ""
      else UrlNorm.hostnameOf(normalizeOrThrow(config.startUrl))

    // robots rules. Same-host mode: the crawl touches exactly the seed's
    // host, so its (tiny) rule set rides the extraction broadcast.
    // Multi-host mode: rules for any host may be needed at link-discovery
    // time, so the rules stay a TABLE — discovered-link winners anti-join
    // it per wave (broadcast hash join on host). No driver-side rule map at
    // any host count; at 10^8 hosts the join shuffles instead of
    // broadcasting, same plan shape.
    val listMode = config.isUrlListMode
    val robotsMap: Map[String, Seq[String]] =
      if (config.useRobots && !listMode && config.sameHostOnly)
        loadRobots(spark, pages, Seq(startHost))
      else Map.empty
    val robotsDf: DataFrame =
      if (config.useRobots && !listMode && !config.sameHostOnly) {
        val df = loadRobotsDf(spark, pages)
        if (df != null) df.persist(StorageLevel.MEMORY_AND_DISK) else null
      } else null
    // one cheap agg at crawl start sizes the rules table so robotsAntiJoin
    // only broadcast-hints a genuinely small one (RobotsBroadcastMaxRows)
    val robotsRows: Long = if (robotsDf != null) robotsDf.count() else 0L
    val bcRobots = spark.sparkContext.broadcast(robotsMap)
    // per-host RFC 9309 rules compiled ONCE here (Pattern is Serializable)
    val bc9309 = spark.sparkContext.broadcast(
      config.robots9309Rules.map { case (h, rs) => h -> Robots9309.compile(rs) })
    val bcStartHost = spark.sparkContext.broadcast(startHost)
    // table-gated crawls bypass the kernel map gate entirely
    val bcTrap = spark.sparkContext.broadcast(
      if (config.trapTemplatesDf.isDefined) Map.empty[String, Set[String]]
      else config.trapTemplates)
    val sameHostOnly = config.sameHostOnly

    // ---- host-keyed gate TABLES (the robotsAntiJoin discipline for every
    // per-host gate: rules flow as DataFrames, broadcast-hinted only while
    // genuinely small, shuffled joins above the threshold — no driver-side
    // host map at any host count). Each table is persisted once per crawl
    // (every wave re-probes it) and sized by one cheap count. ----
    def sizedGate(df: DataFrame): (DataFrame, Long) = {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      (p, p.count())
    }
    val (trapGateDf, trapGateRows) = config.trapTemplatesDf match {
      case Some(df) => sizedGate(df.select($"host", $"template"))
      case None     => (null: DataFrame, 0L)
    }
    // per-host ordered rule arrays, aggregated ONCE (rule sets are a few
    // rows per host; the aggregate keys the join by host)
    val (rules9309GateDf, rules9309GateRows) = config.robots9309RulesDf match {
      case Some(df) =>
        sizedGate(df
          .groupBy($"host")
          .agg(sort_array(collect_list(struct($"rule_id", $"verdict", $"pattern")))
            .as("rules")))
      case None => (null: DataFrame, 0L)
    }
    val (capsGateDf, capsGateRows) = config.hostWaveCapsDf match {
      case Some(df) => sizedGate(df.select($"host", $"hcap"))
      case None     => (null: DataFrame, 0L)
    }


    var frontier = state0.frontier
    var popped = state0.frontierRows
    var seenParts = state0.seenParts
    var seenSinceCompact = seenParts.size
    var savedParts = state0.savedParts
    var savedTotal = state0.savedTotal
    var maxSeq = state0.maxSeq
    var wave = state0.wave
    var depth = state0.depth

    // Sharded Bloom pre-filter over every seen url (SURVEY §4.3): a segment
    // Dataset, (re)built distributedly — the resume path never materializes
    // a single url on the driver. Engages lazily once the seen set outgrows
    // config.bloomMinSeen (below that the exact anti-join wins). Segments
    // are sized from the ACTUAL seen count at (re)build time and rebuilt at
    // 2× when the seen set outgrows them, so fpp never silently degrades.
    val buckets = config.seenBuckets
    var bloomSegs: DataFrame = null
    var bloomSegCap = 0L // per-segment capacity of the live generation
    var bloomRebuilds = 0
    def buildAllSegs(seenTotal: Long): Unit = {
      bloomSegCap = segCapacityFor(seenTotal, buckets, config.bloomMinSegCapacity)
      val prev = bloomSegs
      bloomSegs = buildSegs(spark, unionParts(spark, seenParts, frontier),
        buckets, bloomSegCap, config.seenFilter).localCheckpoint(true)
      if (prev != null) prev.unpersist()
    }
    def maybeEngageBloom(seenTotal: Long): Unit =
      if (bloomSegs == null && config.useBloom && !listMode &&
        seenTotal >= config.bloomMinSeen)
        buildAllSegs(seenTotal)
    maybeEngageBloom(state0.maxSeq + 1)

    var hostCounts: DataFrame =
      if (config.hostPageBudget > 0)
        unionParts(spark, savedParts, emptySaved(spark))
          .groupBy($"host").agg(count(lit(1)).as("cnt")).localCheckpoint(true)
      else null

    // The corpus side of J1. Multi-wave crawls re-probe the corpus every
    // wave, so cache it once (the single-node stand-in for a url-bucketed
    // pages table / sort-merge J1 at 10^10 pages) — and since crawl mode
    // never leaves the seed's hostname (reference crawler.go:516-518), push
    // that predicate into the cached corpus: every wave then probes only the
    // seed host's partition of the web, the same pruning a host-partitioned
    // pages table gives at scale. A list-mode crawl reads the corpus exactly
    // once — caching it would only add a copy.
    val doCachePages = config.cachePages && !listMode
    val pagesSlim = {
      val slim = pages.select($"url", $"html")
      // multi-host crawls can reach any host — no host prune
      val pruned =
        if (!listMode && sameHostOnly) slim.filter(hostPrunePredicate(startHost)) else slim
      // coalesce the cached corpus to a partition count derived from its
      // ACTUAL row count (one url-only count — parquet prunes the html
      // column and keeps the host PushedFilters): EVERY wave's J1+extract
      // job (and every job re-reading the wave's persisted `processed`,
      // which inherits this partitioning) schedules one task per cached
      // partition, and at ~3-5 ms/task the empty tasks, not the work,
      // dominate small-wave latency — a small host slice wants ~4-8
      // partitions, not one per core. Capped at defaultParallelism so a
      // large corpus keeps full scan parallelism (guide §2.5: size from
      // the data, not the local core count). coalesce (not repartition)
      // keeps it shuffle-free.
      val sized =
        if (doCachePages) {
          val rows = pruned.select($"url").count()
          pruned.coalesce(cachePartsFor(spark, rows))
        } else pruned
      if (doCachePages) sized.persist(StorageLevel.MEMORY_AND_DISK) else sized
    }

    var stopReason = "Completed"
    var stopped = false
    val metrics = Seq.newBuilder[WaveMetrics]

    // Single-pass fusion for the bulk-extract list wave (no --match, no
    // --limit, no per-host budget — the 100-TB "fetch+extract everything"
    // shape and the bench headline): the extracted rows then have exactly
    // ONE consumer, the saved delta, and every wave counter is derivable
    // from its materialization alone (no match patterns ⇒ ok ≡ saved;
    // list mode ⇒ links ≡ 0). Skipping the cache+agg drops a full
    // write+2×read of the extracted output through the in-memory columnar
    // store plus one job per wave — pure DRAM traffic on a box whose
    // 8-core side is already bandwidth-bound (BASELINE.md round-4 scaling
    // analysis), and pure extra I/O at any core count.
    val fuseListWave = listMode && config.pageLimit <= 0 &&
      config.hostPageBudget <= 0 && config.matchPatterns.isEmpty

    // Best-first mode (CrawlConfig.priorityHostRank): the host-rank table is
    // host-bounded, so it broadcasts once and every wave's frontier joins it
    val priorityMode = config.priorityHostRank.isDefined && config.priorityPopPerWave > 0
    val bcPriority = config.priorityHostRank.map(df =>
      df.select($"host", $"pr").localCheckpoint(true)) // broadcast-hinted at the join

    // Wave-size-adaptive AQE (see CrawlConfig.aqeMinWaveRows): restore the
    // caller's setting whatever happens. Session-scoped conf — callers
    // running concurrent queries on the same session should pass 0.
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeOriginal: Option[String] =
      try Option(spark.conf.get(aqeKey)) catch { case _: Throwable => None }
    def setAqe(on: Boolean): Unit =
      if (config.aqeMinWaveRows > 0) spark.conf.set(aqeKey, on.toString)

    try {
    while (!stopped && wave < config.maxWaves && popped > 0) {
      if (config.cancelled()) {
        // reference SIGINT semantics (crawler.go:317-321): break before the
        // next pop; everything saved so far is still emitted
        stopped = true
        stopReason = "Cancelled by user"
      } else {
      wave += 1
      setAqe(popped >= config.aqeMinWaveRows)

      // Politeness wave cap (CrawlConfig.hostWaveCap): pop at most cap urls
      // per host this wave (FIFO by seq), defer the rest. Selection is the
      // budget path's salted two-phase rank — a slice rank > cap already
      // implies the exact per-host rank > cap, so phase 2 ranks only the
      // ≤ salts·cap survivors per host; no task ranks a whole mega-host.
      val (waveFrontier, deferred, popN) =
        if (priorityMode) {
          // Best-first pop: top-P frontier urls by (host-pr desc, url asc);
          // the per-host politeness cap (when set) selects in the SAME
          // priority order first. Both ranks are salted two-phase: a slice
          // rank > cap/P already implies the exact rank > cap/P, so phase 2
          // only ever orders the bounded survivor set.
          val pP = config.priorityPopPerWave
          val withPr = frontier
            .join(broadcast(bcPriority.get), Seq("host"), "left")
            .withColumn("pr", coalesce($"pr", lit(0L)))
          val hostCapped =
            if (config.hostWaveCap > 0) {
              val cap = config.hostWaveCap
              val salted = withPr.withColumn("salt", pmod(hash($"url"), lit(BudgetSalts)))
              val w1 = Window.partitionBy($"host", $"salt").orderBy($"url")
              val w2 = Window.partitionBy($"host").orderBy($"url")
              salted.withColumn("rk1", row_number().over(w1)).filter($"rk1" <= cap)
                .withColumn("rk", row_number().over(w2)).filter($"rk" <= cap)
                .drop("rk1", "rk", "salt")
            } else withPr
          val gsalted = hostCapped.withColumn("salt", pmod(hash($"url"), lit(BudgetSalts)))
          val gw1 = Window.partitionBy($"salt").orderBy($"pr".desc, $"url")
          val gw2 = Window.orderBy($"pr".desc, $"url") // ≤ salts·P survivors
          val pop = gsalted.withColumn("grk1", row_number().over(gw1))
            .filter($"grk1" <= pP)
            .withColumn("grk", row_number().over(gw2)).filter($"grk" <= pP)
            .select($"url", $"host", $"depth", $"seq").localCheckpoint(false)
          // deferred = everything not popped (host-cap drops + priority cuts),
          // original depth/seq intact
          val defer = frontier
            .join(pop.select($"url".as("purl")), $"url" === $"purl", "left_anti")
            .select($"url", $"host", $"depth", $"seq").localCheckpoint(false)
          val n = pop.count()
          (pop, defer, n)
        } else if (config.hostWaveCap > 0 || config.hostWaveCaps.nonEmpty ||
          capsGateDf != null) {
          // per-host overrides (parsed crawl-delays) ride a host-keyed join
          // — a caps TABLE when provided (broadcast-hinted only under the
          // row threshold), the small programmatic Map otherwise; hosts
          // without one use the global default (∞ when that is 0)
          val defCap = if (config.hostWaveCap > 0) config.hostWaveCap else Int.MaxValue
          val based =
            if (capsGateDf != null)
              frontier.join(gateHint(capsGateDf, capsGateRows), Seq("host"), "left")
                .withColumn("hcap", coalesce($"hcap", lit(defCap)))
            else if (config.hostWaveCaps.isEmpty) frontier.withColumn("hcap", lit(defCap))
            else {
              val capsDf = {
                val spark2 = spark; import spark2.implicits._
                config.hostWaveCaps.toSeq.toDF("host", "hcap")
              }
              frontier.join(broadcast(capsDf), Seq("host"), "left")
                .withColumn("hcap", coalesce($"hcap", lit(defCap)))
            }
          val salted = based.withColumn("salt", pmod(hash($"url"), lit(BudgetSalts)))
          val w1 = Window.partitionBy($"host", $"salt").orderBy($"seq")
          val p1 = salted.withColumn("rk1", row_number().over(w1))
            .persist(StorageLevel.MEMORY_AND_DISK)
          val w2 = Window.partitionBy($"host").orderBy($"seq")
          val r2 = p1.filter($"rk1" <= $"hcap").withColumn("rk", row_number().over(w2))
            .persist(StorageLevel.MEMORY_AND_DISK)
          // both sides checkpointed: pop materializes via its count below,
          // defer at the NEXT wave's pop (its parents are materialized, so
          // lineage depth stays constant across waves)
          val pop = r2.filter($"rk" <= $"hcap")
            .select($"url", $"host", $"depth", $"seq").localCheckpoint(false)
          val defer = r2.filter($"rk" > $"hcap")
            .select($"url", $"host", $"depth", $"seq")
            .unionByName(p1.filter($"rk1" > $"hcap").select($"url", $"host", $"depth", $"seq"))
            .localCheckpoint(false)
          val n = pop.count()
          p1.unpersist(); r2.unpersist()
          (pop, defer, n)
        } else (frontier, null: DataFrame, popped)
      val deferredN = popped - popN // rows pushed to later waves by the cap

      // J1: "fetch" = equi-join against the corpus. Waves are broadcast while
      // small (the common case); at 10^10-frontier scale this becomes a
      // sort-merge join against url-bucketed pages.
      val frontierForJoin =
        if (popN <= config.broadcastFrontierMax) broadcast(waveFrontier) else waveFrontier
      val joined = frontierForJoin.join(pagesSlim, Seq("url"), "inner")

      // plain Booleans hoisted out of the closure: capturing `config` itself
      // would drag its DataFrame/function fields into task serialization.
      // A provided gate TABLE replaces the corresponding in-kernel gate
      // (the join runs on the winners below).
      val use9309 = config.robots9309 && rules9309GateDf == null
      val useMetaRobots = config.metaRobots
      val useRedirects = config.followRedirects
      val processedPlan = joined
        .select($"url", $"host", $"depth", $"seq", $"html")
        .as[(String, String, Int, Long, Array[Byte])]
        .mapPartitions { it =>
          val matchGlobs = bcMatch.value.map(Glob.compileOrThrow)
          val followGlobs = bcFollow.value.map(Glob.compileOrThrow)
          val robots = bcRobots.value
          val rules9309 = bc9309.value
          val selector = bcSelector.value
          val doExtract = bcExtract.value
          val keepAH = bcKeepAH.value
          val sHost = bcStartHost.value
          val trap = bcTrap.value
          val lm = listMode
          val sho = sameHostOnly
          it.map { case (url, host, d, seq, htmlBytes) =>
            val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
            if (html.trim.isEmpty) {
              // P8: empty/whitespace HTML ≙ fetch error → skip
              ProcessedRow(url, host, d, seq, ok = false, matched = false, "", "", "", Nil)
            } else {
              val path = UrlNorm.pathOf(url)
              val matchedGlob = GlobSet.shouldProcess(matchGlobs, path)
              // ONE parse per page, shared by link extraction (read-only,
              // must run first) and content extraction (mutates the tree)
              val doc =
                try graft.html.HtmlParser.parse(html)
                catch { case _: Throwable => null }
              // page-level robots metas (read off the shared parse, before
              // the pre-filter mutates it): noindex drops the page from
              // the saved set (crawled, expanded, not kept), nofollow
              // drops its OUTGOING links from the frontier
              val (metaNoindex, metaNofollow) =
                if (useMetaRobots && doc != null) Processor.metaRobots(doc)
                else (false, false)
              // meta-refresh redirect: the raw target's presence alone makes
              // the page a redirect (unsaved); its resolved form (when the
              // scheme/host predicates accept it) is the page's ONLY link
              val redirectRaw =
                if (useRedirects && doc != null) Processor.metaRefresh(doc)
                else None
              val matched = matchedGlob && !metaNoindex && redirectRaw.isEmpty
              val links =
                if (!lm && (!sho || host == sHost) && doc != null) {
                  val rawLinks =
                    if (redirectRaw.isDefined)
                      redirectRaw.flatMap(t =>
                        LinkExtractor.resolveAccepted(url, t, sHost,
                          allHosts = !sho)).toVector
                    else if (metaNofollow) Vector.empty[String]
                    else LinkExtractor.extractFromDoc(url, sHost, doc, followGlobs,
                      allHosts = !sho)
                  rawLinks.zipWithIndex.flatMap { case (dst, pos) =>
                    val dstHost = UrlNorm.hostnameOf(dst)
                    val dstPath = UrlNorm.pathOf(dst)
                    val allowed = (robots.get(dstHost) match {
                      case Some(prefixes) => !prefixes.exists(p => dstPath.startsWith(p))
                      case None           => true
                    }) && (!use9309 || {
                      // parsed per-host rules when provided (absent host ⇒
                      // allowed); global grammar-coverage constant otherwise
                      val raw = Robots9309.rawPathOf(dst)
                      if (rules9309.isEmpty) Robots9309.allowedPath(raw)
                      else rules9309.get(dstHost)
                        .forall(rs => Robots9309.allowed(rs, raw))
                    }) && (trap.isEmpty ||
                      !trap.get(dstHost).exists(_.contains(UrlNorm.templateOf(dst))))
                    if (allowed) Some(ProcLink(dst, dstHost, pos)) else None
                  }
                } else Nil
              val (title, md, ah) =
                if (matched && doExtract && doc != null)
                  Processor.processParsed(url, html, doc, selector, needArticleHtml = keepAH)
                    .fold(_ => ("", "", ""),
                      pd => (pd.title, pd.markdown, if (keepAH) pd.articleHtml else ""))
                else ("", "", "")
              ProcessedRow(url, host, d, seq, ok = true, matched = matched, title, md, ah, links)
            }
          }
        }
      // fused wave: extraction flows straight into the saved delta — one
      // pass, nothing cached (a second consumer would recompute it)
      val processed =
        if (fuseListWave) processedPlan
        else processedPlan.persist(StorageLevel.MEMORY_AND_DISK)

      // ---- the wave's ONE metrics aggregation (skipped when fused: the
      // saved-delta count below IS fetchedOk/matchedN, and links ≡ 0) ----
      def aggNow(): (Long, Long, Long) = {
        val Row(a: Long, b: Long, c: Long) = timed(s"w$wave agg+extract")(processed
          .agg(
            coalesce(sum(when($"ok", 1L).otherwise(0L)), lit(0L)),
            coalesce(sum(when($"ok" && $"matched", 1L).otherwise(0L)), lit(0L)),
            coalesce(sum(size($"links")).cast("long"), lit(0L)))
          .head())
        (a, b, c)
      }
      // With no budget and no limit, nothing between here and the link
      // expansion reads the agg's outputs — so it runs CONCURRENTLY with
      // the saved-delta materialization below (the per-partition cache
      // lock makes whichever job arrives first compute a partition and the
      // other read it): one sequential job latency per wave saved.
      val overlapAgg = !fuseListWave &&
        config.hostPageBudget <= 0 && config.pageLimit <= 0
      val aggFut: java.util.concurrent.CompletableFuture[(Long, Long, Long)] =
        if (overlapAgg)
          java.util.concurrent.CompletableFuture.supplyAsync(() => aggNow())
        else null
      val (fetchedOkAgg, matchedNAgg, linksNSeq) =
        if (fuseListWave || overlapAgg) (0L, 0L, 0L) else aggNow()

      // ---- saved rows: per-host budget, then the global limit cut ----
      var savedCand = processed.filter($"ok" && $"matched")
        .select($"url", $"host", $"depth", $"seq", lit(wave).as("wave"), $"title",
          $"markdown", $"articleHtml".as("article_html"))

      if (config.hostPageBudget > 0 && matchedNAgg > 0) {
        // salted two-phase rank: phase 1 bounds every (host, salt) slice to
        // the budget so no task ever ranks a whole mega-host; phase 2 ranks
        // the ≤ salts×budget survivors per host exactly.
        val salted = savedCand.withColumn("salt", pmod(hash($"url"), lit(BudgetSalts)))
        val w1 = Window.partitionBy($"host", $"salt").orderBy($"seq")
        val phase1 = salted.withColumn("rk1", row_number().over(w1))
          .filter($"rk1" <= config.hostPageBudget)
        val w2 = Window.partitionBy($"host").orderBy($"seq")
        savedCand = phase1.withColumn("rk", row_number().over(w2))
          .join(hostCounts.withColumnRenamed("cnt", "prior"), Seq("host"), "left")
          .withColumn("prior", coalesce($"prior", lit(0L)))
          .filter($"rk" + $"prior" <= config.hostPageBudget)
          .select($"url", $"host", $"depth", $"seq", $"wave", $"title",
            $"markdown", $"article_html")
      }
      // budget survivors BEFORE the limit cut, so budget drops and limit
      // drops stay separate in the metrics. No dedicated count() job: with
      // no --limit the survivors ARE the wave's saved rows (the savedDelta
      // materialization below counts them); with a --limit the survivor
      // count folds into the limit path's single agg.
      var budgetKeptFromAgg = -1L

      var cutSeq = Long.MaxValue
      var savedWave = savedCand
      var keptTmp: DataFrame = null
      if (config.pageLimit > 0) {
        val remaining = config.pageLimit - savedTotal
        val indexed = withGlobalIndexN(savedCand, "rank_idx", nParts(spark, matchedNAgg), $"seq".asc)
          .persist(StorageLevel.MEMORY_AND_DISK)
        keptTmp = indexed
        // ONE agg job: budget-survivor count, limit-survivor count, and the
        // serialized-prefix cut seq (was three jobs: savedCand.count(),
        // kept.count(), kept.agg(max))
        val r = indexed.agg(
          count(lit(1)),
          coalesce(sum(when($"rank_idx" < remaining, 1L).otherwise(0L)), lit(0L)),
          max(when($"rank_idx" < remaining, $"seq"))).head()
        budgetKeptFromAgg = r.getLong(0)
        val keptN = r.getLong(1)
        if (keptN >= remaining) {
          // limit reached inside this wave → serialized-prefix cut (L2);
          // remaining ≥ 1 here so the max() over kept rows is non-null
          cutSeq = r.getLong(2)
          stopped = true
          stopReason = s"Page limit reached (${config.pageLimit})"
        }
        savedWave = indexed.filter($"rank_idx" < remaining).drop("rank_idx")
      }

      // the saved delta launches FIRST: its materialization job overlaps
      // the futured metrics agg above and the frontier job below
      val savedDelta = savedWave.localCheckpoint(false)
      val savedFut = java.util.concurrent.CompletableFuture.supplyAsync(() => savedDelta.count())
      // In overlap mode linksN is not yet known while the link DAG is
      // built, so the links path is taken UNCONDITIONALLY (the linksN == 0
      // short-circuit only saves two tiny jobs on the final wave) — the
      // frontier job then launches concurrently with the agg and
      // saved-delta jobs instead of serializing behind the agg. Fused list
      // mode knows links ≡ 0 a priori; sequential (budget/limit) mode has
      // the exact count.
      val takeLinksPath = !fuseListWave && (overlapAgg || linksNSeq > 0)
      // partition-count hint only (a global index is value-identical at any
      // partitioning); overlap mode sizes by the wave's pop count
      val linksHint = if (aggFut != null) math.max(popN, 1L) * 16 else linksNSeq

      // ---- link expansion (only from rows at or before the cut) ----
      val linkSource =
        if (cutSeq != Long.MaxValue) processed.filter($"seq" <= cutSeq) else processed
      val linkCand = linkSource
        .select(explode($"links").as("l"), $"seq".as("parent_seq"))
        .select($"l.dst".as("url"), $"l.dstHost".as("host"), $"parent_seq", $"l.pos".as("pos"))

      // A2/U3: first discoverer owns the url → min (parent_seq, pos)
      val winnersAll = linkCand
        .groupBy($"url")
        .agg(
          min(struct($"parent_seq", $"pos")).as("ord"),
          first($"host").as("host"))
        .select($"url", $"host", $"ord.parent_seq".as("parent_seq"), $"ord.pos".as("pos"))

      // J3 multi-host: robots filtering as a broadcast ANTI-join against the
      // rules table — a blocked url never enters seen/frontier. (Same-host
      // mode filters inside extraction via the seed host's tiny rule set.)
      // The table-form trap and RFC 9309 gates chain here in the same
      // shape; all three are dst-keyed, so gating winners ≡ gating the raw
      // links (every discoverer of a blocked url drops together — depths
      // and the seen set are unchanged vs the kernel gate).
      val winners0 =
        if (robotsDf != null) robotsAntiJoin(winnersAll, robotsDf, robotsRows) else winnersAll
      val winners1 =
        if (trapGateDf != null) trapAntiJoin(winners0, trapGateDf, trapGateRows)
        else winners0
      val winners =
        if (rules9309GateDf != null)
          robots9309GateJoin(winners1, rules9309GateDf, rules9309GateRows)
        else winners1

      // J2 with sharded Bloom pre-filter: links cogroup with the segment
      // table on url-hash bucket (each task deserializes its one segment);
      // "definitely new" urls skip the anti-join, only Bloom-maybe urls
      // shuffle against the exact seen parts.
      var flaggedTmp: DataFrame = null
      val fresh =
        if (bloomSegs != null && takeLinksPath) {
          // persisted: both branches (definitely-new, maybe) consume it
          val flagged = probeSegs(spark, winners, bloomSegs, buckets, config.seenFilter)
            .persist(StorageLevel.MEMORY_AND_DISK)
          flaggedTmp = flagged
          val maybe = flagged.filter($"maybe_seen")
            .join(unionParts(spark, seenParts, frontier).select($"url"), Seq("url"), "left_anti")
          flagged.filter(!$"maybe_seen").unionByName(maybe).drop("maybe_seen")
        } else if (takeLinksPath) {
          winners.join(unionParts(spark, seenParts, frontier).select($"url"), Seq("url"), "left_anti")
        } else winners

      val newFrontier = (if (takeLinksPath) {
        val ordered = withGlobalIndexN(fresh, "idx", nParts(spark, linksHint),
          $"parent_seq".asc, $"pos".asc)
        if (config.hostWaveCap > 0 || config.hostWaveCaps.nonEmpty ||
          capsGateDf != null || priorityMode)
          // capped/priority waves pop mixed depths, so a new url's depth is
          // its FIRST discoverer's depth + 1 (the discoverer owning the min
          // (parent_seq, pos) — joined back from the popped wave, which is
          // cap/P-bounded and therefore broadcastable; a 10^10 frontier
          // shuffles this join on parent_seq instead)
          ordered.join(
            broadcast(waveFrontier.select($"seq".as("parent_seq"),
              ($"depth" + 1).as("ndepth"))), Seq("parent_seq"))
            .select($"url", $"host", $"ndepth".as("depth"),
              ($"idx" + lit(maxSeq + 1)).as("seq"))
        else
          ordered.select($"url", $"host", lit(depth + 1).as("depth"),
            ($"idx" + lit(maxSeq + 1)).as("seq"))
      } else {
        frontier.limit(0)
      }).localCheckpoint(false) // lazy: the count below materializes it (1 job)

      // the saved-delta (launched above), metrics agg (futured above) and
      // frontier snapshot are independent DAGs over the cached `processed`
      // — all three materialize as CONCURRENT jobs (the wave is
      // latency-bound; tasks interleave across idle cores)
      val frontFut = java.util.concurrent.CompletableFuture.supplyAsync(() =>
        newFrontier.count())
      val (fetchedOkW, matchedNW, linksN) =
        if (aggFut != null) aggFut.get() else (fetchedOkAgg, matchedNAgg, linksNSeq)
      val newN = timed(s"w$wave frontierCount")(frontFut.get())
      val dupDropped = linksN - newN // intra-wave dups + already-seen

      maxSeq += newN
      if (flaggedTmp != null) flaggedTmp.unpersist()

      // ---- join the concurrently-materialized saved delta ----
      val savedWaveN = timed(s"w$wave savedDelta")(savedFut.get())
      if (keptTmp != null) keptTmp.unpersist()
      savedTotal += savedWaveN
      savedParts :+= savedDelta
      // without --limit, every budget survivor was saved: savedWaveN IS the
      // survivor count (and equals matchedN when no budget is set either)
      val budgetKeptN = if (budgetKeptFromAgg >= 0) budgetKeptFromAgg else savedWaveN
      // fused wave: the saved count IS the ok count (no match patterns) and
      // the matched count — identical values to the skipped agg's
      val fetchedOk = if (fuseListWave) savedWaveN else fetchedOkW
      val matchedN = if (fuseListWave) savedWaveN else matchedNW
      val fetchErrors = popN - fetchedOk
      val skippedMatch = fetchedOk - matchedN
      val skippedBudget = matchedN - budgetKeptN
      val skippedLimit = budgetKeptN - savedWaveN
      if (hostCounts != null && savedWaveN > 0) {
        val prev = hostCounts
        hostCounts = hostCounts
          .unionByName(savedDelta.groupBy($"host").agg(count(lit(1)).as("cnt")))
          .groupBy($"host").agg(sum($"cnt").as("cnt"))
          .localCheckpoint(true)
        prev.unpersist()
      }

      metrics += WaveMetrics(wave, depth, popN, fetchedOk, fetchErrors, savedWaveN,
        skippedMatch, skippedBudget, skippedLimit, linksN, dupDropped, newN)

      // next wave's pending = fresh links ∪ rows the cap deferred. Only the
      // FRESH rows are a seen-delta (deferred urls entered seen at their
      // original enqueue wave) — but the checkpointed frontier table carries
      // the FULL pending so a resume repops the deferred rows too (resume's
      // seen reconstruction then holds them twice, which the anti-joins
      // don't care about).
      val nextFrontier =
        if (deferred != null) newFrontier.unionByName(deferred) else newFrontier

      // ---- checkpoint / lineage ----
      config.checkpointDir.foreach { dir =>
        val m = TableIO.Manifest(wave, depth + 1, maxSeq, savedTotal,
          stopped || (config.pageLimit > 0 && savedTotal >= config.pageLimit),
          stopReason)
        TableIO.writeWave(dir, wave,
          Map("frontier" -> nextFrontier, "saved_delta" -> savedDelta), m,
          metricsJson = Some(TableIO.waveMetricsJson(
            metrics.result().last,
            Map("frontier" -> (newN + deferredN), "saved_delta" -> savedWaveN),
            Map("frontier" -> TableIO.partitionCounts(newFrontier),
              "saved_delta" -> TableIO.partitionCounts(savedDelta)))))
      }

      // NOTE: the old frontier stays persisted — it is a seen part (its
      // cached data backs future anti-joins) until compaction releases it.
      if (!fuseListWave) processed.unpersist(): Unit
      frontier = nextFrontier
      popped = newN + deferredN
      seenParts :+= newFrontier
      seenSinceCompact += 1

      // ---- seen-side Bloom maintenance — strictly AFTER newFrontier joins
      // seenParts, so a filter (re)built here covers THIS wave's new urls
      // too (building one wave earlier would leave the engagement wave's
      // urls permanently absent: links to them would probe definitely-new,
      // skip the exact anti-join, and re-enter the frontier) ----
      if (bloomSegs != null && newN > 0) {
        if (maxSeq + 1 > bloomSegCap * buckets) {
          // seen set outgrew the generation's sizing → fpp would degrade
          // toward 1 (every probe falling through to the exact anti-join);
          // rebuild all segments at 2× the current seen count
          timed(s"w$wave bloomRebuild")(buildAllSegs(maxSeq + 1))
          bloomRebuilds += 1
        } else {
          // fold the wave's new urls into the segment table (one small job
          // on the already-checkpointed frontier; output is `buckets` rows)
          val prev = bloomSegs
          bloomSegs = timed(s"w$wave bloom")(
            mergeSegs(spark, bloomSegs,
              buildSegs(spark, newFrontier, buckets, bloomSegCap, config.seenFilter),
              config.seenFilter)
              .localCheckpoint(true))
          prev.unpersist()
        }
      } else maybeEngageBloom(maxSeq + 1)

      if (seenSinceCompact >= SeenCompactEvery) {
        // compact the parts union so the anti-join plan stays shallow
        val compacted = unionParts(spark, seenParts, frontier).localCheckpoint(true)
        seenParts.dropRight(1).foreach(_.unpersist())
        seenParts = Vector(compacted)
        seenSinceCompact = 1
      }

      depth += 1
      if (listMode) stopped = true // single wave: list mode never expands
      if (!stopped && config.pageLimit > 0 && savedTotal >= config.pageLimit) {
        // limit hit exactly at a wave boundary: the next pop would break
        stopped = true
        stopReason = s"Page limit reached (${config.pageLimit})"
      }
      } // cancel-check else
    }
    } finally {
      // restore the caller's AQE setting (the loop may have toggled it)
      if (config.aqeMinWaveRows > 0) aqeOriginal match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None    => spark.conf.unset(aqeKey)
      }
    }

    if (doCachePages) pagesSlim.unpersist()
    if (robotsDf != null) robotsDf.unpersist()
    if (trapGateDf != null) trapGateDf.unpersist()
    if (rules9309GateDf != null) rules9309GateDf.unpersist()
    if (capsGateDf != null) capsGateDf.unpersist()
    if (bloomSegs != null) bloomSegs.unpersist()
    val savedAll = unionParts(spark, savedParts, emptySaved(spark))
    val seenAll = unionParts(spark, seenParts, frontier) // frontier ∈ seenParts
    CrawlOutput(savedAll, seenAll, metrics.result(), stopReason, bloomRebuilds)
  }

  /** Native (Catalyst-pushable) prune of the pages scan to the seed's host.
    * Crawl mode never leaves the seed's hostname (reference
    * crawler.go:516-518), and the J1 join is an exact url equi-join, so the
    * corpus side only needs page rows whose url could equal a same-host
    * frontier url. A normalized url's authority is followed by `/` (path is
    * forced to "/" when empty) or `:` (port), so the four StartsWith
    * disjuncts are precise — `host0.test` never matches `host0.testx` — and
    * they reach the parquet scan as PushedFilters: foreign-host row groups
    * (url AND html bytes) are never read. Common-Crawl-style page keys are
    * canonical (no userinfo), so a frontier url outside this shape cannot
    * exist in the key space — pruning changes nothing for it.
    *
    * At 10^10 pages this is the difference between scanning one host's
    * row groups and decoding the whole web's html once per crawl.
    */
  def hostPrunePredicate(host: String): Column = {
    val prefixes =
      for (scheme <- Seq("http://", "https://"); delim <- Seq("/", ":"))
        yield col("url").startsWith(scheme + host + delim)
    prefixes.reduce(_ || _)
  }

  /** Robots rules scoped to the hosts the crawl can actually touch — never a
    * whole-table collect: at 10^8 hosts the full rule map is tens of GB, but
    * hosts-in-crawl ≪ total hosts. Crawl mode reaches exactly the seed's
    * host (links are same-host-filtered before the robots check), so the
    * semi-join degenerates to one host's rules; a future multi-host frontier
    * would pass the wave's distinct hosts here per wave.
    */
  private def loadRobots(spark: SparkSession, pages: DataFrame,
      hosts: Seq[String]): Map[String, Seq[String]] = {
    import spark.implicits._
    Option(loadRobotsDf(spark, pages)).map { df =>
      try df.filter($"host".isin(hosts: _*))
        .as[(String, String)].collect()
        .groupBy(_._1).map { case (h, rs) => h -> rs.map(_._2).toSeq }
      catch { case _: Throwable => Map.empty[String, Seq[String]] }
    }.getOrElse(Map.empty)
  }

  /** Rules-table row count above which [[robotsAntiJoin]] stops forcing the
    * broadcast hint. An explicit broadcast() wins over every size estimate,
    * so an unconditional hint would pin a tens-of-GB rules table (10^8
    * hosts) into the driver instead of letting the join shuffle — the exact
    * OOM the multi-host design doc promises away. One count() of the rules
    * table at crawl start pays for the gate.
    */
  val RobotsBroadcastMaxRows = 1000000L

  /** J3 in its multi-host scale shape: drop every discovered link whose
    * destination host has a rule whose disallow prefix matches the link's
    * path — an equi-join on host (hash-joinable) with the prefix test as a
    * native (codegen'd) post-condition. Never a driver-side rule map.
    * The broadcast hint is applied only while the rules table is small
    * (`rulesRows` ≤ [[RobotsBroadcastMaxRows]]); above that the hint is
    * dropped and Spark/AQE picks the shuffled LeftAnti — same plan shape,
    * no forced driver materialization.
    */
  /** Broadcast-hint a host-keyed gate table only while it is genuinely
    * small — the robotsAntiJoin discipline shared by every gate TABLE
    * (trap blocklist, parsed 9309 rules, politeness caps): a forced hint
    * on a 10^8-host table would pin tens of GB into the driver; above the
    * threshold Spark/AQE picks the shuffled join, same plan shape.
    */
  private[crawl] def gateHint(df: DataFrame, rows: Long): DataFrame =
    if (rows <= RobotsBroadcastMaxRows) broadcast(df) else df

  /** Trap gate, table form: drop links whose (host, digit-collapsed
    * template) is blocklisted — the template derived natively by the
    * documented SQL recipe (byte-identical to UrlNorm.templateOf, per its
    * scaladoc contract), so the gate is a codegen'd hash anti-join on
    * host with the template equality as post-condition.
    */
  private[crawl] def trapAntiJoin(links: DataFrame, trapDf: DataFrame,
      trapRows: Long = 0L): DataFrame = {
    val t = gateHint(trapDf, trapRows)
    links.join(t,
      links("host") === t("host") &&
        regexp_replace(
          regexp_extract(links("url"), "^https?://[^/]+(.*)$", 1),
          "[0-9]+", "N") === t("template"),
      "left_anti")
  }

  /** RFC 9309 gate, table form: links left-join the per-host aggregated
    * rule arrays (hash join on host; see the aggregation at crawl start),
    * then the SAME matcher the kernel gate runs evaluates longest-match
    * per link — rules compiled once per distinct host per task via a
    * small cache, never per row. A host with no rules is allowed (left
    * join null ⇒ keep). Input/output: (url, host, parent_seq, pos).
    */
  private[crawl] def robots9309GateJoin(links: DataFrame, rulesByHost: DataFrame,
      rulesRows: Long = 0L): DataFrame = {
    val spark = links.sparkSession
    import spark.implicits._
    links
      .join(gateHint(rulesByHost, rulesRows), Seq("host"), "left")
      .select($"url", $"host", $"parent_seq", $"pos", $"rules")
      .as[(String, String, Long, Int, Seq[(Long, String, String)])]
      .mapPartitions { it =>
        val cache = new java.util.HashMap[String, Array[Robots9309.CompiledRule]]()
        it.filter { case (url, host, _, _, rules) =>
          rules == null || rules.isEmpty || {
            var compiled = cache.get(host)
            if (compiled == null) {
              compiled = Robots9309.compile(rules.map(r => (r._2, r._3)))
              cache.put(host, compiled)
            }
            Robots9309.allowed(compiled, Robots9309.rawPathOf(url))
          }
        }.map(t => (t._1, t._2, t._3, t._4))
      }.toDF("url", "host", "parent_seq", "pos")
  }

  private[crawl] def robotsAntiJoin(links: DataFrame, robotsDf: DataFrame,
      rulesRows: Long = 0L): DataFrame = {
    val rules =
      if (rulesRows <= RobotsBroadcastMaxRows) broadcast(robotsDf) else robotsDf
    links.join(rules,
      links("host") === robotsDf("host") &&
        regexp_replace(links("url"), "^https?://[^/]*", "")
          .startsWith(robotsDf("disallow_prefix")),
      "left_anti")
  }

  /** The robots rules TABLE (host, disallow_prefix) — lives next to
    * pages.parquet when the corpus provides one; null when absent. The
    * multi-host crawl joins it directly (never a whole-table collect).
    */
  private def loadRobotsDf(spark: SparkSession, pages: DataFrame): DataFrame = {
    val loc = pages.inputFiles.headOption
      .map(f => f.substring(0, f.lastIndexOf("/pages.parquet")))
    loc.map { dir =>
      try spark.read.parquet(s"$dir/robots.parquet").select("host", "disallow_prefix")
      catch { case _: Throwable => null }
    }.orNull
  }

  private def normalizeOrThrow(u: String): String =
    UrlNorm.normalize(u).fold(e => throw new IllegalArgumentException(e), identity)
}
