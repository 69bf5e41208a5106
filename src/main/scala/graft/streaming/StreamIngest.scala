package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.extract.Processor

/** Structured-Streaming ingest: the crawl engine's extraction kernel as a
  * continuous pipeline over a landing directory of page files (the shape a
  * WARC-drop / fetch-fleet feed has at 100 TB: fetchers append files; the
  * extractor is a long-running incremental job).
  *
  * The reference has no streaming surface (SURVEY §2.10 — its state is one
  * process's memory); this is a north-rule scale extension that reuses the
  * SAME deterministic per-page kernel (graft.extract.Processor), so every
  * batch row matches the batch engine's output byte-for-byte — the spec
  * pins streamed markdown against the corpus generator's ground truth.
  *
  * Pieces:
  *   - [[pagesStream]]: `readStream.parquet` over `pages(url, warc_ts,
  *     html, text, lang)` (BASELINE.json input_hint) — file-source
  *     micro-batches, exactly-once per file.
  *   - [[extracted]]: typed mapPartitions running readability→markdown —
  *     narrow, stateless, scales with executors; identical code path to the
  *     wave crawler's matched-page extraction.
  *   - [[dedupedByUrl]]: streaming first-wins url dedup (A3 in streaming
  *     form) via dropDuplicates + event-time watermark, so the url-seen
  *     state is BOUNDED: a url re-fetched after the watermark lapses is
  *     treated as new (re-crawl semantics), everything inside it dedups
  *     exactly.
  *   - [[hostWindowCounts]]: watermarked sliding-window per-host throughput
  *     metrics (late pages beyond the watermark are dropped, state expires).
  *   - [[run]]: wires source → extract → dedup → append parquet sink with a
  *     checkpointLocation, the streaming analogue of the wave crawler's
  *     TableIO resume.
  */
object StreamIngest {

  /** BASELINE.json input_hint schema — readStream needs it explicitly
    * (streaming sources never infer).
    */
  val PagesSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  def pagesStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(PagesSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** The extraction kernel over a (streaming or batch) pages frame:
    * (url, warc_ts, host, title, markdown), empty/unparseable pages dropped
    * (P8 skip semantics). Pure narrow map — no shuffle, no state.
    */
  def extracted(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .select($"url", $"warc_ts", $"html")
      .as[(String, java.sql.Timestamp, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (url, ts, htmlBytes) =>
          val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
          if (html.trim.isEmpty) None
          else Processor.processHTML(url, html, "").toOption.map { pd =>
            (url, ts, graft.url.UrlNorm.hostnameOf(url), pd.title, pd.markdown)
          }
        }
      }
      .toDF("url", "warc_ts", "host", "title", "markdown")
  }

  /** Streaming first-wins dedup on url with bounded state: rows carry their
    * event time; urls older than the watermark age out of the state store.
    */
  def dedupedByUrl(extractedDf: DataFrame, watermark: String = "1 hour"): DataFrame =
    extractedDf
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("url")

  /** Per-host page counts over tumbling event-time windows; late data past
    * the watermark is dropped and window state expires (the streaming
    * analogue of the wave-metrics rollup A5).
    */
  def hostWindowCounts(pages: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame =
    pages
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowLen), col("host"))
      .agg(count(lit(1)).as("pages"))
      .select(col("window.start").as("win_start"), col("host"), col("pages"))

  /** Event-time sessionization of the fetch feed: per-host sessions of
    * consecutive pages with warc_ts gaps below `gap` — `session_window`,
    * the streaming-native gap window (state merges as events arrive,
    * watermark finalizes sessions). The SAME aggregation runs in batch
    * (Spark's session_window is mode-agnostic), which is what the driver
    * oracle checks: a session's page count and start are a pure function of
    * the event times, so batch output == the streaming query's fully
    * finalized output. Session END is last event + gap by definition —
    * reported as the last event time (end - gap) so the oracle is a plain
    * lag/cumsum segmentation.
    */
  def hostSessions(pages: DataFrame, gap: String = "30 minutes"): DataFrame =
    pages
      .groupBy(session_window(col("warc_ts"), gap), col("host"))
      .agg(count(lit(1)).as("n_pages"))
      .select(
        col("host"),
        col("session_window.start").as("session_start"),
        (col("session_window.end") - expr(s"INTERVAL $gap")).as("session_end"),
        col("n_pages"))

  /** Per-host custom streaming state for [[hostStateStats]]: running page
    * count and event-time bounds, maintained in the state store across
    * micro-batches.
    */
  final case class HostState(cnt: Long, minTs: Long, maxTs: Long)

  /** Arbitrary per-key state via `KeyValueGroupedDataset
    * .flatMapGroupsWithState` — the custom-state streaming surface the
    * other operators (dropDuplicates, window, session_window) don't
    * exercise, and the shape a 100 TB crawl uses for per-host politeness /
    * quota state that no built-in aggregate expresses.
    *
    * Each micro-batch updates a host's [[HostState]] (count, min/max
    * warc_ts) and emits the refreshed snapshot. The emitted LOG depends on
    * micro-batch boundaries (file order), but each host's final snapshot —
    * the row with its maximum count — is a pure function of the data, so
    * the driver reduces the log to that and the oracle is a plain GROUP BY
    * over pages. Works identically under Trigger.AvailableNow (backfill)
    * and a live trigger.
    */
  def hostStateStats(pages: DataFrame): org.apache.spark.sql.Dataset[(String, Long, Long, Long)] = {
    val spark = pages.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    pages
      .select($"url", $"warc_ts")
      .as[(String, java.sql.Timestamp)]
      .map { case (url, ts) => (graft.url.UrlNorm.hostnameOf(url), ts.getTime) }
      .groupByKey(_._1)
      .flatMapGroupsWithState[HostState, (String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { case (host, rows, state) =>
        var s = state.getOption.getOrElse(HostState(0L, Long.MaxValue, Long.MinValue))
        rows.foreach { case (_, t) =>
          s = HostState(s.cnt + 1, math.min(s.minTs, t), math.max(s.maxTs, t))
        }
        state.update(s)
        Iterator.single((host, s.cnt, s.minTs, s.maxTs))
      }
  }

  /** Streaming KMV state: the k smallest distinct url hashes seen so far
    * for one host ([[graft.functions.KMinValues]] buffers).
    */
  final case class KmvState(mins: Array[Long])

  /** md5-prefix 56-bit url hash — the EXACT recipe the batch sketch uses
    * (`conv(substring(md5(url), 1, 14), 16, 10)`), computed JVM-side so the
    * streaming state updates match the batch/oracle hash bit-for-bit.
    */
  def urlHash56(url: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(url.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 14 hex chars == first 7 bytes, big-endian
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Distinct-url cardinality per host as STREAMING state: a KMV sketch
    * lives in the state store per host, each micro-batch folds its urls in
    * and emits the refreshed (n_mins, estimate) snapshot — the
    * bounded-state streaming twin of `graph_host_distinct_kmv` (O(k) state
    * per host forever, vs dropDuplicates' unbounded url set).
    *
    * Emission order depends on micro-batch boundaries, but the sketch is a
    * pure set-of-k-smallest — order- and batching-independent — and the
    * estimate `(k−1)·M div h_(k)` is MONOTONE non-decreasing as smaller
    * hashes displace larger ones, so each host's final snapshot (max
    * estimate) equals the batch sketch over all its urls: that reduction is
    * what the driver row checks.
    */
  def hostDistinctKmv(pages: DataFrame,
      k: Int = graft.pipeline.HostGraph.KmvK): org.apache.spark.sql.Dataset[(String, Long, Long)] = {
    val spark = pages.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val m = graft.pipeline.HostGraph.KmvM
    pages
      .select($"url").as[String]
      .map(url => (graft.url.UrlNorm.hostnameOf(url), urlHash56(url)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[KmvState, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { case (host, rows, state) =>
        var mins = state.getOption.map(_.mins).getOrElse(Array.emptyLongArray)
        rows.foreach { case (_, h) => mins = graft.functions.KMinValues.insert(mins, h, k) }
        state.update(KmvState(mins))
        val est = if (mins.length < k) mins.length.toLong else (k - 1).toLong * m / mins(k - 1)
        Iterator.single((host, mins.length.toLong, est))
      }
  }

  /** Run [[hostDistinctKmv]] over a landing dir, appending the snapshot log
    * (Trigger.AvailableNow, checkpointed).
    */
  def runHostDistinct(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    hostDistinctKmv(pagesStream(spark, inDir))
      .toDF("host", "n_mins", "kmv_est")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Run [[hostStateStats]] over a landing dir and append the update log to
    * parquet (Trigger.AvailableNow, checkpointed — same resume shape as
    * [[run]]).
    */
  def runHostState(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    hostStateStats(pagesStream(spark, inDir))
      .toDF("host", "cnt", "min_ts", "max_ts")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Source → extract → dedup → append parquet, with checkpoint/resume.
    * Trigger.AvailableNow drains everything currently in the landing dir
    * then stops — the batch-friendly mode the specs (and a backfill) use; a
    * live deployment passes a processing-time trigger instead.
    */
  /** @param watermark how far event time may lag the stream's maximum
    *   before a page counts as late and is dropped by the dedup state.
    *   MUST exceed the feed's event-time disorder: micro-batches arrive in
    *   file order, not warc_ts order, so a watermark smaller than the
    *   fetch-fleet's timestamp spread silently discards the tail (a
    *   backfill over a 24 h corpus needs > 24 h; a live feed needs the
    *   fetcher lag bound).
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, availableNow: Boolean = true,
      watermark: String = "1 hour"): StreamingQuery = {
    val q = dedupedByUrl(extracted(pagesStream(spark, inDir)), watermark)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) q.trigger(Trigger.AvailableNow()) else q).start()
  }
}
