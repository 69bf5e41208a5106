package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.corpus.{CorpusGen, CorpusSpec}

/** Structured-Streaming ingest over landing-directory micro-batches: the
  * streamed extraction must equal the batch kernel byte-for-byte (corpus
  * markdown ground truth), the url dedup must be first-wins across batches,
  * and a restarted query must resume from its checkpoint without
  * re-emitting.
  */
class StreamIngestSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val spec = CorpusSpec(nHosts = 2, totalPages = 40, seed = 11L)

  /** Write the corpus pages as N parquet files into a landing dir (each file
    * = one fetch-fleet drop), returning (landingDir, pageCount).
    */
  private def landing(batches: Int): (String, Long) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftstream").toString
    val rows = for {
      h <- 0 until spec.nHosts
      i <- 0 until spec.hostSizes(h)
    } yield CorpusGen.pageRow(spec, h, i)
    rows.grouped(math.max(1, rows.size / batches)).zipWithIndex.foreach {
      case (chunk, k) =>
        chunk.toDS().coalesce(1).write.parquet(s"$dir/drop$k.parquet")
    }
    (dir, rows.size.toLong)
  }

  test("streamed extraction equals the batch kernel and the ground truth") {
    // 12 files / maxFilesPerTrigger=4 → multiple micro-batches, so the
    // watermark genuinely advances between batches; warc_ts spans 24 h in
    // FILE order (not time order), so the dedup watermark must exceed the
    // disorder — the parity contract the 48 h setting encodes
    val (in, _) = landing(batches = 12)
    val out = java.nio.file.Files.createTempDirectory("graftstreamout").toString
    val ck = java.nio.file.Files.createTempDirectory("graftstreamck").toString
    val q = StreamIngest.run(spark, s"$in/*.parquet/*.parquet", s"$out/docs", s"$ck/docs",
      watermark = "48 hours")
    q.awaitTermination()

    val got = spark.read.parquet(s"$out/docs")
      .select("url", "markdown").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // every non-empty page extracted exactly once, byte-equal to the truth
    val expected = (for {
      h <- 0 until spec.nHosts
      i <- 0 until spec.hostSizes(h)
      if !CorpusGen.isEmptyPage(spec, h, i)
    } yield CorpusGen.pageUrl(h, i) -> CorpusGen.expectedMarkdown(spec, h, i)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, md) => assert(got(u) == md, s"markdown drift for $u") }
  }

  test("restart resumes from the checkpoint without re-emitting") {
    val (in, _) = landing(batches = 2)
    val out = java.nio.file.Files.createTempDirectory("graftstreamout2").toString
    val ck = java.nio.file.Files.createTempDirectory("graftstreamck2").toString
    val src = s"$in/*.parquet/*.parquet"
    StreamIngest.run(spark, src, s"$out/docs", s"$ck/docs").awaitTermination()
    val n1 = spark.read.parquet(s"$out/docs").count()
    // second run over the SAME landing dir: all files already committed in
    // the checkpoint — nothing new to emit
    StreamIngest.run(spark, src, s"$out/docs", s"$ck/docs").awaitTermination()
    val n2 = spark.read.parquet(s"$out/docs").count()
    assert(n1 == n2, s"resume re-emitted rows: $n1 -> $n2")
    assert(n1 > 0)
  }

  test("a watermark smaller than the feed's event-time disorder drops late pages") {
    val (in, total) = landing(batches = 12)
    val out = java.nio.file.Files.createTempDirectory("graftstreamout3").toString
    val ck = java.nio.file.Files.createTempDirectory("graftstreamck3").toString
    // warc_ts spans ~24 h across unordered files: a 1-minute watermark
    // classifies most of each later batch as late → silently dropped.
    // This is the designed semantics (bounded state) and exactly why the
    // parity query must size the watermark to the feed's disorder.
    StreamIngest.run(spark, s"$in/*.parquet/*.parquet", s"$out/docs", s"$ck/docs",
      watermark = "1 minute").awaitTermination()
    val n = spark.read.parquet(s"$out/docs").count()
    assert(n < total, s"expected late-dropping under a tiny watermark, got $n of $total")
  }

  test("flatMapGroupsWithState host stats: final snapshot equals the batch aggregate") {
    import spark.implicits._
    val (in, _) = landing(batches = 12)
    val out = java.nio.file.Files.createTempDirectory("graftstateout").toString
    val ck = java.nio.file.Files.createTempDirectory("graftstateck").toString
    StreamIngest.runHostState(spark, s"$in/*.parquet/*.parquet",
      s"$out/log", s"$ck/log").awaitTermination()
    val log = spark.read.parquet(s"$out/log")
    // the state genuinely survived micro-batch boundaries: hosts span many
    // drops, so the update log holds MULTIPLE snapshots per host
    assert(log.count() > log.select("host").distinct().count(),
      "expected per-batch snapshots, got one row per host (state not exercised)")
    val finalSnap = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("host")).orderBy(col("cnt").desc)
      log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("host", "cnt", "min_ts", "max_ts")
        .as[(String, Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    }
    val expected = (for {
      h <- 0 until spec.nHosts
      i <- 0 until spec.hostSizes(h)
    } yield {
      val ts = CorpusGen.pageRow(spec, h, i).warc_ts.getTime
      CorpusGen.hostName(h) -> ts
    }).groupBy(_._1).map { case (host, xs) =>
      host -> (xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max)
    }
    assert(finalSnap == expected)
  }

  test("streaming KMV: hash recipe matches the batch sketch, estimate monotone, final == batch") {
    import spark.implicits._
    // JVM-side urlHash56 must equal the batch/oracle conv(md5) recipe
    val urls = (0 until 50).map(i => s"http://kmv$i.test/p/$i")
    val sparkHashes = urls.toDF("url")
      .select(expr("CAST(conv(substring(md5(url), 1, 14), 16, 10) AS BIGINT)"))
      .as[Long].collect()
    urls.zip(sparkHashes).foreach { case (u, h) =>
      assert(StreamIngest.urlHash56(u) == h, s"hash drift for $u")
    }
    val (in, _) = landing(batches = 12)
    val out = java.nio.file.Files.createTempDirectory("graftkmvout").toString
    val ck = java.nio.file.Files.createTempDirectory("graftkmvck").toString
    StreamIngest.runHostDistinct(spark, s"$in/*.parquet/*.parquet",
      s"$out/log", s"$ck/log").awaitTermination()
    val log = spark.read.parquet(s"$out/log")
      .as[(String, Long, Long)].collect()
    // multiple snapshots per host (state crossed micro-batches), and the
    // final estimate per host equals the batch sketch over all its urls
    assert(log.length > log.map(_._1).distinct.length)
    val k = graft.pipeline.HostGraph.KmvK
    val m = graft.pipeline.HostGraph.KmvM
    val expected = (for {
      h <- 0 until spec.nHosts
      i <- 0 until spec.hostSizes(h)
    } yield (CorpusGen.hostName(h), StreamIngest.urlHash56(CorpusGen.pageUrl(h, i))))
      .groupBy(_._1).map { case (host, xs) =>
        val mins = xs.map(_._2).distinct.sorted.take(k)
        val est = if (mins.length < k) mins.length.toLong else (k - 1).toLong * m / mins(k - 1)
        host -> (mins.length.toLong, est)
      }
    val got = log.groupBy(_._1).map { case (host, snaps) =>
      host -> (snaps.map(_._2).max, snaps.map(_._3).max)
    }
    assert(got == expected)
  }

  test("session_window streaming emission: finalized sessions equal the batch run") {
    import spark.implicits._
    // a TIME-ORDERED landing: session finalization in append mode needs the
    // feed to arrive in (rough) event-time order — an out-of-order drop set
    // races the watermark past later files and drops them as late (that
    // semantics is pinned by the late-drop test above; a real fetch fleet
    // emits roughly time-ordered drops)
    val in = java.nio.file.Files.createTempDirectory("graftstreamsess").toString
    val rows = (for {
      h <- 0 until spec.nHosts
      i <- 0 until spec.hostSizes(h)
    } yield CorpusGen.pageRow(spec, h, i)).sortBy(_.warc_ts.getTime)
    rows.grouped(math.max(1, rows.size / 8)).zipWithIndex.foreach { case (chunk, k) =>
      chunk.toDS().coalesce(1).write.parquet(f"$in/drop$k%03d.parquet")
    }
    val src = s"$in/*.parquet/*.parquet"
    def withHost(df: org.apache.spark.sql.DataFrame) =
      df.select(graft.pipeline.HostGraph.hostOf(col("url")).as("host"), col("warc_ts"))

    val batchSessions = StreamIngest.hostSessions(
      withHost(spark.read.parquet(src)), gap = "3 minutes")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    val maxTs = spark.read.parquet(src).agg(max(col("warc_ts")))
      .head().getTimestamp(0).getTime

    // streaming: watermark finalizes a session once it trails the max event
    // time by delay; AvailableNow drains all files then advances the final
    // watermark in a no-data batch
    val stream = spark.readStream.schema(StreamIngest.PagesSchema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = StreamIngest.hostSessions(
      withHost(stream).withWatermark("warc_ts", "1 second"), gap = "3 minutes")
      .writeStream.format("memory").queryName("sess_stream").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sess_stream")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet

    assert(streamed.nonEmpty)
    // every emitted session is byte-identical to a batch session …
    assert(streamed.subsetOf(batchSessions),
      s"streaming emitted sessions absent from batch: ${streamed -- batchSessions}")
    // … and every session safely older than the final watermark was emitted
    // (wide margin dodges the exact window-close boundary semantics)
    val margin = 3 * 60 * 1000L + 61 * 1000L // gap + delay + 1 min headroom
    val mustEmit = batchSessions.filter(_._3.getTime + margin < maxTs - 60000L)
    assert(mustEmit.nonEmpty && mustEmit.subsetOf(streamed),
      s"finalized sessions missing from the stream: ${mustEmit -- streamed}")
  }

  test("windowed per-host counts respect event-time windows") {
    import spark.implicits._
    val (in, total) = landing(batches = 2)
    val pages = spark.read.parquet(s"$in/*.parquet/*.parquet")
      .withColumn("host", regexp_replace(regexp_replace($"url", "^http://", ""), "/.*$", ""))
    // batch-run the same windowed aggregation (streaming parity: identical
    // plan semantics, watermark only bounds state)
    val counts = StreamIngest.hostWindowCounts(pages).collect()
    assert(counts.map(_.getLong(2)).sum == total)
    // window starts align to the 10-minute grid
    counts.foreach { r =>
      val ts = r.getTimestamp(0).getTime
      assert(ts % (10L * 60 * 1000) == 0)
    }
  }
}
