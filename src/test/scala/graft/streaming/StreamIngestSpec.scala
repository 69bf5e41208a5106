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
