package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/1.0 reader SOURCE (ISO 28500 / IIPC warc-specifications — public):
  * the inverse of [[graft.sinks.Warc.warcRecords]], closing the I/O
  * round-trip `read(write(pages)) ≡ pages`. A real Common-Crawl-shaped
  * pipeline's INPUT is warc files, not a pre-built parquet table — this is
  * the ingestion step in front of everything else the engine does.
  *
  * Framing: records are parsed by `Content-Length` octet counts, never by
  * scanning for delimiters — a payload containing the literal bytes
  * `WARC/1.0` cannot desynchronise the reader. Between records any number
  * of blank lines is skipped (the spec's two CRLFs, or a text-writer's
  * trailing newline).
  *
  * Scale shape: parallelism is per FILE (`sc.binaryFiles`), matching how
  * WARC is distributed in practice — many ~1 GB members, each internally
  * sequential (gzip members are not splittable either; Common Crawl ships
  * ~10^5 files per snapshot, far exceeding any cluster's core count). Each
  * task parses its stream INCREMENTALLY — one record in memory at a time,
  * never the whole file.
  */
object WarcReader {

  /** One parsed record: the named fields the engine consumes + raw payload
    * octets (exactly `Content-Length` of them).
    */
  final case class WarcRecord(
      warcType: String, url: String, warcDate: String, payload: Array[Byte])

  /** Streaming record iterator over one WARC stream. The stream is closed
    * at EOF (the only way a flatMap consumer leaves it open is an
    * exception, which fails the task anyway).
    */
  def records(in0: InputStream): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private val in = new BufferedInputStream(in0, 1 << 16)
    private var nextRec: WarcRecord = _
    private var done = false

    /** One header line: bytes to '\n' (headers are ASCII by spec), the
      * trailing '\r' stripped; null at EOF.
      */
    private def readLine(): String = {
      var b = in.read()
      if (b < 0) return null
      val sb = new java.lang.StringBuilder(64)
      while (b >= 0 && b != '\n') { sb.append(b.toChar); b = in.read() }
      var n = sb.length
      if (n > 0 && sb.charAt(n - 1) == '\r') n -= 1
      sb.substring(0, n)
    }

    private def advance(): Unit = {
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine() // record gap
      if (line == null) { done = true; in.close(); return }
      if (line != "WARC/1.0")
        throw new IllegalArgumentException(s"bad WARC version line: '$line'")
      var warcType, url, date = ""
      var len = -1L
      var h = readLine()
      while (h != null && h.nonEmpty) {
        val c = h.indexOf(':')
        if (c > 0) {
          val k = h.substring(0, c).trim.toLowerCase
          val v = h.substring(c + 1).trim
          k match {
            case "warc-type"       => warcType = v
            case "warc-target-uri" => url = v
            case "warc-date"       => date = v
            case "content-length"  => len = v.toLong
            case _                 => // other named fields: not consumed
          }
        }
        h = readLine()
      }
      if (h == null || len < 0)
        throw new EOFException("truncated WARC record header block")
      if (len > Int.MaxValue - 16)
        throw new IllegalArgumentException(s"record payload too large: $len")
      val payload = new Array[Byte](len.toInt)
      var off = 0
      while (off < payload.length) {
        val n = in.read(payload, off, payload.length - off)
        if (n < 0) throw new EOFException(
          s"truncated WARC payload: got $off of $len octets")
        off += n
      }
      nextRec = WarcRecord(warcType, url, date, payload)
    }

    override def hasNext: Boolean = {
      if (!done && nextRec == null) advance()
      !done
    }
    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException("end of WARC stream")
      val r = nextRec; nextRec = null; r
    }
  }

  /** All records under `dir` as a DataFrame. One task per file; each file
    * streamed record-at-a-time (PortableDataStream opens lazily on the
    * executor — the driver never touches payload bytes).
    */
  def readRecords(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    spark.sparkContext.binaryFiles(s"$dir/part-*.warc")
      .flatMap { case (_, pds) =>
        records(pds.open()).map(r => (r.warcType, r.url, r.warcDate, r.payload))
      }.toDF("warc_type", "url", "warc_date", "html")
  }

  /** `WARC-Type: response` captures as a crawlable pages table — the same
    * (url, html binary) shape [[graft.crawl.WaveCrawler.crawl]] consumes,
    * so a crawl can run straight off warc input.
    */
  def readPages(spark: SparkSession, dir: String): DataFrame =
    readRecords(spark, dir)
      .filter(col("warc_type") === "response")
      .select(col("url"), col("warc_date"), col("html"))

  /** Byte-exact executor-side write: one `.warc` file per partition of a
    * single-string-column DataFrame of records, no driver assembly and no
    * text-writer newline mangling. File names are partition-determined, so
    * a task retry overwrites its own file (idempotent). At scale this is a
    * distributed binary sink exactly like Hadoop's, minus the commit
    * protocol the sandbox's local FS doesn't need.
    */
  def writeWarc(recs: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val c = recs.columns.head
    recs.select(col(c)).foreachPartition { (it: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      val path = java.nio.file.Paths.get(dir, f"part-$pid%05d.warc")
      val out = new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(path), 1 << 16)
      try it.foreach(r => out.write(r.getString(0).getBytes(UTF_8)))
      finally out.close()
    }
  }
}
