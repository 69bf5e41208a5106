package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Unit contract of the WARC/1.0 reader: Content-Length framing (payloads
  * containing record-delimiter look-alikes cannot desynchronise), header
  * field extraction, gap tolerance, truncation errors, and the distributed
  * write→read round-trip. The driver's crawl_warc_roundtrip /
  * crawl_warc_bfs queries pin the full-corpus inverse against DuckDB.
  */
class WarcReaderSpec extends AnyFunSuite {

  private def rec(warcType: String, url: String, payload: String,
      date: String = "2024-01-01T00:00:00Z"): String = {
    val n = payload.getBytes(UTF_8).length
    s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Record-ID: <urn:uuid:x>\r\n" +
      s"WARC-Date: $date\r\nWARC-Target-URI: $url\r\n" +
      s"Content-Type: text/html\r\nContent-Length: $n\r\n\r\n$payload\r\n\r\n"
  }

  test("two records parse byte-exactly, including a delimiter look-alike payload") {
    // payload contains the version magic AND blank CRLF lines — only the
    // Content-Length framing can carry the reader across it
    val evil = "a\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nz"
    val s = rec("response", "http://h/1", evil) + rec("conversion", "http://h/2", "tiny")
    val rs = WarcReader.records(new ByteArrayInputStream(s.getBytes(UTF_8))).toVector
    assert(rs.map(r => (r.warcType, r.url)) ==
      Vector(("response", "http://h/1"), ("conversion", "http://h/2")))
    assert(new String(rs(0).payload, UTF_8) == evil)
    assert(new String(rs(1).payload, UTF_8) == "tiny")
    assert(rs(0).warcDate == "2024-01-01T00:00:00Z")
  }

  test("utf-8 payloads frame by OCTET count, not char count") {
    val p = "héllo — ünïcode ≠ ascii"
    val rs = WarcReader.records(new ByteArrayInputStream(
      (rec("response", "http://h/u", p) + rec("response", "http://h/v", "x"))
        .getBytes(UTF_8))).toVector
    assert(rs.map(r => new String(r.payload, UTF_8)) == Vector(p, "x"))
  }

  test("extra blank lines between records and a trailing newline are tolerated") {
    val s = rec("response", "http://h/1", "a") + "\r\n\n\r\n" +
      rec("response", "http://h/2", "b") + "\n"
    val rs = WarcReader.records(new ByteArrayInputStream(s.getBytes(UTF_8))).toVector
    assert(rs.map(r => new String(r.payload, UTF_8)) == Vector("a", "b"))
  }

  test("empty stream yields no records; truncated payload/header throw") {
    assert(WarcReader.records(new ByteArrayInputStream(Array.empty[Byte])).isEmpty)
    val cut = rec("response", "http://h/1", "0123456789").dropRight(8)
    assertThrows[java.io.EOFException] {
      WarcReader.records(new ByteArrayInputStream(cut.getBytes(UTF_8))).toVector
    }
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n"
    assertThrows[java.io.EOFException] {
      WarcReader.records(new ByteArrayInputStream(noLen.getBytes(UTF_8))).toVector
    }
    val badMagic = "HTTP/1.1 200 OK\r\n\r\n"
    assertThrows[IllegalArgumentException] {
      WarcReader.records(new ByteArrayInputStream(badMagic.getBytes(UTF_8))).toVector
    }
  }

  test("zero-length revisit records frame correctly between full records") {
    // the shape Warc.revisitRecords emits for unchanged captures:
    // Content-Length: 0, refers-to fields, no payload octets
    val revisit =
      "WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Record-ID: <urn:uuid:r>\r\n" +
        "WARC-Date: 2024-01-02T00:00:00Z\r\nWARC-Target-URI: http://h/same\r\n" +
        "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n" +
        "WARC-Refers-To-Target-URI: http://h/same\r\n" +
        "WARC-Refers-To-Date: 2024-01-01T00:00:00Z\r\n" +
        "WARC-Payload-Digest: sha256:abc\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val s = rec("response", "http://h/a", "before") + revisit +
      rec("response", "http://h/b", "after")
    val rs = WarcReader.records(new ByteArrayInputStream(s.getBytes(UTF_8))).toVector
    assert(rs.map(r => (r.warcType, r.url, r.payload.length)) == Vector(
      ("response", "http://h/a", 6),
      ("revisit", "http://h/same", 0),
      ("response", "http://h/b", 5)))
  }

  test("distributed write→read round-trip preserves every record") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("warc-rt").toString
    val recs = (0 until 50).map(i =>
      rec(if (i % 5 == 0) "conversion" else "response", s"http://h/p$i",
        s"payload-$i " + ("x" * (i * 7 % 91))))
    WarcReader.writeWarc(
      spark.sparkContext.parallelize(recs, 4).toDF("warc_record"), dir)
    val back = WarcReader.readRecords(spark, dir)
    assert(back.count() == 50)
    val pages = WarcReader.readPages(spark, dir)
      .select(col("url"), col("html").cast("string"))
      .as[(String, String)].collect().toMap
    assert(pages.size == 40, "conversion records filtered out")
    assert(pages("http://h/p1") == "payload-1 " + ("x" * 7))
    // empty partitions must not break the reader
    val dir2 = Files.createTempDirectory("warc-rt2").toString
    WarcReader.writeWarc(
      spark.sparkContext.parallelize(recs.take(2), 8).toDF("warc_record"), dir2)
    assert(WarcReader.readRecords(spark, dir2).count() == 2)
  }
}
