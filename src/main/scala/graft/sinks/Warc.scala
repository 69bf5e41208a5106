package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen

/** WARC/1.0 response-record sink (ISO 28500 / IIPC warc-specifications —
  * public) — the Common-Crawl-native output format for a fetched-page
  * corpus. Each page becomes one `WARC-Type: response` record:
  *
  * {{{
  * WARC/1.0\r\n
  * <named-fields, one per line>\r\n
  * \r\n
  * <block: the raw fetched payload>\r\n\r\n
  * }}}
  *
  * Concatenating the per-page records (ordered by url) yields a valid
  * `.warc` member stream; at scale each output partition is one gzip
  * member file, written with `write.text` — no driver-side assembly.
  *
  * Everything is a pure codegen'd column expression: the record id is a
  * UUID-shaped md5 of the target URI (deterministic — a re-crawl of the
  * same capture reproduces the same id), the block digest is labeled
  * sha-256 hex (the spec's digest field is algorithm-labeled; Common
  * Crawl uses base32 sha1, which neither engine exposes), and
  * Content-Length counts payload BYTES. The DuckDB oracle rebuilds every
  * record byte-for-byte.
  */
object Warc {

  val Crlf = "\r\n"

  /** (url, warc_record) for every corpus page, exact strings. */
  def warcRecords(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val h = md5(col("url").cast("binary"))
    val recordId = concat(
      lit("<urn:uuid:"), substring(h, 1, 8), lit("-"), substring(h, 9, 4),
      lit("-"), substring(h, 13, 4), lit("-"), substring(h, 17, 4),
      lit("-"), substring(h, 21, 12), lit(">"))
    // session TZ is UTC (Verify/Main set it), so the printed instant is
    // the stored one — same naive value the oracle's strftime prints
    val date = date_format(col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    val record = concat(
      lit("WARC/1.0" + Crlf),
      lit("WARC-Type: response" + Crlf),
      lit("WARC-Record-ID: "), recordId, lit(Crlf),
      lit("WARC-Date: "), date, lit(Crlf),
      lit("WARC-Target-URI: "), col("url"), lit(Crlf),
      lit("Content-Type: text/html" + Crlf),
      lit("WARC-Block-Digest: sha256:"), sha2(col("html"), 256), lit(Crlf),
      lit("Content-Length: "), octet_length(col("html")).cast("string"), lit(Crlf),
      lit(Crlf),
      col("html").cast("string"),
      lit(Crlf + Crlf))
    CorpusGen.pages(spark, dir).select(col("url"), record.as("warc_record"))
  }

  /** WET sibling of [[warcRecords]]: `WARC-Type: conversion` records whose
    * payload is the ENGINE'S extracted markdown (the full
    * readability→markdown kernel runs per page), which the oracle rebuilds
    * from the generator's encode-side ground truth — so this sink is an
    * end-to-end extraction+formatting check, not just string assembly.
    * Text corpora distributed as WET (e.g. Common Crawl's) have exactly
    * this shape.
    */
  def wetRecords(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val md = graft.queries.CrawlQueries.extractMarkdown(spark, sfDir)
    val withTs = CorpusGen.pages(spark, dir)
      .select(col("url"), col("warc_ts")).join(md, Seq("url"))
    val h = md5(concat(lit("conv:"), col("url")).cast("binary"))
    val recordId = concat(
      lit("<urn:uuid:"), substring(h, 1, 8), lit("-"), substring(h, 9, 4),
      lit("-"), substring(h, 13, 4), lit("-"), substring(h, 17, 4),
      lit("-"), substring(h, 21, 12), lit(">"))
    val date = date_format(col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    val record = concat(
      lit("WARC/1.0" + Crlf),
      lit("WARC-Type: conversion" + Crlf),
      lit("WARC-Record-ID: "), recordId, lit(Crlf),
      lit("WARC-Date: "), date, lit(Crlf),
      lit("WARC-Target-URI: "), col("url"), lit(Crlf),
      lit("Content-Type: text/plain" + Crlf),
      lit("WARC-Block-Digest: sha256:"), sha2(col("markdown").cast("binary"), 256), lit(Crlf),
      lit("Content-Length: "), octet_length(col("markdown")).cast("string"), lit(Crlf),
      lit(Crlf),
      col("markdown"),
      lit(Crlf + Crlf))
    withTs.select(col("url"), record.as("wet_record"))
  }

  /** CDX-style capture index over the corpus — one row per capture with
    * the SURT key (Sort-friendly URI Reordering Transform, the Internet
    * Archive / Common Crawl index key: reversed host labels + `)` +
    * path), the 14-digit capture timestamp, and the payload digest/length.
    * Range scans over a host's captures become prefix scans of the sorted
    * key space; at scale this is the index-build job that Common Crawl's
    * cdx shards come from (sort by surt_key, ts14 → range-partitioned
    * write).
    */
  def cdxIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val host = regexp_extract(col("url"), "^https?://([^/]+)", 1)
    val path = regexp_replace(col("url"), "^https?://[^/]+", "")
    val surt = concat(
      array_join(reverse(split(host, "\\.")), ","), lit(")"), path)
    CorpusGen.pages(spark, dir).select(
      surt.as("surt_key"),
      date_format(col("warc_ts"), "yyyyMMddHHmmss").as("ts14"),
      col("url"),
      sha2(col("html"), 256).as("digest"),
      octet_length(col("html")).cast("long").as("n_bytes"))
  }
}
