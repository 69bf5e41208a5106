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

  /** WARC revisit-record sink for a recrawl cycle (ISO 28500 §6.7 + the
    * IIPC WARC/1.0 `identical-payload-digest` revisit profile — public,
    * the mechanism behind Common Crawl / Wayback dedup storage): the new
    * cycle refetches every capture one day later; a page whose payload
    * digest is UNCHANGED becomes a `WARC-Type: revisit` record carrying no
    * payload (`Content-Length: 0`, `WARC-Refers-To-Target-URI`/`-Date`
    * naming the prior capture), and only genuinely changed pages get full
    * `response` records. On a standing recrawl where ~95% of pages are
    * stable this writes ~5% of the response bytes — the storage story that
    * makes continuous recrawling affordable.
    *
    * Scale shape: the record-type decision is one url-keyed equi-join of
    * the two snapshots with both digests computed scan-side (the payload
    * column feeds the record only on the changed branch); record assembly
    * stays a codegen'd column expression, replayed byte-for-byte by the
    * oracle. The change set itself is the deterministic donor edit of
    * [[graft.queries.CrawlQueries.recrawlChanged]] — and because the type
    * derives from DIGEST equality, not the edit list, an "edit" that
    * happens to reproduce identical bytes (two empty pages) correctly
    * collapses to a revisit on both the engine and the oracle side.
    */
  def revisitRecords(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val v1 = CorpusGen.pages(spark, dir)
    val changed = graft.queries.CrawlQueries.recrawlChanged(spark, sfDir)
    val j = v1.join(changed, Seq("url"), "left")
      .select(col("url"), col("warc_ts"),
        coalesce(col("donor_html"), col("html")).as("html2"), col("html"))
    val h = md5(concat(lit("rev:"), col("url")).cast("binary"))
    val recordId = concat(
      lit("<urn:uuid:"), substring(h, 1, 8), lit("-"), substring(h, 9, 4),
      lit("-"), substring(h, 13, 4), lit("-"), substring(h, 17, 4),
      lit("-"), substring(h, 21, 12), lit(">"))
    val fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    val date1 = date_format(col("warc_ts"), fmt)
    val date2 = date_format(col("warc_ts") + expr("INTERVAL 1 DAY"), fmt)
    val isRev = sha2(col("html2"), 256) === sha2(col("html"), 256)
    val recordType = when(isRev, lit("revisit")).otherwise(lit("response"))
    val head = concat(
      lit("WARC/1.0" + Crlf),
      lit("WARC-Type: "), recordType, lit(Crlf),
      lit("WARC-Record-ID: "), recordId, lit(Crlf),
      lit("WARC-Date: "), date2, lit(Crlf),
      lit("WARC-Target-URI: "), col("url"), lit(Crlf))
    val responseTail = concat(
      lit("Content-Type: text/html" + Crlf),
      lit("WARC-Block-Digest: sha256:"), sha2(col("html2"), 256), lit(Crlf),
      lit("Content-Length: "), octet_length(col("html2")).cast("string"), lit(Crlf),
      lit(Crlf),
      col("html2").cast("string"),
      lit(Crlf + Crlf))
    val revisitTail = concat(
      lit("WARC-Profile: http://netpreserve.org/warc/1.0/revisit/" +
        "identical-payload-digest" + Crlf),
      lit("WARC-Refers-To-Target-URI: "), col("url"), lit(Crlf),
      lit("WARC-Refers-To-Date: "), date1, lit(Crlf),
      lit("WARC-Payload-Digest: sha256:"), sha2(col("html2"), 256), lit(Crlf),
      lit("Content-Length: 0" + Crlf),
      lit(Crlf + Crlf))
    j.select(col("url"), recordType.as("record_type"),
      concat(head, when(isRev, revisitTail).otherwise(responseTail)).as("warc_record"))
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
