package graft.app

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.crawl.{CrawlConfig, CrawlOutput, WaveCrawler}
import graft.sinks.Sinks

/** spark-submit entry point mirroring the reference CLI
  * (/root/reference/cmd/scrape.go:52-66, cmd/root.go:60-71):
  *
  *   spark-submit --class graft.app.Main <jar> \
  *     --pages <pages.parquet dir or sf dir> \
  *     [seed-url] [--url-file f] [--match|-m g]... [--follow-match g]... \
  *     [--limit N] [--content-selector css] \
  *     [--output-format|-f xml-like|json|jsonl] [--outfile|-o path] \
  *     [--output-dir dir] [--silent] [--version] \
  *     [--host-budget N] [--robots] [--all-hosts] [--checkpoint dir] [--resume]
  *
  * Flag semantics match the reference: --match gates saving (never
  * crawling), --follow-match gates link expansion (ignored in list mode,
  * README.md:109), --limit is the global saved-page budget with
  * FIFO-prefix-cut semantics (crawler.go:326-330), SIGINT stops after the
  * current wave and still emits output + summary (scraping_handler.go:180-186,
  * integration_test.go:278-332). --host-budget/--robots/--all-hosts/
  * --checkpoint/--output-dir are the north-rule scale additions
  * (--all-hosts = multi-host Common-Crawl-shaped frontier; the reference is
  * strictly same-host).
  *
  * Output paths never materialize the full payload on the driver:
  * single-file/stdout emission streams partition-at-a-time through
  * toLocalIterator (reference parity — one ordered file); --output-dir does
  * a fully distributed ordered write.text for crawl outputs too large for
  * any single file.
  */
object Main {

  val Version = "sitepandaspark 0.2.0 (sitepanda-compatible Spark crawl engine)"

  final case class Args(
      pages: String = "",
      seed: String = "",
      urlFile: String = "",
      matches: Vector[String] = Vector.empty,
      follows: Vector[String] = Vector.empty,
      limit: Int = 0,
      selector: String = "",
      format: String = "xml-like",
      outfile: String = "",
      outputDir: String = "",
      silent: Boolean = false,
      version: Boolean = false,
      hostBudget: Int = 0,
      robots: Boolean = false,
      allHosts: Boolean = false,
      checkpoint: String = "",
      resume: Boolean = false)

  def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case Nil => acc
    case "--pages" :: v :: rest => parse(rest, acc.copy(pages = v))
    case "--url-file" :: v :: rest => parse(rest, acc.copy(urlFile = v))
    case ("--match" | "-m") :: v :: rest => parse(rest, acc.copy(matches = acc.matches :+ v))
    case "--follow-match" :: v :: rest => parse(rest, acc.copy(follows = acc.follows :+ v))
    case "--limit" :: v :: rest => parse(rest, acc.copy(limit = v.toInt))
    case "--content-selector" :: v :: rest => parse(rest, acc.copy(selector = v))
    case ("--output-format" | "-f" | "--format") :: v :: rest =>
      parse(rest, acc.copy(format = v))
    case ("--outfile" | "-o" | "--output") :: v :: rest => parse(rest, acc.copy(outfile = v))
    case "--output-dir" :: v :: rest => parse(rest, acc.copy(outputDir = v))
    case "--silent" :: rest => parse(rest, acc.copy(silent = true))
    case "--version" :: rest => parse(rest, acc.copy(version = true))
    case "--host-budget" :: v :: rest => parse(rest, acc.copy(hostBudget = v.toInt))
    case "--robots" :: rest => parse(rest, acc.copy(robots = true))
    case "--all-hosts" :: rest => parse(rest, acc.copy(allHosts = true))
    case "--checkpoint" :: v :: rest => parse(rest, acc.copy(checkpoint = v))
    case "--resume" :: rest => parse(rest, acc.copy(resume = true))
    case seed :: rest if !seed.startsWith("-") && acc.seed.isEmpty =>
      parse(rest, acc.copy(seed = seed))
    case other :: _ => throw new IllegalArgumentException(s"unknown argument: $other")
  }

  private def normFormat(f: String): String = f match {
    case "xml" | "xml-like" => "xml-like"
    case "json" | "jsonl"   => f
    case other => throw new IllegalArgumentException(
      s"invalid output format: $other (xml-like, json, jsonl)")
  }

  /** One formatted string per page, computed on executors, in save order. */
  def formattedRows(saved: DataFrame, format: String): DataFrame = {
    val f = format match {
      case "jsonl" => udf((t: String, u: String, m: String) => Sinks.jsonlLine(t, u, m))
      case "json"  => udf((t: String, u: String, m: String) => Sinks.jsonItem(t, u, m))
      case _       => udf((t: String, u: String, m: String) => Sinks.pageAsXmlLike(t, u, m))
    }
    saved.orderBy(col("depth"), col("seq"))
      .select(f(col("title"), col("url"), col("markdown")).as("row"))
  }

  /** Stream rows to a sink with format framing — partition-at-a-time via
    * toLocalIterator, never the whole payload in driver memory.
    */
  def streamOut(rows: Iterator[String], format: String, out: OutputStream): Unit = {
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
    format match {
      case "jsonl" => rows.foreach(r => w(r + "\n"))
      case "json" =>
        var first = true
        rows.foreach { r =>
          w(if (first) "[\n" else ",\n"); first = false; w(r)
        }
        w(if (first) "[]" else "\n]")
      case _ =>
        var first = true
        rows.foreach { r =>
          if (!first) w("\n\n")
          first = false; w(r)
        }
    }
    out.flush()
  }

  /** Validate the arg combination and resolve the output format (pure —
    * called before any SparkSession exists so a bad CLI fails fast).
    */
  def validateFormat(args: Args): String = {
    require(args.pages.nonEmpty, "--pages <dir> is required (the corpus table)")
    require(args.seed.nonEmpty ^ args.urlFile.nonEmpty,
      "exactly one of <seed-url> or --url-file is required")
    val format = normFormat(args.format)
    // a sharded write cannot produce one valid JSON array (no cross-shard
    // brackets/commas); jsonl shards are self-framing and xml-like shards
    // get per-block framing in run() — json must go through --outfile/stdout
    require(!(args.outputDir.nonEmpty && format == "json"),
      "--output-dir cannot emit a single JSON array across shards; " +
        "use -f jsonl with --output-dir, or --outfile for one json file")
    format
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toList)
    if (args.version) { println(Version); return }
    validateFormat(args)

    val spark = SparkSession.builder()
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    try run(args, spark)
    finally spark.stop()
  }

  /** The whole post-session pipeline — separated from main() so tests drive
    * it against the shared test session (main() stops its session).
    */
  def run(args: Args, spark: SparkSession): Unit = {
    val format = validateFormat(args)
    spark.sparkContext.setLogLevel(if (args.silent) "ERROR" else "WARN")
    import spark.implicits._

    val pages =
      if (new java.io.File(s"${args.pages}/pages.parquet").exists())
        CorpusGen.pages(spark, args.pages)
      else spark.read.parquet(args.pages)

    // scalable url-file source (SURVEY §2.1 S2): distributed read + stable
    // line numbers; a 10^10-line file never passes through the driver
    val urlListDf =
      if (args.urlFile.nonEmpty)
        Some(spark.read.textFile(args.urlFile).rdd.zipWithIndex()
          .toDF("url_raw", "line_no"))
      else None

    // SIGINT/SIGTERM → cooperative cancel: the wave loop stops before the
    // next wave; saved pages still reach the sink (reference
    // integration_test.go:278-332 "Pages Saved: 1" after SIGINT)
    val cancelFlag = new AtomicBoolean(false)
    installSignalHandlers(cancelFlag)

    val config = CrawlConfig(
      startUrl = args.seed,
      urlListDf = urlListDf,
      isUrlListMode = args.urlFile.nonEmpty,
      cancelled = () => cancelFlag.get(),
      pageLimit = args.limit,
      matchPatterns = args.matches,
      followPatterns = args.follows,
      contentSelector = args.selector,
      hostPageBudget = args.hostBudget,
      useRobots = args.robots,
      sameHostOnly = !args.allHosts,
      checkpointDir = if (args.checkpoint.nonEmpty) Some(args.checkpoint) else None)

    val out: CrawlOutput =
      if (args.resume) WaveCrawler.resume(spark, pages, config)
      else WaveCrawler.crawl(spark, pages, config)

    val savedCount = out.saved.count()
    var outfileError: Option[String] = None

    // S7 gate: nothing is written when no pages were saved (crawler.go:424)
    if (savedCount > 0) {
      val rows = formattedRows(out.saved, format)
      if (args.outputDir.nonEmpty) {
        // scale path: distributed ordered write (one ordered shard set).
        // xml-like blocks carry a trailing blank line each so concatenating
        // the shards reproduces the single-file "\n\n" block separation
        // (modulo one trailing blank line); jsonl rows are self-framing.
        val framed =
          if (format == "xml-like") rows.select(concat(col("row"), lit("\n")).as("row"))
          else rows
        framed.write.mode("overwrite").text(args.outputDir)
      } else if (args.outfile.nonEmpty) {
        try {
          val os = new BufferedOutputStream(new FileOutputStream(args.outfile), 1 << 16)
          try streamOut(rows.as[String].toLocalIterator().asScala, format, os)
          finally os.close()
        } catch { case e: Exception => outfileError = Some(e.getMessage) }
      } else {
        streamOut(rows.as[String].toLocalIterator().asScala, format, System.out)
        System.out.flush()
      }
    }

    // reference summary block (scraping_handler.go:204-227); --silent
    // suppresses all logging incl. the summary (root.go:67)
    if (!args.silent) {
      val sb = new StringBuilder
      sb.append("\n--------------------\n")
      sb.append("  Scraping Summary\n")
      sb.append("--------------------\n")
      sb.append(s"  Status: ${out.stopReason}\n")
      sb.append(s"  Pages Saved: $savedCount\n")
      if (args.outputDir.nonEmpty)
        sb.append(s"  Output Dir: ${args.outputDir}\n")
      else if (args.outfile.nonEmpty) {
        outfileError match {
          case Some(e) => sb.append(s"  Output File: FAILED to write to ${args.outfile} ($e)\n")
          case None    => sb.append(s"  Output File: ${args.outfile}\n")
        }
      } else if (savedCount > 0) sb.append("  Output: stdout\n")
      else sb.append("  Output: No pages saved.\n")
      sb.append("--------------------")
      System.err.println(sb.toString)
      out.metrics.foreach { m =>
        System.err.println(
          s"wave ${m.wave}: popped=${m.popped} fetched=${m.fetched} saved=${m.saved} " +
            s"links=${m.links_extracted} new=${m.new_urls} dup=${m.duplicates}")
      }
    }
  }

  private implicit class IterAsScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** Installed only from main() — tests drive the cancel flag directly. */
  private def installSignalHandlers(flag: AtomicBoolean): Unit =
    try {
      Seq("INT", "TERM").foreach { sig =>
        sun.misc.Signal.handle(new sun.misc.Signal(sig),
          (_: sun.misc.Signal) => flag.set(true))
      }
    } catch { case _: Throwable => () } // headless JVMs without jdk.unsupported
}
