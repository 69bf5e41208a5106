package graft.app

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.crawl.{CrawlConfig, WaveCrawler}
import graft.sinks.Sinks

/** spark-submit entry point mirroring the reference CLI
  * (/root/reference/cmd/scrape.go:52-66):
  *
  *   spark-submit --class graft.app.Main <jar> \
  *     --pages <pages.parquet dir or sf dir> \
  *     [seed-url] [--url-file f] [--match g]... [--follow-match g]... \
  *     [--limit N] [--content-selector css] [--format xml|json|jsonl] \
  *     [--output path] [--host-budget N] [--robots] [--checkpoint dir] \
  *     [--resume]
  *
  * Flag semantics match the reference: --match gates saving (never
  * crawling), --follow-match gates link expansion (ignored in list mode,
  * README.md:109), --limit is the global saved-page budget with
  * FIFO-prefix-cut semantics (crawler.go:326-330). --host-budget/--robots/
  * --checkpoint are the north-rule scale additions.
  */
object Main {

  final case class Args(
      pages: String = "",
      seed: String = "",
      urlFile: String = "",
      matches: Vector[String] = Vector.empty,
      follows: Vector[String] = Vector.empty,
      limit: Int = 0,
      selector: String = "",
      format: String = "xml",
      output: String = "",
      hostBudget: Int = 0,
      robots: Boolean = false,
      checkpoint: String = "",
      resume: Boolean = false)

  def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case Nil => acc
    case "--pages" :: v :: rest => parse(rest, acc.copy(pages = v))
    case "--url-file" :: v :: rest => parse(rest, acc.copy(urlFile = v))
    case "--match" :: v :: rest => parse(rest, acc.copy(matches = acc.matches :+ v))
    case "--follow-match" :: v :: rest => parse(rest, acc.copy(follows = acc.follows :+ v))
    case "--limit" :: v :: rest => parse(rest, acc.copy(limit = v.toInt))
    case "--content-selector" :: v :: rest => parse(rest, acc.copy(selector = v))
    case "--format" :: v :: rest => parse(rest, acc.copy(format = v))
    case "--output" :: v :: rest => parse(rest, acc.copy(output = v))
    case "--host-budget" :: v :: rest => parse(rest, acc.copy(hostBudget = v.toInt))
    case "--robots" :: rest => parse(rest, acc.copy(robots = true))
    case "--checkpoint" :: v :: rest => parse(rest, acc.copy(checkpoint = v))
    case "--resume" :: rest => parse(rest, acc.copy(resume = true))
    case seed :: rest if !seed.startsWith("--") && acc.seed.isEmpty =>
      parse(rest, acc.copy(seed = seed))
    case other :: _ => throw new IllegalArgumentException(s"unknown argument: $other")
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toList)
    require(args.pages.nonEmpty, "--pages <dir> is required (the corpus table)")
    require(args.seed.nonEmpty ^ args.urlFile.nonEmpty,
      "exactly one of <seed-url> or --url-file is required")

    val spark = SparkSession.builder()
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages =
      if (new java.io.File(s"${args.pages}/pages.parquet").exists())
        CorpusGen.pages(spark, args.pages)
      else spark.read.parquet(args.pages)

    val urlList =
      if (args.urlFile.nonEmpty)
        scala.io.Source.fromFile(args.urlFile).getLines()
          .map(_.trim).filter(_.nonEmpty).toSeq
      else Nil

    val config = CrawlConfig(
      startUrl = args.seed,
      urlList = urlList,
      isUrlListMode = args.urlFile.nonEmpty,
      pageLimit = args.limit,
      matchPatterns = args.matches,
      followPatterns = args.follows,
      contentSelector = args.selector,
      hostPageBudget = args.hostBudget,
      useRobots = args.robots,
      checkpointDir = if (args.checkpoint.nonEmpty) Some(args.checkpoint) else None)

    val out =
      if (args.resume) WaveCrawler.resume(spark, pages, config)
      else WaveCrawler.crawl(spark, pages, config)

    // emit in save order = (depth, seq) — the reference's append order
    import spark.implicits._
    val ordered = out.saved.orderBy($"depth", $"seq")
      .select($"title", $"url", $"markdown")
      .as[(String, String, String)].collect()
      .map { case (t, u, m) =>
        graft.extract.PageData(title = t, url = u, markdown = m, rawHtml = "", articleHtml = "")
      }.toSeq

    // S7 gate: nothing is written when no pages were saved (crawler.go:424)
    if (ordered.nonEmpty) {
      val payload = args.format match {
        case "json"  => Sinks.json(ordered)
        case "jsonl" => Sinks.jsonl(ordered)
        case _       => Sinks.xmlLike(ordered)
      }
      if (args.output.nonEmpty)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(args.output),
          payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      else print(payload)
    }

    System.err.println(s"Pages Saved: ${ordered.length}")
    System.err.println(s"Status: ${out.stopReason}")
    out.metrics.foreach { m =>
      System.err.println(
        s"wave ${m.wave}: popped=${m.popped} fetched=${m.fetched} saved=${m.saved} " +
          s"links=${m.links_extracted} new=${m.new_urls} dup=${m.duplicates}")
    }
    spark.stop()
  }
}
