package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.HostGraph
import graft.queries.CrawlQueries

/** Best-first frontier scheduling — the crawl-prioritization operator every
  * large crawler runs instead of plain BFS (cf. OPIC, Abiteboul et al.
  * WWW'03, and the Common Crawl harvest ranking — public): pop the
  * highest-value frontier urls first, where value = the fixed-point
  * integer PageRank of the url's host ([[HostGraph]]).
  *
  * Semantics (deterministic, replayed by the unrolled SQL oracle):
  * frontier₀ = the corpus host roots; each of [[Rounds]] rounds pops the
  * top-[[PopPerRound]] frontier urls by (host-pr desc, url), appends the
  * out-links of popped pages that were never enqueued (enqueue-time seen,
  * the A4 invariant), and repeats. Output: (round, rank, url) — the pop
  * schedule.
  *
  * Scale shape: priorities come from a broadcast host-rank table
  * (host-bounded); per-round work is one link join + anti-join, the same
  * shapes as the wave crawler. The top-P selection here is a single
  * row_number window (frontier is sandbox-tiny); a 10^10-url frontier
  * selects its top-P with per-partition heaps + merge exactly like
  * Similarity.bruteForceTopK, or keeps the frontier range-partitioned by
  * priority. Per-round eager localCheckpoints bound plan growth
  * (PageRank/k-means pattern).
  */
object PriorityCrawl {

  val Rounds = 5
  val PopPerRound = 25

  /** (round, rank, url) pop schedule of the best-first crawl. */
  def schedule(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = CrawlQueries.xlinkExtract(spark, sfDir)
      .select(col("src_url"), col("dst_url"))
      .localCheckpoint(true)
    val hostEdges = edges.select(
      HostGraph.hostOf(col("src_url")).as("src_host"),
      HostGraph.hostOf(col("dst_url")).as("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))
    val pr = HostGraph.hostPageRankFromEdges(hostEdges).localCheckpoint(true)

    def withPrio(urls: DataFrame): DataFrame =
      urls.join(broadcast(pr), HostGraph.hostOf(col("url")) === col("host"), "left")
        .select(col("url"), coalesce(col("pr"), lit(0L)).as("pr"))

    val seeds = graft.corpus.CorpusGen
      .pages(spark, graft.corpus.CorpusGen.ensureFor(spark, sfDir))
      .select(col("url")).filter(col("url").rlike("^https?://[^/]+/$"))

    var frontier = withPrio(seeds).localCheckpoint(true)
    var seen = seeds.localCheckpoint(true) // enqueued-ever
    var popped: DataFrame = null
    for (i <- 1 to Rounds) {
      val pop = frontier
        .withColumn("rank",
          row_number().over(Window.orderBy(col("pr").desc, col("url"))).cast("long"))
        .filter(col("rank") <= PopPerRound)
        .localCheckpoint(true)
      val out = pop.select(lit(i.toLong).as("round"), col("rank"), col("url"))
      popped = if (popped == null) out else popped.unionByName(out)
      val newUrls = edges
        .join(pop.select(col("url").as("purl")), col("src_url") === col("purl"))
        .select(col("dst_url").as("url")).distinct()
        .join(seen, Seq("url"), "left_anti")
        .localCheckpoint(true)
      frontier = frontier
        .join(pop.select(col("url")), Seq("url"), "left_anti")
        .unionByName(withPrio(newUrls))
        .localCheckpoint(true)
      seen = seen.unionByName(newUrls).localCheckpoint(true)
    }
    popped
  }
}
