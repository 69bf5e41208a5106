package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.CrawlQueries

/** Host-level web-graph analytics over the multi-host link graph — the
  * link-analysis facet of a Common-Crawl-style pipeline (host ranking for
  * crawl prioritization / quality weighting).
  *
  * Scale design: nodes/edges are host-keyed aggregates of the extracted
  * link table (one groupBy shuffle; urls never leave their hash bucket),
  * and PageRank iterates join+aggregate over (host)-keyed tables — the
  * standard Spark dataflow where each iteration is one shuffle bounded by
  * the HOST count (≪ url count; ~10^8 rows at web scale, broadcastable
  * out-weights).
  *
  * Determinism: PageRank runs in FIXED-POINT integer arithmetic — ranks are
  * longs scaled by [[PrScale]], per-edge contributions use floor division
  * (`pr*w/out_w`), and the damping update is `(15·Scale)/100 +
  * (85·Σcontrib)/100` in integer ops. Integer sums/divisions are exact and
  * order-independent, so the result is partitioning-independent and the
  * DuckDB oracle replays the unrolled iterations bit-for-bit (same design
  * as the k-means refinement's quantized centroids). Dangling hosts (no
  * outlinks) do NOT leak mass: each iteration redistributes
  * Σpr(dangling) div N to every host inside the damping update, so total
  * mass stays ≈ N·Scale within integer-floor slack (pinned by
  * HostGraphSpec's conservation test).
  */
object HostGraph {

  val PrScale = 1000000L
  val PageRankIters = 5

  /** Host component of a canonical page url — shared by every host-keyed
    * query (graph, sessionization) so host identity cannot drift between
    * them; the oracle SQL embeds the same regexp.
    */
  def hostOf(urlCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(urlCol, "^https?://([^/]+)", 1)

  /** Per-host corpus rollup — the Common-Crawl-index-style domain summary
    * (pages, raw bytes, language breadth, capture-time span). One
    * host-keyed aggregation over a (url, html-length, lang, warc_ts)
    * projection; at 100 TB this is the fleet-summary job, bounded by host
    * count.
    */
  def hostStats(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.corpus.CorpusGen.ensureFor(spark, sfDir)
    graft.corpus.CorpusGen.pages(spark, dir)
      .select(hostOf(col("url")).as("host"), octet_length(col("html")).cast("long").as("nb"),
        col("lang"), col("warc_ts"))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_pages"),
        sum(col("nb")).as("total_bytes"),
        countDistinct(col("lang")).as("n_langs"),
        (unix_millis(max(col("warc_ts"))) - unix_millis(min(col("warc_ts"))))
          .as("capture_span_ms"))
  }

  /** Weighted host→host edge list from the multi-host extractor output
    * (self-edges included: same-host links are real graph mass).
    */
  def hostEdges(spark: SparkSession, sfDir: String): DataFrame =
    CrawlQueries.xlinkExtract(spark, sfDir)
      .select(hostOf(col("src_url")).as("src_host"), hostOf(col("dst_url")).as("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  /** Fixed-point PageRank over the host graph: (host, pr) with pr a long in
    * [[PrScale]] units after [[PageRankIters]] synchronous iterations from a
    * uniform [[PrScale]] start.
    */
  def hostPageRank(spark: SparkSession, sfDir: String): DataFrame =
    hostPageRankFromEdges(hostEdges(spark, sfDir))

  /** Same, over an already-built (src_host, dst_host, n_links) edge table —
    * callers that also need the url-level edges (e.g. the priority-frontier
    * scheduler) extract once and share.
    */
  def hostPageRankFromEdges(hostEdgesDf: DataFrame): DataFrame = {
    // EAGER localCheckpoint, not persist-then-unpersist: the returned plan
    // is lazy and references the edge table ~4× per iteration — without a
    // materialized cut-point the caller's first action would re-run the
    // full-corpus link extraction ~20×. The checkpointed tables are
    // host-cardinality-bounded (tiny) and live for the session.
    val edges = hostEdgesDf
      .withColumnRenamed("src_host", "s").withColumnRenamed("dst_host", "d")
      .withColumnRenamed("n_links", "w")
      .localCheckpoint(true)
    val hosts = edges.select(col("s").as("h"))
      .unionByName(edges.select(col("d").as("h"))).distinct().localCheckpoint(true)
    val outw = edges.groupBy(col("s")).agg(sum(col("w")).as("ow"))
    // dangling = hosts with no outlinks; the set is fixed across iterations
    // (host-bounded, tiny) — only its MASS changes per iteration
    val dangling = hosts
      .join(outw.select(col("s").as("h")), Seq("h"), "left_anti")
      .localCheckpoint(true)
    val nHosts = hosts.count()

    var pr = hosts.select(col("h"), lit(PrScale).as("pr"))
    for (_ <- 1 to PageRankIters) {
      // per-edge integer contribution via SQL `div` (TRUE integral
      // division, matching DuckDB's `//`) — NOT `/`, which is double
      // division in Spark and can round an exact quotient across the floor
      val contrib = edges
        .join(pr, edges("s") === pr("h"))
        .join(outw, Seq("s"))
        .select(col("d"), expr("(pr * w) div ow").as("c"))
        .groupBy(col("d")).agg(sum(col("c")).as("m"))
      // dangling mass this iteration, redistributed uniformly: a 1-row agg
      // broadcast-cross-joined onto every host (stays in the plan — no
      // driver action per iteration)
      val dmass = pr.join(dangling, Seq("h"), "left_semi")
        .agg(coalesce(sum(col("pr")), lit(0L)).as("dm"))
      pr = hosts
        .join(contrib, hosts("h") === contrib("d"), "left")
        .crossJoin(broadcast(dmass))
        .select(col("h"),
          (lit(15L * PrScale / 100) +
            expr(s"(85 * (coalesce(m, 0L) + dm div $nHosts)) div 100")).as("pr"))
    }
    pr.select(col("h").as("host"), col("pr"))
  }

  /** Teleport target of [[hostPersonalizedPr]] — the crawl's seed host. */
  val PprSeedHost = "host0.test"

  /** Personalized PageRank (the focused-crawl / crawl-frontier variant of
    * X8: teleportation returns to the SEED host instead of spreading
    * uniformly, so scores measure proximity-to-seed rather than global
    * importance — the signal a focused crawler prioritizes by; Page et al.
    * 1999 §6 "personalized" vector, public). Same exact-integer fixed
    * point as [[hostPageRankFromEdges]]:
    *
    *   pr'(h) = [h = seed]·(15·Scale·N div 100)
    *            + (85·(Σ_in (pr·w) div ow + [h = seed]·dm)) div 100
    *
    * — the whole 0.15 teleport mass and the dangling mass dm land on the
    * seed. Uniform Scale start, [[PageRankIters]] synchronous iterations,
    * every division an integer floor the oracle replays. Host-bounded
    * joins; scales exactly like X8.
    */
  def hostPersonalizedPr(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = hostEdges(spark, sfDir)
      .withColumnRenamed("src_host", "s").withColumnRenamed("dst_host", "d")
      .withColumnRenamed("n_links", "w")
      .localCheckpoint(true)
    val hosts = edges.select(col("s").as("h"))
      .unionByName(edges.select(col("d").as("h"))).distinct().localCheckpoint(true)
    val outw = edges.groupBy(col("s")).agg(sum(col("w")).as("ow"))
    val dangling = hosts
      .join(outw.select(col("s").as("h")), Seq("h"), "left_anti")
      .localCheckpoint(true)
    val nHosts = hosts.count()
    val teleport = 15L * PrScale / 100 * nHosts

    var pr = hosts.select(col("h"), lit(PrScale).as("pr"))
    for (_ <- 1 to PageRankIters) {
      val contrib = edges
        .join(pr, edges("s") === pr("h"))
        .join(outw, Seq("s"))
        .select(col("d"), expr("(pr * w) div ow").as("c"))
        .groupBy(col("d")).agg(sum(col("c")).as("m"))
      val dmass = pr.join(dangling, Seq("h"), "left_semi")
        .agg(coalesce(sum(col("pr")), lit(0L)).as("dm"))
      pr = hosts
        .join(contrib, hosts("h") === contrib("d"), "left")
        .crossJoin(broadcast(dmass))
        .select(col("h"),
          (when(col("h") === PprSeedHost, lit(teleport)).otherwise(lit(0L)) +
            expr(s"(85 * (coalesce(m, 0L) + " +
              s"CASE WHEN h = '$PprSeedHost' THEN dm ELSE 0L END)) div 100"))
            .as("pr"))
    }
    pr.select(col("h").as("host"), col("pr"))
  }

  // ----------------------------------------------- HITS hubs/authorities

  val HitsIters = 5

  /** HITS hubs & authorities (Kleinberg 1999, "Authoritative sources in a
    * hyperlinked environment" — public) over the weighted host graph, in
    * exact fixed-point integers: each half-step is a join+aggregate
    * (auth ← Σ_in hub·w, hub ← Σ_out auth·w) followed by SUM-normalization
    * `(v · Scale) div Σv` — an integer floor both engines replay, replacing
    * the usual L2 norm so no float ever appears. Same scale dataflow as
    * PageRank: every iteration is host-bounded joins, nothing driver-side
    * but the loop counter.
    *
    * Overflow audit: raw mass ≤ Scale · Σw = 10^6 · total_links; Long-safe
    * through Σw ≈ 10^10 (sandbox sf0.01: 3×10^4). Beyond that, downshift
    * the raw sums by Scale before normalizing (same floor shape).
    */
  def hostHits(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = hostEdges(spark, sfDir)
      .withColumnRenamed("src_host", "s").withColumnRenamed("dst_host", "d")
      .withColumnRenamed("n_links", "w")
      .localCheckpoint(true) // referenced 2× per iteration (see hostPageRank)
    val hosts = edges.select(col("s").as("h"))
      .unionByName(edges.select(col("d").as("h"))).distinct().localCheckpoint(true)

    var hub = hosts.select(col("h"), lit(PrScale).as("hub"))
    var auth = hosts.select(col("h"), lit(PrScale).as("auth"))
    for (_ <- 1 to HitsIters) {
      val araw = edges.join(hub, edges("s") === hub("h"))
        .select(col("d"), expr("hub * w").as("c"))
        .groupBy(col("d")).agg(sum(col("c")).as("m"))
      val asum = araw.agg(sum(col("m")).as("t"))
      // EAGER checkpoint per half-step: the raw table feeds both the sum
      // and the normalize join, so an unbroken lazy chain would double per
      // half-step (4^iters re-derivations); the cut tables are
      // host-cardinality-bounded
      auth = hosts.join(araw, hosts("h") === araw("d"), "left")
        .crossJoin(broadcast(asum))
        .select(col("h"), expr(s"(coalesce(m, 0L) * $PrScale) div t").as("auth"))
        .localCheckpoint(true)
      val hraw = edges.join(auth, edges("d") === auth("h"))
        .select(col("s"), expr("auth * w").as("c"))
        .groupBy(col("s")).agg(sum(col("c")).as("m"))
      val hsum = hraw.agg(sum(col("m")).as("t"))
      hub = hosts.join(hraw, hosts("h") === hraw("s"), "left")
        .crossJoin(broadcast(hsum))
        .select(col("h"), expr(s"(coalesce(m, 0L) * $PrScale) div t").as("hub"))
        .localCheckpoint(true)
    }
    hub.join(auth, Seq("h"))
      .select(col("h").as("host"), col("hub").as("hub_q"), col("auth").as("auth_q"))
  }

  // ---------------------------------------- KMV distinct-url cardinality

  /** KMV sketch size (stderr ≈ 1/√(k−2) ≈ 13%) and hash-universe size:
    * hashes are the first 14 hex chars of md5 (56 bits), so the estimator
    * numerator (k−1)·M = 63·2^56 ≈ 4.5e18 stays inside a signed Long in
    * BOTH engines (Spark Long and DuckDB BIGINT overflow-check alike).
    */
  val KmvK = 64
  val KmvM: Long = 1L << 56

  /** Per-host distinct-url cardinality: exact count side-by-side with the
    * KMV k-minimum-values estimate ([[graft.functions.KMinValues]]) over
    * the multi-host extractor's dst urls.
    *
    * Scale story: the exact countDistinct carries every distinct url
    * through the shuffle; the KMV column moves ≤ k longs per (partition,
    * host) and holds O(k) state per host no matter how large the host is —
    * at 10^10 urls the sketch column is what survives, the exact column is
    * the sandbox-scale audit that pins the estimator's error. Deterministic
    * (order statistics of a fixed hash set), so oracle-checkable.
    */
  def hostDistinctKmv(spark: SparkSession, sfDir: String): DataFrame = {
    val kmin = udaf(new graft.functions.KMinValues(KmvK),
      org.apache.spark.sql.Encoders.scalaLong)
    CrawlQueries.xlinkExtract(spark, sfDir)
      .select(hostOf(col("dst_url")).as("dst_host"), col("dst_url"),
        expr("CAST(conv(substring(md5(dst_url), 1, 14), 16, 10) AS BIGINT)").as("hv"))
      .groupBy(col("dst_host"))
      .agg(countDistinct(col("dst_url")).as("exact_distinct"),
        kmin(col("hv")).as("mins"))
      .select(col("dst_host"), col("exact_distinct"),
        size(col("mins")).cast("long").as("n_mins"),
        when(size(col("mins")) < KmvK, size(col("mins")).cast("long"))
          .otherwise(expr(s"${(KmvK - 1) * KmvM} div element_at(mins, $KmvK)"))
          .as("kmv_est"))
  }
}
