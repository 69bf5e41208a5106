package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the `documents` table: inverted-index build,
  * integer-weighted multi-term top-k search, and exact phrase search — the
  * "find me the training docs about X" facet of a corpus engine.
  *
  * Everything is exact integer arithmetic (term weights are floor
  * divisions, ranks are row_numbers with total-order ties), so the DuckDB
  * oracle reproduces every score bit-for-bit.
  *
  * Scale shape: the query-term table is tiny and BROADCAST before any wide
  * op, so only postings whose term appears in some query ever shuffle —
  * at 100 TB the scoring pipeline moves `Σ_t df(t)` rows (t ∈ query
  * terms), not the corpus. The full index build (`postings`) is the one
  * intentionally-wide op: a single (doc_id, term) map-side-combined
  * aggregation, the canonical build-an-index shuffle.
  */
object Search {

  /** Fixed query workload — terms drawn from the corpus vocabulary plus a
    * guaranteed zero-hit query. Terms within a query are distinct (the
    * scorer sums per-term contributions and would double-count repeats;
    * both engines share this contract).
    */
  val Queries: Seq[(Long, String)] = Seq(
    1L -> "spark",
    2L -> "table scan",
    3L -> "window agg join",
    4L -> "quantum chromodynamics",
    5L -> "customer query fast",
    6L -> "stream batch",
    7L -> "the a value",
    8L -> "merge sort column vector")

  /** Fixed phrase workload for [[phraseTopK]] (exact substring matches,
    * including one zero-hit phrase).
    */
  val Phrases: Seq[(Long, String)] = Seq(
    1L -> "table scan",
    2L -> "value fast",
    3L -> "the line",
    4L -> "quantum leap")

  val TopK = 10

  /** w(t) = WeightScale div df(t) — a rarity weight in pure integer floor
    * division (the idf shape without the float log; [[Lm]] carries the
    * exact-log machinery where a true log-weight matters).
    */
  val WeightScale = 1000000L

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** (doc_id, term) token stream — lower-cased `\W+` split, empties
    * dropped; the tokenization every text operator in this package uses.
    */
  private def tokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\W+")).as("w"))
      .filter(col("w") =!= "")

  /** The inverted index: (term, doc_id, tf). One map-side-combined
    * aggregation keyed by (doc_id, term); at scale this is the index-build
    * job and its shuffle is the point.
    */
  def postings(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir)
      .groupBy(col("w").as("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** [[postings]] over an arbitrary (id, text) relation — same tokenizer,
    * same single map-side-combined shuffle; used by the crawl-side index
    * builds (extraction postings, the incremental cycle-2 maintenance).
    */
  def postingsOf(src: DataFrame, idCol: String, textCol: String): DataFrame =
    src.select(col(idCol), explode(split(lower(col(textCol)), "\\W+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w").as("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Multi-term top-k search: score(q, d) = Σ_{t ∈ q} tf(t, d) · w(t),
    * w(t) = WeightScale div df(t); top 10 per query by (score desc,
    * doc_id). Zero-hit queries return no rows.
    *
    * The broadcast query-term table prunes the token stream BEFORE the tf
    * aggregation, so only query-relevant postings are ever built or
    * shuffled; df is computed over the same pruned postings (df of a term
    * no query mentions is never needed).
    */
  def searchTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val qt = Queries.toDF("query_id", "query")
      .select(col("query_id"), explode(split(col("query"), " ")).as("w"))
    // prune the token stream to query terms before anything wide
    val tokF = tokens(spark, sfDir).join(broadcast(qt.select("w").distinct()), "w")
    val tfq = tokF.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy("w").agg(count(lit(1)).as("df"))
    val qw = qt.join(broadcast(dfq), "w")
      .select(col("query_id"), col("w"),
        expr(s"CAST($WeightScale div df AS BIGINT)").as("weight"))
    val scored = tfq.join(broadcast(qw), "w")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * col("weight")).as("score"))
    val win = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  // ------------------------------------------------------ integer BM25

  /** BM25 fixed-point constants (Q16): k1 = 1.2, b = 0.75 — the standard
    * Robertson/Sparck-Jones defaults, scaled to integers so every score is
    * exact. Q16B is exact (0.75·2^16); Q16K1 is ⌊1.2·2^16⌋.
    */
  val Q16 = 65536L
  val Q16K1 = 78643L
  val Q16B = 49152L

  /** Okapi BM25 top-k ranking in exact Q16 integer arithmetic (Robertson &
    * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
    * Beyond" — public; Lucene-style idf = log(1 + (N−df+0.5)/(df+0.5)),
    * always positive):
    *
    *   idf_q16(t)   = log2fix(2N+2) − log2fix(2·df(t)+1)   (exact Q16 logs:
    *                  log2((N+1)/(df+0.5)) with the halves cleared by ×2 —
    *                  [[graft.pipeline.Lm.log2fix]]'s bit-replayable
    *                  iteration, so the oracle reproduces the transcendental)
    *   tfn_q16(t,d) = (tf·(k1+1)·S) div (tf·S + k1·((S−b) + (b·dl·N) div T))
    *   score(q,d)   = Σ_t (idf_q16 · tfn_q16) div S
    *
    * dl = |d| in tokens, T = Σ dl, N = doc count; every div is a floor on
    * positives, identical in Spark (`div`) and DuckDB (`//`). Overflow
    * audit at sandbox scales: tf·(k1+1)·S ≤ 10^4·1.4e5·6.6e4 ≈ 9e13;
    * b·dl·N ≤ 4.9e4·10^4·10^4 ≈ 5e12 — Long-safe. At 10^10 docs reorder
    * the length norm to b·((dl·S) div avgdl) (one more floor, same shape)
    * before N·dl can reach 2^63.
    *
    * Scale shape = [[searchTopK]]: the broadcast query-term table prunes
    * the token stream BEFORE the tf aggregation and dl rides the token
    * rows (computed narrowly per doc, no corpus-wide dl join); only
    * Σ_t df(t) rows ever shuffle.
    */
  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val d = docs(spark, sfDir).select(col("doc_id"),
      filter(split(lower(col("text")), "\\W+"), w => w =!= "").as("wl"))
    // corpus stats: one 1-row agg (N docs, T total tokens)
    val stats = d.agg(count(lit(1)), coalesce(sum(size(col("wl")).cast("long")), lit(0L))).head()
    val nDocs = stats.getLong(0)
    val totTok = stats.getLong(1)

    val qt = Queries.toDF("query_id", "query")
      .select(col("query_id"), explode(split(col("query"), " ")).as("w"))
    val tok = d.select(col("doc_id"), size(col("wl")).cast("long").as("dl"),
        explode(col("wl")).as("w"))
      .join(broadcast(qt.select("w").distinct()), "w")
    val tfq = tok.groupBy("doc_id", "w")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfq = tfq.groupBy("w").agg(count(lit(1)).as("df"))
    val idfOf = udf((df: Long) => Lm.log2fix(2L * nDocs + 2L) - Lm.log2fix(2L * df + 1L))
    val qw = qt.join(broadcast(dfq), "w")
      .select(col("query_id"), col("w"), idfOf(col("df")).as("idf_q16"))
    val scored = tfq.join(broadcast(qw), "w")
      .withColumn("tfn_q16", expr(
        s"(tf * ${Q16K1 + Q16} * $Q16) div " +
          s"(tf * $Q16 + $Q16K1 * (($Q16 - $Q16B) + ($Q16B * dl * $nDocs) div $totTok))"))
      .groupBy("query_id", "doc_id")
      .agg(sum(expr(s"(idf_q16 * tfn_q16) div $Q16")).as("score_q16"))
    val win = Window.partitionBy("query_id").orderBy(col("score_q16").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_q16"))
  }

  // ------------------------------------------------ integer BM25F (fields)

  /** BM25F query workload over the CRAWL corpus (body = extracted markdown,
    * anchor = in-link anchor text): anchor-dominant, body-only, mixed, and
    * one guaranteed zero-hit query.
    */
  val QueriesF: Seq[(Long, String)] = Seq(
    1L -> "home",
    2L -> "partner site",
    3L -> "signal beacon",
    4L -> "anchor crawler",
    5L -> "quantum chromodynamics",
    6L -> "link 0")

  /** Integer field weights: anchor text counts [[WAnchor]]× a body hit —
    * the classic "what the web calls this page" boost.
    */
  val WBody = 1L
  val WAnchor = 3L

  /** BM25F top-k (Robertson & Zaragoza 2009 §10; Zaragoza et al. 2004,
    * "Microsoft Cambridge at TREC-13" — public) in exact Q16 integers over
    * TWO fields derived from the same raw HTML the crawler fetched:
    *
    *   - body   = the engine's own readability→markdown extraction
    *     (byte-parity with the corpus ground truth is pinned by
    *     `crawl_extract_markdown`);
    *   - anchor = the first-anchor text of every in-link, from
    *     [[graft.extract.LinkExtractor.extractWithText]] (parity pinned by
    *     `graph_anchor_text`), restricted to dst urls that are corpus pages.
    *
    * BM25F combines PER-FIELD length-normalized tf with field weights
    * BEFORE one shared saturation (unlike summing two independent BM25
    * scores, which double-saturates):
    *
    *   Bq_f(d)    = (S − b·S) + (b·S · dl_f(d) · N) div T_f     (Q16)
    *   tfn_f(t,d) = (tf_f · S · S) div Bq_f                      (Q16)
    *   tft(t,d)   = W_body·tfn_body + W_anchor·tfn_anchor        (Q16)
    *   sat(t,d)   = (tft · S) div (k1·S + tft) → (tft·S) div (Q16K1 + tft)
    *   idf_q16(t) = log2fix(2N+2) − log2fix(2·df(t)+1), df = docs where t
    *                appears in EITHER field
    *   score(q,d) = Σ_t (idf_q16 · sat) div S
    *
    * Overflow audit (Long): tfn_f = tf·S² div Bq ≤ tf·S²/(S−b·S) = 4·tf·S
    * ≈ tf·2.6e5; tft ≤ 4·(10^4·2.6e5) ≈ 10^10; sat numerator tft·S ≤ 6.8e14;
    * idf·sat ≤ 1.5e6·6.5e4 ≈ 10^11 — all safe. At 10^10 docs reorder the
    * length norm to b·S·((dl·S) div avgdl) before N·dl can reach 2^63.
    *
    * Scale shape: both token streams are pruned by the broadcast query-term
    * set BEFORE any tf aggregation; dl_body rides the body rows narrowly,
    * dl_anchor/T_anchor are one bounded agg over the (already small) anchor
    * stream. Only Σ_t df(t) rows reach the field-combine join and scoring.
    * The tokenized body is localCheckpoint'd so the markdown extraction
    * runs once, not once per consumer.
    */
  def bm25fTopK(spark: SparkSession, body: DataFrame,
      anchors: DataFrame): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val b = body.select(col("url"),
        filter(split(lower(col("markdown")), "\\W+"), w => w =!= "").as("wl"))
      .localCheckpoint() // extraction runs once; consumed by stats/tokens/join
    val stats = b.agg(count(lit(1)),
      coalesce(sum(size(col("wl")).cast("long")), lit(0L))).head()
    val nDocs = stats.getLong(0)
    val tBody = stats.getLong(1)

    // anchor token stream, restricted to dst urls that are corpus pages
    val atok = anchors.select(col("dst_url").as("url"),
        explode(filter(split(lower(col("anchor_text")), "\\W+"),
          w => w =!= "")).as("w"))
      .join(b.select("url"), Seq("url"), "left_semi")
      .localCheckpoint() // consumed by T/dl aggs and the pruned tf agg
    val tAnchor = atok.count()

    val qt = QueriesF.toDF("query_id", "query")
      .select(col("query_id"), explode(split(col("query"), " ")).as("w"))
    val qset = broadcast(qt.select("w").distinct())

    val btf = b.select(col("url"), explode(col("wl")).as("w"))
      .join(qset, "w")
      .groupBy("url", "w").agg(count(lit(1)).as("tfb"))
    val atf = atok.join(qset, "w")
      .groupBy("url", "w").agg(count(lit(1)).as("tfa"))
    val adl = atok.groupBy("url").agg(count(lit(1)).as("dla"))
    val bdl = b.select(col("url"), size(col("wl")).cast("long").as("dlb"))

    val hits = btf.join(atf, Seq("url", "w"), "full_outer")
      .na.fill(0L, Seq("tfb", "tfa"))
      .join(bdl, Seq("url")) // body length for every hit (incl. anchor-only)
      .join(adl, Seq("url"), "left").na.fill(0L, Seq("dla"))
      .withColumn("tfnb", expr(
        s"(tfb * $Q16 * $Q16) div " +
          s"(($Q16 - $Q16B) + ($Q16B * dlb * $nDocs) div $tBody)"))
      .withColumn("tfna", expr(
        s"(tfa * $Q16 * $Q16) div " +
          s"(($Q16 - $Q16B) + ($Q16B * dla * $nDocs) div $tAnchor)"))
      .withColumn("tft", expr(s"$WBody * tfnb + $WAnchor * tfna"))
      .withColumn("sat", expr(s"(tft * $Q16) div ($Q16K1 + tft)"))
    val dfq = hits.groupBy("w").agg(count(lit(1)).as("df")) // (url,w) unique
    val idfOf = udf((df: Long) => Lm.log2fix(2L * nDocs + 2L) - Lm.log2fix(2L * df + 1L))
    val qw = qt.join(broadcast(dfq), "w")
      .select(col("query_id"), col("w"), idfOf(col("df")).as("idf_q16"))
    val scored = hits.join(broadcast(qw), "w")
      .groupBy("query_id", "url")
      .agg(sum(expr(s"(idf_q16 * sat) div $Q16")).as("score_q16"))
    val win = Window.partitionBy("query_id").orderBy(col("score_q16").desc, col("url"))
    scored.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("url"), col("score_q16"))
  }

  /** Exact phrase search over POSITIONAL postings — the way an inverted
    * index answers phrase queries (token-sequence match, not byte
    * substring): every phrase-term hit at token position `pos` votes for
    * the implied occurrence start `pos − idx`; a start holding ALL of the
    * phrase's indices is a match. Top 10 docs per phrase by occurrence
    * count.
    *
    * Scale shape — the docs table is never cross-joined and never scanned
    * per phrase:
    *   1. the positional token stream is pruned AT THE SCAN by the
    *      broadcast phrase-term set, so only phrase-relevant positions
    *      survive (Σ_t df·tf over phrase terms, not the corpus);
    *   2. candidate (doc, start) pairs are seeded ONLY from each phrase's
    *      rarest term (lowest hit count), so a stop-word inside a phrase
    *      ("the line") never floods the start-keyed shuffle — the classic
    *      rarest-first postings intersection, set-based;
    *   3. verification joins the hit stream back on (phrase_id, doc_id,
    *      start) and checks all indices are present — one fine-grained
    *      keyed shuffle, no window wider than a (phrase, doc, start) group.
    * Seeding is a pure optimization: results equal the unseeded vote count,
    * which is what the DuckDB oracle replays.
    */
  def phraseTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val pt = Phrases.flatMap { case (id, ph) =>
      ph.split(" ").zipWithIndex.map { case (w, i) => (id, i.toLong, w) }
    }.toDF("phrase_id", "idx", "w")
    val plen = pt.groupBy("phrase_id").agg(count(lit(1)).as("plen"))
    // positional tokens, pruned at the scan by the broadcast term set
    val tp = docs(spark, sfDir)
      .select(col("doc_id"), posexplode(
        filter(split(lower(col("text")), "\\W+"), w => w =!= "")))
      .toDF("doc_id", "pos", "w")
      .join(broadcast(pt.select("w").distinct()), "w")
    val hits = tp.join(broadcast(pt), "w")
      .select(col("phrase_id"), col("idx"), col("doc_id"),
        (col("pos").cast("long") - col("idx")).as("start"))
      .filter(col("start") >= 0L)
      .localCheckpoint() // consumed three times (df, seeds, verify)
    // rarest term per phrase (fewest hits; ties to the lowest idx) —
    // renamed columns keep the hits self-joins unambiguous
    val rare = hits.groupBy("phrase_id", "idx")
      .agg(count(lit(1)).as("hc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("phrase_id").orderBy(col("hc"), col("idx"))))
      .filter(col("rn") === 1)
      .select(col("phrase_id").as("rpid"), col("idx").as("ridx"))
    val seeds = hits.join(broadcast(rare),
        col("phrase_id") === col("rpid") && col("idx") === col("ridx"))
      .select(col("phrase_id").as("spid"), col("doc_id").as("sdid"),
        col("start").as("sstart"))
    val occ = hits.join(seeds,
        col("phrase_id") === col("spid") && col("doc_id") === col("sdid") &&
          col("start") === col("sstart"), "left_semi")
      .groupBy("phrase_id", "doc_id", "start")
      .agg(countDistinct(col("idx")).as("k"))
      .join(broadcast(plen), "phrase_id")
      .filter(col("k") === col("plen"))
      .groupBy("phrase_id", "doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
    val win = Window.partitionBy("phrase_id")
      .orderBy(col("n_occurrences").desc, col("doc_id"))
    occ.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("phrase_id"), col("rank"), col("doc_id"), col("n_occurrences"))
  }
}
