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

  /** Exact phrase search: occurrence counts by substring deletion
    * ((len(text) − len(remove(text, p))) div len(p) — exact in both
    * engines), top 10 docs per phrase among cnt > 0. Broadcast phrase
    * table × narrow scan; only matching docs reach the per-phrase window.
    */
  def phraseTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val p = broadcast(Phrases.toDF("phrase_id", "phrase"))
    val cnt = ((octet_length(col("text")) -
      octet_length(expr("replace(text, phrase, '')"))) /
      octet_length(col("phrase"))).cast("long")
    val matches = docs(spark, sfDir).crossJoin(p)
      .select(col("phrase_id"), col("doc_id"), cnt.as("n_occurrences"))
      .filter(col("n_occurrences") > 0L)
    val win = Window.partitionBy("phrase_id")
      .orderBy(col("n_occurrences").desc, col("doc_id"))
    matches.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("phrase_id"), col("rank"), col("doc_id"), col("n_occurrences"))
  }
}
