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

  // -------------------------------------------- postings compression sizing

  /** Delta + LEB128-varint sizing of the inverted index — the storage
    * decision an at-scale index makes per posting list (postings
    * compression, Manning et al. IR ch. 5 — public). Per term: docs sorted
    * by id, gap₁ = id₁ and gapᵢ = idᵢ − idᵢ₋₁, byte cost of a gap =
    * max(1, ⌈bits/7⌉); returns (term, df, bytes_varint, bytes_fixed8) with
    * bytes_fixed8 = 8·df the uncompressed Long-per-id cost. The byte count
    * is computed columnar-side as a codegen'd threshold chain
    * (1 + Σₖ [gap ≥ 2^{7k}]) and pinned by spec to the REAL
    * [[graft.util.Varint]] encoder's output length, with a byte-exact
    * decode round-trip — the report measures the actual format.
    *
    * Scale shape: one postings shuffle (the index build itself) + a
    * per-term window ordered by doc_id — exactly the order an index writer
    * produces anyway; no collect, no per-list materialization.
    */
  def postingsVarbyte(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("term").orderBy("doc_id")
    val gaps = postings(spark, sfDir)
      .select(col("term"), col("doc_id"))
      .withColumn("gap",
        col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w), lit(0L)))
    val vbytes = (1 to 8).map(k =>
        when(col("gap") >= (1L << (7 * k)), 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    gaps.withColumn("vb", vbytes)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("vb")).as("bytes_varint"))
      .withColumn("bytes_fixed8", col("df") * 8L)
      .select(col("term"), col("df"), col("bytes_varint"), col("bytes_fixed8"))
  }

  // ------------------------------------------------- more-like-this (MLT)

  /** Fixed more-like-this probe set — document ids whose nearest corpus
    * neighbours are retrieved (the `documents` table carries ids 0..499 at
    * every sf).
    */
  val MltDocs: Seq[Long] = Seq(3L, 47L, 128L, 311L)

  /** Query-term budget per probe doc: only the [[MltTerms]] RAREST terms
    * of the probe (df asc, term asc) participate — the standard
    * more-like-this fan-out bound (Lucene's MoreLikeThis caps query terms
    * the same way), and the reason the operator scales: a probe doc full
    * of stopwords cannot drag the whole corpus into the score join.
    */
  val MltTerms = 8

  /** More-like-this: for each probe document, the top-k corpus documents
    * ranked by Σ_t tf(t, probe) · tf(t, d) · w(t) over the probe's
    * [[MltTerms]] rarest terms, w(t) = WeightScale div df(t) — the
    * related-documents / "find more training docs like these" primitive,
    * document-to-document where [[searchTopK]] is string-to-document.
    *
    * Scale shape: the probe docs' term profiles are a handful of rows and
    * ride broadcasts end to end; the token stream is pruned by the
    * broadcast probe-term set BEFORE the tf aggregation, so (as with
    * [[searchTopK]]) only Σ_t df(t) postings over probe terms are ever
    * built or shuffled — and the rarest-M cut bounds that sum by
    * construction. df for rarity is computed on the pruned postings, which
    * is exactly global df for those terms (pruning is by term).
    */
  def moreLikeThis(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val q = MltDocs.toDF("qid")
    val tok = tokens(spark, sfDir)
    val qtf = tok.join(broadcast(q), tok("doc_id") === q("qid"))
      .groupBy(col("qid"), col("w")).agg(count(lit(1)).as("tf_q"))
      .localCheckpoint(true)
    // pruned postings: only terms some probe doc mentions
    val p = tok.join(broadcast(qtf.select("w").distinct()), "w")
      .groupBy(col("w"), col("doc_id")).agg(count(lit(1)).as("tf_d"))
      .localCheckpoint(true)
    val dfq = p.groupBy("w").agg(count(lit(1)).as("df"))
    val selWin = Window.partitionBy("qid").orderBy(col("df"), col("w"))
    val qsel = qtf.join(dfq, "w")
      .withColumn("rn", row_number().over(selWin))
      .filter(col("rn") <= MltTerms)
      .select(col("qid"), col("w"), col("tf_q"),
        expr(s"CAST($WeightScale div df AS BIGINT)").as("weight"))
    val scored = p.join(broadcast(qsel), "w")
      .filter(col("doc_id") =!= col("qid"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("tf_d") * col("tf_q") * col("weight")).as("score"))
    val win = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("qid").as("query_doc"), col("rank"), col("doc_id"), col("score"))
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

  // ------------------------------------- Dirichlet query likelihood (QL)

  /** Dirichlet smoothing pseudo-count μ (Zhai & Lafferty 2004, "A Study of
    * Smoothing Methods for Language Models Applied to Information
    * Retrieval" — public; 2000 is the standard default).
    */
  val QlMu = 2000L

  /** Query-likelihood ranking with Dirichlet smoothing, in exact Q16
    * integer logs (the third retrieval family beside the vector-space
    * [[searchTopK]] and probabilistic [[bm25TopK]]):
    *
    *   p̂(t|d)       = (tf·T + μ·cf(t)) / (T·(dl+μ))     (exact rationals)
    *   score(q, d)  = Σ_{t∈q'} log2 p̂(t|d) in Q16
    *                = Σ_{t present} [lg(tf·T + μ·cf) − lg(μ·cf)]
    *                  + C_q − |q'|·lg(T) − |q'|·lg(dl+μ)
    *
    * where q' = query terms with corpus frequency cf > 0 (OOV terms are
    * dropped — their smoothed probability is 0 for every doc alike),
    * C_q = Σ_{t∈q'} lg(μ·cf) is a per-query constant, and lg =
    * [[Lm.log2fix]] so the DuckDB oracle bit-replays every log. The
    * rewrite works because an ABSENT term's contribution lg(μ·cf) −
    * lg(T) − lg(dl+μ) differs from a present term's only in the first
    * log — so only postings rows are ever summed. Candidates (and the
    * returned ranking) are docs containing ≥ 1 q' term, the standard
    * index-driven candidate set. Scores are negative Q16 log-probs; higher
    * = more likely.
    *
    * Scale shape = [[bm25TopK]]: broadcast query terms prune the token
    * stream before any tf aggregation, cf comes from the pruned stream
    * (pruning is per-term, so the count is the global collection
    * frequency), and log2fix runs only over DISTINCT argument values via a
    * broadcast table. Overflow: tf·T needs the [[bm25TopK]] reorder note
    * past ~2^63/T docs; at sandbox scales tf·T ≤ 10^4·10^6.
    */
  def qlDirichletTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val d = docs(spark, sfDir).select(col("doc_id"),
      filter(split(lower(col("text")), "\\W+"), w => w =!= "").as("wl"))
    val totTok = d.agg(coalesce(sum(size(col("wl")).cast("long")), lit(0L)))
      .as[Long].head()
    val qt = Queries.toDF("query_id", "query")
      .select(col("query_id"), explode(split(col("query"), " ")).as("w"))
    val tok = d.select(col("doc_id"), size(col("wl")).cast("long").as("dl"),
        explode(col("wl")).as("w"))
      .join(broadcast(qt.select("w").distinct()), "w")
      .localCheckpoint(true)
    val tfq = tok.groupBy("doc_id", "w")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // global collection frequency of each query term (pruned stream = the
    // term's full stream); q' = query terms that exist in the corpus
    val cfq = tok.groupBy("w").agg(count(lit(1)).as("cf"))
    val qp = qt.join(cfq, "w")
      .select(col("query_id"), col("w"), col("cf"),
        (lit(QlMu) * col("cf")).as("mucf"))
      .localCheckpoint(true)
    val cand = tfq.join(broadcast(qp), "w")
      .select(col("query_id"), col("doc_id"), col("dl"), col("mucf"),
        (col("tf") * totTok + col("mucf")).as("num"))
      .localCheckpoint(true)
    // Q16 logs over DISTINCT argument values only, broadcast back
    val vals = cand.select(col("num").as("v"))
      .union(qp.select(col("mucf").as("v")))
      .union(cand.select((col("dl") + QlMu).as("v")))
      .union(Seq(totTok).toDF("v"))
      .distinct()
    val lgtab = vals.as[Long].map(v => (v, Lm.log2fix(v))).toDF("v", "lg")
      .localCheckpoint(true)
    val lgT = Lm.log2fix(totTok)
    val present = cand
      .join(broadcast(lgtab.toDF("nv", "lgn")), col("num") === col("nv"))
      .join(broadcast(lgtab.toDF("mv", "lgm")), col("mucf") === col("mv"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("lgn") - col("lgm")).as("sp"), first(col("dl")).as("dl"))
    val qc = qp.join(broadcast(lgtab.toDF("mv", "lgm")), col("mucf") === col("mv"))
      .groupBy("query_id")
      .agg(sum(col("lgm")).as("cq"), count(lit(1)).as("nq"))
    val scored = present
      .join(broadcast(qc), "query_id")
      .join(broadcast(lgtab.toDF("dv", "lgd")), (col("dl") + QlMu) === col("dv"))
      .select(col("query_id"), col("doc_id"),
        (col("sp") + col("cq") - col("nq") * lgT - col("nq") * col("lgd"))
          .as("score_q16"))
    val win = Window.partitionBy("query_id").orderBy(col("score_q16").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_q16"))
  }

  // -------------------------------------------------- KWIC result snippets

  /** Context window radius: snippet = tokens [pos−3 .. pos+3] around the
    * first query-term hit.
    */
  val SnippetRadius = 3

  /** Keyword-in-context snippets for the [[searchTopK]] result pages — the
    * result-presentation step of the search stack: for each (query, hit
    * doc), pos = the FIRST token position (1-based) holding any query
    * term, snippet = the ±[[SnippetRadius]]-token window joined with
    * spaces (clamped at both document ends). Deterministic string math —
    * the DuckDB oracle recomputes it from the same topk SELECT.
    *
    * Scale shape: positions come from the same broadcast-pruned token
    * stream as the ranker (only query-term hits carry positions into the
    * min-agg); document text is re-read ONLY for winner docs via a
    * broadcast semi-join of the ≤ K·|queries| result keys — the corpus
    * text never shuffles.
    */
  def searchSnippets(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val top = searchTopK(spark, sfDir).select("query_id", "rank", "doc_id")
    val qt = Queries.toDF("query_id", "query")
      .select(col("query_id"), explode(split(col("query"), " ")).as("w"))
    val d = docs(spark, sfDir).select(col("doc_id"),
      filter(split(lower(col("text")), "\\W+"), w => w =!= "").as("wl"))
    val hitPos = d.select(col("doc_id"), posexplode(col("wl")).as(Seq("p0", "w")))
      .join(broadcast(qt), "w")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(min(col("p0") + 1).as("pos"))
    val keys = top.join(hitPos, Seq("query_id", "doc_id"))
    d.join(broadcast(keys), "doc_id")
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("pos").cast("long").as("pos"),
        concat_ws(" ", expr(
          s"slice(wl, greatest(1, pos - $SnippetRadius), " +
            s"pos + $SnippetRadius - greatest(1, pos - $SnippetRadius) + 1)"))
          .as("snippet"))
  }

  // ---------------------------------------------- reciprocal-rank fusion

  /** RRF smoothing constant (Cormack, Clarke & Buettcher 2009, "Reciprocal
    * rank fusion outperforms Condorcet and individual rank learning
    * methods" — public; 60 is the paper's default).
    */
  val RrfK = 60L

  /** Reciprocal-rank fusion of the three ranking families' top-10 lists:
    * rrf(q, d) = Σ_r 2^16 div (60 + rank_r(q, d)) over the lists that
    * retrieved d, in exact Q16 integers — rank fusion needs NO score
    * calibration across families (tf weights, BM25 Q16 and QL log-probs
    * are incomparable; ranks always are), which is exactly why production
    * search stacks fuse this way. Returns the fused top-10 per query with
    * the fused score and how many lists agreed. Downstream of three
    * already-bounded top-10s, everything here is driver-scale.
    */
  def rrfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val ret = Seq(searchTopK(spark, sfDir), bm25TopK(spark, sfDir),
      qlDirichletTopK(spark, sfDir))
      .map(_.select(col("query_id"), col("rank"), col("doc_id")))
      .reduce(_ unionByName _)
    val fused = ret.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr(s"${Q16} div ($RrfK + rank)")).as("rrf_q16"),
        count(lit(1)).as("n_lists"))
    val win = Window.partitionBy("query_id").orderBy(col("rrf_q16").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_q16"), col("n_lists"))
  }

  // ---------------------------------------------- cross-ranker evaluation

  /** Retrieval-quality audit across the three ranking families (the
    * [[graft.pipeline.Similarity]] `ann_recall` pattern applied to text
    * retrieval): relevance is defined mechanically as conjunctive match —
    * a doc is relevant to a query iff it contains EVERY query term — and
    * each ranker's top-10 is scored against it. Per (ranker, query):
    * n_rel (relevant docs in the corpus), n_ret (rows the ranker
    * returned, ≤ 10), hits_at_10, first_rel_rank (0 when no relevant doc
    * is retrieved) and rr_q16 = 2^16 div first_rel_rank — the reciprocal
    * rank in Q16, so MRR is a mean of exact integers. The fully-OOV query
    * scores n_rel = n_ret = 0 on every ranker, pinning the zero-hit path.
    *
    * The audit makes ranker differences measurable rather than asserted:
    * conjunctive relevance favors rankers that balance all query terms
    * (QL's length normalization vs raw tf weighting), and any future
    * ranker lands one `Seq` entry away from the same measurement.
    *
    * Scale shape: the three ranker plans are the proven broadcast-pruned
    * pipelines; relevance adds one more broadcast-pruned (query_id,
    * doc_id) aggregation; everything downstream of the top-10s is
    * driver-size (24 grid rows).
    */
  def rankerEval(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val ret = Seq(
      ("tf", searchTopK(spark, sfDir)),
      ("bm25", bm25TopK(spark, sfDir)),
      ("ql", qlDirichletTopK(spark, sfDir)))
      .map { case (n, df) =>
        df.select(lit(n).as("ranker"), col("query_id"), col("rank"), col("doc_id"))
      }.reduce(_ unionByName _)
      .localCheckpoint(true)
    val qt = Queries.toDF("query_id", "query")
      .select(col("query_id"), explode(split(col("query"), " ")).as("w"))
    val nq = qt.groupBy("query_id").agg(countDistinct(col("w")).as("n_terms"))
    // conjunctive relevance: distinct matched terms per (query, doc) must
    // cover the whole query
    val matched = tokens(spark, sfDir)
      .join(broadcast(qt), "w")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(countDistinct(col("w")).as("m"))
    val rel = matched.join(broadcast(nq), "query_id")
      .filter(col("m") === col("n_terms"))
      .select(col("query_id"), col("doc_id"))
      .localCheckpoint(true)
    val relCount = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val nret = ret.groupBy("ranker", "query_id").agg(count(lit(1)).as("n_ret"))
    val hits = ret.join(rel, Seq("query_id", "doc_id"))
      .groupBy("ranker", "query_id")
      .agg(count(lit(1)).as("hits_at_10"), min(col("rank")).as("fr"))
    val grid = Seq("tf", "bm25", "ql").toDF("ranker")
      .crossJoin(Queries.map(_._1).toDF("query_id"))
    grid.join(relCount, Seq("query_id"), "left")
      .join(nret, Seq("ranker", "query_id"), "left")
      .join(hits, Seq("ranker", "query_id"), "left")
      .select(col("ranker"), col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_ret"), lit(0L)).as("n_ret"),
        coalesce(col("hits_at_10"), lit(0L)).as("hits_at_10"),
        coalesce(col("fr"), lit(0L)).cast("long").as("first_rel_rank"),
        when(col("fr").isNotNull, expr(s"CAST(${Q16} div fr AS BIGINT)"))
          .otherwise(lit(0L)).as("rr_q16"))
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
