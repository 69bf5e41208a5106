package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169 — public): score every raw document by how much more
  * likely its hashed n-gram features are under a TARGET distribution than
  * under the RAW distribution, then resample the raw pool by that weight.
  * The reference engine has no data-selection stage at all
  * (/root/reference/crawler.go stops at extraction); this is a north-rule
  * training-data-pipeline extension in the Wenzek/CCNet family
  * (SURVEY.md §2.11), sitting beside the LM-perplexity bucketing as the
  * second standard "pick the good subset of the crawl" primitive.
  *
  * Integer-exact adaptation (so the DuckDB oracle replays it bit-for-bit):
  *
  *   - features = lower-cased `\W+` unigrams hashed into [[NumBuckets]]
  *     buckets by the first two hex chars of SHA-256 (both engines compute
  *     the identical digest; no JVM-private hash leaks into the contract);
  *   - bucket distributions get add-1 smoothing: p̂(b) = (c(b)+1)/(tot+B);
  *   - the per-bucket log-importance weight is Q16 fixed point via the
  *     same Turner shift-and-square log2 as the LM ([[Lm.log2fix]]):
  *       w(b) = [lg(tc(b)+1) − lg(ttot+B)] − [lg(rc(b)+1) − lg(rtot+B)]
  *   - a document's importance is Σ over its TOKENS of w(bucket(token))
  *     (the paper's bag-of-hashed-ngrams log-ratio, §3.1, in log space).
  *
  * Target domain proxy: the `lang = 'en'` slice of the documents table —
  * deterministic, non-trivial (~43% of docs), and exactly the shape of the
  * paper's "formal text" target (a subset of the same feature space).
  *
  * Scale shape (100 TB): the two bucket histograms are map-side-combined
  * aggregations onto [[NumBuckets]] rows — the only thing the driver ever
  * holds. Scoring is then a NARROW pass: the 256-long weight table rides
  * into the scan as a constant array literal and every doc reduces its own
  * token array over it (`transform` + `aggregate`, whole-stage codegen'd,
  * zero shuffle). Nothing here is proportional to corpus size except the
  * scan itself.
  */
object Dsir {

  /** Feature-space size: first two SHA-256 hex chars → 256 buckets. Small
    * enough that the weight table is a constant; the paper uses 10^4 for
    * real runs — the shape is identical, only the literal grows.
    */
  val NumBuckets = 256

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** (doc_id, lang, wl) tokenized view — identical tokenizer to the LM /
    * search family so the feature space is shared across the pipeline.
    */
  private def tokArrays(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"), col("lang"),
      filter(split(lower(col("text")), "\\W+"), w => w =!= "").as("wl"))

  /** bucket(token) — `conv(substr(sha2(w), 1, 2), 16, 10)`: built-in,
    * codegen'd, and byte-identical to DuckDB's `sha256`.
    */
  private def bucketOf(w: org.apache.spark.sql.Column) =
    conv(substring(sha2(w, 256), 1, 2), 16, 10).cast("int")

  /** (doc_id, lang, dsir_score_q16, n_feats) for every document. Docs with
    * no tokens score (0, 0).
    */
  def dsirWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val ta = tokArrays(spark, sfDir)
    val tb = ta.select(col("doc_id"), col("lang"),
      explode(col("wl")).as("w")).select(
      col("doc_id"), col("lang"), bucketOf(col("w")).as("b"))

    // two bounded histograms (≤ NumBuckets rows each) — the only collect
    val rawc = tb.groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val tgtc = tb.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rtot = rawc.values.sum + NumBuckets
    val ttot = tgtc.values.sum + NumBuckets

    import Lm.log2fix
    val weights: Seq[Long] = (0 until NumBuckets).map { b =>
      (log2fix(tgtc.getOrElse(b, 0L) + 1L) - log2fix(ttot)) -
        (log2fix(rawc.getOrElse(b, 0L) + 1L) - log2fix(rtot))
    }

    // narrow scoring pass: constant weight array, per-row token fold
    val wtab = typedLit(weights)
    ta.select(col("doc_id"), col("lang"),
      coalesce(aggregate(
        transform(col("wl"), w => element_at(wtab, bucketOf(w) + 1)),
        lit(0L), (acc, x) => acc + x), lit(0L)).as("dsir_score_q16"),
      size(col("wl")).cast("long").as("n_feats"))
  }

  /** Keep fraction of the resampling step: top 1/[[SampleKeepDen]] of docs
    * by per-token importance.
    */
  val SampleKeepDen = 4L

  /** Score offset making every per-token division numerator positive:
    * Spark's `div` truncates toward zero while DuckDB's `//` floors, and
    * they only agree on non-negative operands — so the floor is computed as
    * `((s + n·Off) div n) − Off` with `s ≥ −n·Off` guaranteed (per-token
    * weights are Q16 log-ratios, |w| ≪ 2^24).
    */
  val SampleOffset = 1L << 24

  /** The "R" of DSIR — deterministic importance resampling (the paper
    * §3.2 uses Gumbel top-k; this engine's exact-replay contract demands a
    * noise-free variant): rank every scoring doc by per-token importance
    * `floor(score/n_feats)` descending with doc_id tie-break, keep the top
    * quarter. Zero-feature docs never score and are excluded.
    *
    * Scale shape (the [[Lm.lmBuckets]] pattern): NO global window over doc
    * rows — ranks come from a (value → count) histogram whose running sum
    * assigns each tie-group its offset, plus a row_number wholly inside the
    * tie-group. The only ordered window runs over the bounded histogram.
    */
  def dsirSample(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = dsirWeights(spark, sfDir).filter(col("n_feats") > 0)
      .select(col("doc_id"), expr(
        s"((dsir_score_q16 + n_feats * $SampleOffset) div n_feats) - $SampleOffset")
        .as("per_tok_q16"))
      .localCheckpoint() // dsirWeights runs two bounded collects; run once
    val n = w.count()
    val hist = w.groupBy(col("per_tok_q16")).agg(count(lit(1)).as("c"))
    val cum = hist.select(col("per_tok_q16"),
      coalesce(sum(col("c")).over(Window.orderBy(col("per_tok_q16").desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("cum_before"))
    w.join(cum, "per_tok_q16")
      .withColumn("sel_rank", (col("cum_before") + row_number().over(
        Window.partitionBy(col("per_tok_q16")).orderBy(col("doc_id")))).cast("long"))
      .select(col("doc_id"), col("per_tok_q16"), col("sel_rank"),
        (col("sel_rank") <= n / SampleKeepDen).cast("long").as("kept"))
  }
}
