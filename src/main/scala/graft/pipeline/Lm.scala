package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style "how typical is
  * this document of the corpus" filter (Wenzek et al. 2020 rank documents
  * by LM perplexity; Brants et al. 2007 "Large Language Models in Machine
  * Translation" define the Stupid Backoff score used here — both public).
  *
  * A bigram stupid-backoff model is trained on the corpus itself (exact
  * integer counts) and every document is scored by the sum of its
  * transition log-scores:
  *
  *   S(w | w') = c(w', w) / c(w')         if the bigram was seen
  *             = 0.4 · c(w) / T           otherwise  (0.4 = 2/5 exactly)
  *
  * All arithmetic is EXACT-INTEGER log2 fixed point: log2 is computed by
  * [[log2fix]] — Clay Turner's shift-and-square iteration ("A Fast Binary
  * Logarithm Algorithm", IEEE Signal Processing Mag. 2010; public) using
  * only integer shifts/multiplies, so the DuckDB oracle replays the
  * identical 16-step iteration bit-for-bit (the k-means/PageRank
  * integer-oracle pattern applied to a transcendental). A seen transition
  * contributes log2fix(c2) − log2fix(c1); a backoff one contributes
  * log2fix(2·c(w)) − log2fix(5·T). Scores are negative Q16 longs; the
  * per-token mean (score div n_transitions) is the perplexity rank.
  *
  * Scale shape: counts are two map-side-combined aggregations (word,
  * bigram); scoring joins each transition against the count tables on
  * their natural keys and the tiny distinct-value log table twice — no
  * window wider than a per-doc sort, no driver-side state beyond the two
  * scalars (T, and the log table is itself a dataframe). At 100 TB the
  * count tables are word-keyed shuffles (vocabulary-bounded) and scoring
  * is one transition-keyed join pipeline.
  */
object Lm {

  /** Working scale (2^24) and fraction bits (16) of [[log2fix]]. */
  val LogScaleBits = 24
  val LogFracBits = 16

  /** Exact-integer Q16 log2: k = ⌊log2 m⌋, then 16 shift-and-square steps
    * over a Q24 mantissa. Pure integer truncation arithmetic — any engine
    * replaying the same steps gets the same 64-bit result.
    */
  def log2fix(m: Long): Long = {
    require(m >= 1L, s"log2fix($m)")
    val k = 63 - java.lang.Long.numberOfLeadingZeros(m)
    var x = if (k <= LogScaleBits) m << (LogScaleBits - k) else m >> (k - LogScaleBits)
    var r = k.toLong
    var i = 0
    while (i < LogFracBits) {
      x = (x * x) >> LogScaleBits
      r <<= 1
      if (x >= (1L << (LogScaleBits + 1))) { r |= 1L; x >>= 1 }
      i += 1
    }
    r
  }

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** (doc_id, wl) tokenized view — lower-cased `\W+` split, empties
    * dropped, kept as an array so adjacency never needs a window.
    */
  private def tokArrays(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"),
      filter(split(lower(col("text")), "\\W+"), w => w =!= "").as("wl"))

  /** (doc_id, lm_score_q16, n_transitions) — stupid-backoff bigram score
    * of every document against the corpus-trained model. Documents with
    * < 2 tokens score (0, 0).
    */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val ta = tokArrays(spark, sfDir)
    val t = ta.select(col("doc_id"), explode(col("wl")).as("w"))
    val uni = t.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val total = uni.agg(sum(col("cw"))).as[Long].head()
    // adjacent pairs as a NARROW transform (slice+zip inside each row) —
    // no per-doc window shuffle anywhere in the pipeline
    val big = ta.filter(size(col("wl")) >= 2)
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(wl, 1, size(wl)-1), slice(wl, 2, size(wl)-1)," +
          " (a, b) -> named_struct('w1', a, 'w2', b))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = big.groupBy(col("w1").as("b1"), col("w2").as("b2"))
      .agg(count(lit(1)).as("c2"))
    val scoredPairs = big
      .join(c2, col("w1") === col("b1") && col("w2") === col("b2"), "left")
      .join(uni.withColumnRenamed("w", "u1").withColumnRenamed("cw", "c1"),
        col("w1") === col("u1"))
      .join(uni.withColumnRenamed("w", "u2").withColumnRenamed("cw", "cw2"),
        col("w2") === col("u2"))
      .select(col("doc_id"),
        when(col("c2").isNotNull, col("c2")).otherwise(col("cw2") * 2L).as("num"),
        when(col("c2").isNotNull, col("c1")).otherwise(lit(total * 5L)).as("den"))
    // the distinct numerator/denominator values — the only inputs log2fix
    // ever sees; tiny (bounded by distinct count values, not rows)
    val lgtab = scoredPairs.select(col("num").as("v"))
      .union(scoredPairs.select(col("den").as("v")))
      .distinct()
      .as[Long]
      .map(v => (v, log2fix(v)))
      .toDF("v", "lg")
    val perDoc = scoredPairs
      .join(broadcast(lgtab.withColumnRenamed("v", "nv").withColumnRenamed("lg", "lgn")),
        col("num") === col("nv"))
      .join(broadcast(lgtab.withColumnRenamed("v", "dv").withColumnRenamed("lg", "lgd")),
        col("den") === col("dv"))
      .groupBy(col("doc_id"))
      .agg(sum(col("lgn") - col("lgd")).as("lm_score_q16"),
        count(lit(1)).as("n_transitions"))
    docs(spark, sfDir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lm_score_q16"), lit(0L)).as("lm_score_q16"),
        coalesce(col("n_transitions"), lit(0L)).as("n_transitions"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.2 — public:
    * documents are split per language into head/middle/tail thirds by LM
    * perplexity, and the training mix samples the buckets differently).
    * Here the rank key is the PER-TOKEN stupid-backoff score — exact Q16
    * floor division, higher = more corpus-typical = lower perplexity — and
    * the terciles are integer rank math (`3·rank ≤ n`, `3·rank ≤ 2n`), no
    * floats anywhere.
    *
    * Scale shape: ranking within a language NEVER partitions by the bare
    * language (a 10-language corpus would put a tenth of 100 TB in one
    * window task). Instead: (1) per-(lang, score) counts — map-side
    * combined, bounded by distinct Q16 score values; (2) an exclusive
    * running sum over that TINY histogram gives every score its global
    * in-language rank offset; (3) a row_number only WITHIN each (lang,
    * score) tie group (fine-grained keys, no hot partition) breaks ties by
    * doc_id. rank = offset + tie position. Docs with no transitions (< 2
    * tokens) carry no rank and bucket as 'tail'.
    */
  def lmBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val langs = docs(spark, sfDir).select(col("doc_id"), col("lang"))
    val scored = lmScore(spark, sfDir)
      .filter(col("n_transitions") > 0L)
      .join(langs, Seq("doc_id"))
      // integral division truncating toward zero — Spark `div` and DuckDB
      // `//` agree exactly, including on the negative scores
      .withColumn("tok_score_q16",
        expr("lm_score_q16 div n_transitions"))
    val hist = scored.groupBy(col("lang"), col("tok_score_q16"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum_before",
        coalesce(sum(col("c")).over(Window.partitionBy(col("lang"))
          .orderBy(col("tok_score_q16").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_lang",
        sum(col("c")).over(Window.partitionBy(col("lang"))))
      .select(col("lang"), col("tok_score_q16"), col("cum_before"), col("n_lang"))
    scored
      .withColumn("tie_rn", row_number().over(
        Window.partitionBy(col("lang"), col("tok_score_q16"))
          .orderBy(col("doc_id"))).cast("long"))
      .join(cum, Seq("lang", "tok_score_q16"))
      .withColumn("lang_rank", col("cum_before") + col("tie_rn"))
      .select(col("doc_id"), col("lang"), col("tok_score_q16"),
        col("lang_rank"), col("n_lang"),
        when(col("lang_rank") * 3L <= col("n_lang"), "head")
          .when(col("lang_rank") * 3L <= col("n_lang") * 2L, "middle")
          .otherwise("tail").as("bucket"))
  }
}
