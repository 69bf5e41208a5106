package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality classification — the "train a cheap classifier on
  * weak labels, score the whole corpus" step every large-scale pipeline
  * runs between heuristic gates and the final data mix (GPT-3 trains a
  * quality classifier against a curated positive set, Brown et al. 2020
  * appendix A; CCNet ships a fastText quality model, Wenzek et al. 2020
  * §3.3 — both public).
  *
  * This engine's deterministic instance is a multinomial naive-Bayes
  * classifier with add-1 smoothing, trained on the corpus's own Gopher
  * verdicts as weak labels over a fixed held-in split (doc_id % 3 == 0)
  * and scoring every document:
  *
  *   - vocabulary = top [[VocabSize]] training-split tokens by document
  *     frequency (ties to the lexicographically smaller token) — a bounded
  *     model whatever the corpus size
  *   - per-class token counts c(t,c) and totals T(c) restricted to that
  *     vocabulary, priors = training document counts per class
  *   - weight(t) = [log2fix(c(t,pass)+1) − log2fix(T(pass)+V)]
  *               − [log2fix(c(t,fail)+1) − log2fix(T(fail)+V)]
  *     bias      =  log2fix(n_pass+1)    − log2fix(n_fail+1)
  *   - score(d)  =  bias + Σ_t tf(d,t)·weight(t), pred = score ≥ 0
  *
  * log2 is the exact-integer Q16 shift-and-square iteration ([[Lm.log2fix]],
  * Turner 2010), so the DuckDB oracle replays every weight bit-for-bit.
  *
  * Scale shape: one token-keyed aggregation picks the vocabulary (global
  * top-V over df — a TakeOrdered of the token-distinct set, not the
  * corpus); the model the driver holds is V weights + one bias; scoring
  * joins the token stream against the BROADCAST weight table before any
  * aggregation, so only vocabulary hits (≤ V distinct tokens) ever reach
  * the per-doc sum — the BM25 query-term-prune pattern. At 100 TB this is
  * a scan + broadcast-hash-join + map-side-combined agg; nothing shuffles
  * by token except the bounded df aggregation.
  */
object NbQuality {

  /** Vocabulary size — the model is exactly this many weights + a bias. */
  val VocabSize = 64

  /** Held-in training split: doc_id % TrainMod == 0. */
  val TrainMod = 3

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** (doc_id, w) token stream — the Lm/Search tokenization. */
  private def toks(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"),
      explode(filter(split(lower(col("text")), "\\W+"), w => w =!= "")).as("w"))

  /** Train on the held-in split, score every document. Returns
    * (doc_id, n_feats, score_q16, pred): n_feats = vocabulary-token
    * occurrences in the doc, score in Q16 fixed point, pred ∈ {0,1}.
    */
  def nbQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = TextAnalysis.qualityGopher(spark, sfDir)
      .select(col("doc_id"), col("pass"))
    val trainLabels = labels.filter(pmod(col("doc_id"), lit(TrainMod)) === 0)
    val trainToks = toks(spark, sfDir)
      .join(broadcastIfSmall(trainLabels), "doc_id")

    // vocabulary: top-V by (df desc, token asc) over the train split —
    // a token-keyed agg then a global TakeOrdered of V rows
    val vocab = trainToks.groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(col("df").desc, col("w").asc)
      .limit(VocabSize)
      .select(col("w"))

    // per-(token, class) occurrence counts restricted to the vocabulary;
    // ≤ 2V rows — the whole model materializes on the driver
    val tcRows = trainToks.join(broadcast(vocab), "w")
      .groupBy(col("w"), col("pass")).agg(count(lit(1)).as("c"))
      .collect()
    val prior = trainLabels.groupBy(col("pass")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nPass = prior.getOrElse(1L, 0L)
    val nFail = prior.getOrElse(0L, 0L)

    val cnt = scala.collection.mutable.HashMap.empty[(String, Long), Long]
    tcRows.foreach(r => cnt((r.getString(0), r.getLong(1))) = r.getLong(2))
    val vocabToks = tcRows.map(_.getString(0)).distinct.sorted
    val tPass = vocabToks.map(t => cnt.getOrElse((t, 1L), 0L)).sum
    val tFail = vocabToks.map(t => cnt.getOrElse((t, 0L), 0L)).sum
    // smooth by the REALIZED vocabulary size (== VocabSize whenever the
    // train split has that many distinct tokens) so the oracle's own
    // vocab CTE count is the same number
    val v = vocabToks.length.toLong
    val bias = Lm.log2fix(nPass + 1) - Lm.log2fix(nFail + 1)
    val weights = vocabToks.map { t =>
      val wp = Lm.log2fix(cnt.getOrElse((t, 1L), 0L) + 1) - Lm.log2fix(tPass + v)
      val wf = Lm.log2fix(cnt.getOrElse((t, 0L), 0L) + 1) - Lm.log2fix(tFail + v)
      (t, wp - wf)
    }

    val spark2 = spark
    import spark2.implicits._
    val wDf = weights.toSeq.toDF("w", "wt")

    // scoring: broadcast the V-row model into the token stream BEFORE the
    // per-doc aggregation — only vocabulary hits reach the sum
    val scored = toks(spark, sfDir).join(broadcast(wDf), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("wt")).as("s"), count(lit(1)).as("n"))
    docs(spark, sfDir).select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_feats"),
        (coalesce(col("s"), lit(0L)) + lit(bias)).as("score_q16"),
        when(coalesce(col("s"), lit(0L)) + lit(bias) >= 0L, 1L).otherwise(0L)
          .as("pred"))
  }

  /** The train-label table is one row per train doc — broadcast it when
    * the planner would not already (it sits under the 10 MB default at
    * every test sf; the hint is what matters at 100 TB where labels are a
    * doc-keyed table and this join should shuffle instead — callers at
    * that scale drop the hint, so keep it a named seam).
    */
  private def broadcastIfSmall(df: DataFrame): DataFrame = broadcast(df)
}
