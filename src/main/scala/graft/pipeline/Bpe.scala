package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer trained on the corpus
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units" — the standard LLM-pipeline subword algorithm).
  *
  * Exactness design (the k-means/pagerank oracle pattern):
  *   - pair counts are exact integer sums over (distinct word, freq) — no
  *     floats anywhere;
  *   - the best pair per step is a TOTAL order: count desc, then symbol
  *     pair lexicographic (symbols are ASCII `\w` chars, where Spark UTF-16
  *     and DuckDB UTF-8 binary orders agree);
  *   - a symbol sequence is one string of bracketed tokens, `(h)(e)(y)`.
  *     `(` and `)` cannot occur inside a symbol, so `replace(s,
  *     "(a)(b)", "(ab)")` matches only at token boundaries — and because
  *     SQL replace substitutes non-overlapping occurrences LEFT-TO-RIGHT,
  *     one replace call IS greedy BPE merge application (overlap case
  *     `(a)(a)(a)` → `(aa)(a)`, exactly BPE's skip), in Spark and DuckDB
  *     identically. No per-word recursion in either engine.
  *
  * Scale shape: training state is the DISTINCT-word table (vocabulary-
  * bounded, ≪ corpus; shuffles only (word, freq) pairs) and per step one
  * explode+groupBy for pair counts plus one narrow replace. Only the argmax
  * row per step reaches the driver — the merge table is the model, K rows,
  * exactly like the k-means centroids. Token counting joins docs' words
  * against the tokenized vocabulary — text never carries the merge loop.
  */
object Bpe {

  val NumMerges = 8

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** (word, freq) over the corpus: lowercase `\W+` tokens (pure ASCII
    * `[a-z0-9_]`, so bracket/pipe metacharacters cannot occur in symbols).
    */
  def wordFreqs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\W+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  private val initSeq = udf((w: String) => w.map(c => s"($c)").mkString)

  /** How many merges may chain their (narrow) sequence rewrites before the
    * vocabulary table is re-checkpointed — bounds Catalyst plan depth
    * without paying a materialization job per merge.
    */
  val SeqCheckpointEvery = 8

  /** The adjacent-pair multiset of a (freq, s) table, `sign`-weighted:
    * (a, b, cnt = Σ sign·freq).
    */
  private def pairCountsOf(df: DataFrame, sign: Long): DataFrame =
    df.select((col("freq") * sign).as("freq"),
        expr("regexp_extract_all(s, '\\\\(([^)]*)\\\\)', 1)").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> " +
          "struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train [[NumMerges]] merges; returns the merge table (step, sym_a,
    * sym_b) — the driver-held model — and leaves per-step work distributed.
    *
    * INCREMENTAL pair-count maintenance (the standard trainer shape): the
    * full pair extraction runs ONCE; each merge then (1) collects the
    * argmax row of the maintained pair-count table and (2) folds in the
    * count deltas of only the words whose sequence CONTAINS the merged
    * pair — merging (a,b) can only destroy pairs overlapping an (a)(b)
    * occurrence and create pairs touching the new (ab) symbol, both
    * confined to those words. Result is bit-identical to a full recount
    * per step (the DuckDB oracle IS the full recount, unrolled).
    *
    * Job-count bound: exactly 2 jobs per merge (argmax collect + delta
    * fold into the checkpointed count table), plus one vocabulary rewrite
    * checkpoint every [[SeqCheckpointEvery]] merges — ~2.1 jobs/merge
    * hard. Per-merge DATA is the pair table (vocabulary-pair-bounded,
    * shrinking) and the affected words only, not the corpus and not the
    * full vocabulary: a 32k-merge vocab is ~67k small jobs instead of 64k
    * full-vocabulary pair re-extractions.
    */
  def trainMerges(spark: SparkSession, sfDir: String): Seq[(Int, String, String)] = {
    var seqs = wordFreqs(spark, sfDir)
      .select(col("w"), col("freq"), initSeq(col("w")).as("s"))
      .localCheckpoint(true)
    var pairCounts = pairCountsOf(seqs, 1L).localCheckpoint(true)
    var sinceSeqCk = 0
    val merges = Seq.newBuilder[(Int, String, String)]
    for (k <- 1 to NumMerges) {
      val best = pairCounts.filter(col("cnt") > 0)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1).collect()
      if (best.nonEmpty) {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((k, a, b))
        // symbols are ASCII \w chars — safe to inline as SQL literals;
        // parens cannot occur inside a symbol, so the literal matches only
        // whole adjacent tokens, and replace's left-to-right non-overlap
        // IS greedy BPE application
        val affected = seqs.filter(col("s").contains(s"($a)($b)"))
        val rewritten = affected.withColumn("s", expr(s"replace(s, '($a)($b)', '($a$b)')"))
        val prevPc = pairCounts
        pairCounts = pairCounts
          .unionByName(pairCountsOf(affected, -1L))
          .unionByName(pairCountsOf(rewritten, 1L))
          .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") =!= 0L)
          .localCheckpoint(true) // job 2 of the merge: the delta fold
        prevPc.unpersist()
        // the vocabulary rewrite itself is narrow — chain it lazily and
        // re-checkpoint only every SeqCheckpointEvery merges (plan-depth
        // bound, not a correctness point)
        val prev = seqs
        seqs = seqs.withColumn("s", expr(s"replace(s, '($a)($b)', '($a$b)')"))
        sinceSeqCk += 1
        if (sinceSeqCk >= SeqCheckpointEvery) {
          seqs = seqs.localCheckpoint(true)
          prev.unpersist()
          sinceSeqCk = 0
        }
      }
    }
    merges.result()
  }

  /** The learned merge table as a DataFrame (driver row `dd_bpe_merges`). */
  def mergeTable(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    trainMerges(spark, sfDir)
      .map { case (k, a, b) => (k.toLong, a, b) }
      .toDF("step", "sym_a", "sym_b")
  }

  /** Per-document BPE token count under the learned merges: tokenize the
    * vocabulary once (apply the K replaces to the distinct-word table; the
    * token count of a word is its `(` count), then join each document's
    * words against it — the merge loop never touches document text.
    */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = trainMerges(spark, sfDir)
    var vocab = wordFreqs(spark, sfDir).select(col("w"), initSeq(col("w")).as("s"))
    merges.foreach { case (_, a, b) =>
      vocab = vocab.withColumn("s", expr(s"replace(s, '($a)($b)', '($a$b)')"))
    }
    val tokenized = vocab.select(col("w"),
      (octet_length(col("s")) - octet_length(expr("replace(s, '(', '')")))
        .cast("long").as("nt"))
    val docWords = docs(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\W+")).as("w"))
      .filter(col("w") =!= "")
    val agg = docWords.join(tokenized, Seq("w"))
      .groupBy(col("doc_id")).agg(sum(col("nt")).as("n"))
    docs(spark, sfDir).select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n"), lit(0L)).as("n_bpe_tokens"))
  }
}
