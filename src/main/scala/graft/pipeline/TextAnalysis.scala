package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * Everything per-row is expressed with built-in codegen'd functions where
  * exact SQL semantics exist (token counts, quality counters), and with
  * deterministic Scala UDFs where the computation is algorithmic (language
  * ID, fingerprinting). No driver-side loops; every operator is a single
  * narrow map stage — embarrassingly parallel at any scale.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  // ------------------------------------------ profile language ID (5-way)

  /** Stop-word profiles for the corpus's four Latin-script languages, in
    * the deterministic priority order ties resolve to (de > en > es > fr —
    * first listed wins). Tokens chosen disjoint across profiles; the
    * pseudo-English corpus soup itself hits only the en list (measured max
    * 8 per doc), which the 16-hit injected marker always outvotes.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "das", "mit", "sich", "auf"),
    "en" -> Seq("the", "and", "that", "have", "with", "this", "from", "they"),
    "es" -> Seq("que", "los", "una", "por", "con", "para", "como", "mas"),
    "fr" -> Seq("les", "des", "une", "pour", "dans", "est", "pas", "sur"))

  /** Han-script marker for zh (8 chars, space-separated — `\W+`
    * tokenization drops them from the Latin token stream, so zh detection
    * runs purely on the script counter).
    */
  val ZhMarker = "的 一 是 不 了 人 我 在"

  /** Minimum Han-codepoint count that classifies zh. */
  val HanMin = 8

  /** The corpus text is language-independent word soup, so the profile
    * classifier runs over a deterministic marker-injected view: every
    * doc_id % 3 != 0 document gets its labeled language's 8-token profile
    * (doubled → 16 hits, outvoting the soup's natural ≤ 8 en hits)
    * prepended; % 3 == 0 documents stay raw (classified en/und from the
    * soup alone). Both engines rebuild the identical string.
    */
  private[pipeline] def langMarked(spark: SparkSession, sfDir: String): DataFrame = {
    val marker = LangProfiles.foldLeft(when(col("lang") === "zh", lit(s"$ZhMarker $ZhMarker"))) {
      case (acc, (l, ws)) =>
        val m = ws.mkString(" ")
        acc.when(col("lang") === l, lit(s"$m $m"))
    }
    docs(spark, sfDir).select(
      col("doc_id"), col("lang"),
      when(pmod(col("doc_id"), lit(3)) =!= 0, concat(marker, lit(" "), col("text")))
        .otherwise(col("text")).as("text"))
  }

  /** 5-way language ID: Han-script counter gates zh, then stop-word
    * profile hit counts decide among de/en/es/fr (argmax, ties to the
    * profile order, all-zero → und). Pure codegen'd column expressions —
    * no UDF — mirrored term-for-term by the SQL oracle. Returns (doc_id,
    * lang, lang_pred) over the marker-injected view; the spec pins 100%
    * accuracy on injected docs.
    */
  def langIdProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    val han = size(expr(
      s"regexp_extract_all(text, '${"[\\x{4e00}-\\x{9fff}]".replace("\\", "\\\\")}', 0)"))
      .cast("long")
    val wl = split(lower(t), "\\W+")
    def hits(ws: Seq[String]): Column =
      size(filter(wl, w => w.isin(ws: _*))).cast("long")
    val Seq(d, e, s, f) = LangProfiles.map { case (_, ws) => hits(ws) }
    val pred = when(han >= HanMin, "zh")
      .when(d + e + s + f === 0L, "und")
      .when(d >= e && d >= s && d >= f, "de")
      .when(e >= s && e >= f, "en")
      .when(s >= f, "es")
      .otherwise("fr")
    langMarked(spark, sfDir).select(col("doc_id"), col("lang"), pred.as("lang_pred"))
  }

  // ----------------------------------------------- stratified sampling

  /** Per-language token budget for [[stratifiedSample]]. */
  val SampleTokenBudget = 3000L

  /** Deterministic stratified sampling to a per-stratum token budget — the
    * data-mixing step of a training pipeline (sample each language down to
    * its quota). Docs within a stratum are ordered by md5(doc_id) (a
    * deterministic shuffle both engines compute identically) and taken
    * while the RUNNING token total of preceding picks is under the budget,
    * so the first overshooting doc is still included and the pick set is a
    * pure function of the corpus.
    *
    * Scale shape: one sort-by-(lang, h) window with a running sum — a
    * per-stratum ordered scan. At 100 TB the same semantics run as
    * two-pass per-partition quotas (partial sums per partition, driver
    * prefix, exact cut in pass two); this single-window form is the
    * specification both must match.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    val nTokens = when(length(trim(t)) === 0, lit(0L))
      .otherwise(size(split(trim(t), "\\s+")).cast("long"))
    val d = docs(spark, sfDir).select(
      col("doc_id"), col("lang"), nTokens.as("n_tokens"),
      md5(col("doc_id").cast("string").cast("binary")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    d.withColumn("prior", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("prior") < SampleTokenBudget)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
  }

  /** The 100-TB implementation of [[stratifiedSample]]: the same semantics
    * without a single per-stratum window. Pass 0 range-partitions by
    * (lang, h, doc_id) so each stratum occupies a contiguous, ordered run
    * of partitions; pass 1 computes each partition's per-stratum token
    * subtotal (a (P × L)-row collect — KBs at any corpus size); the driver
    * prefix-sums those into per-(partition, stratum) starting offsets;
    * pass 2 re-walks each partition with its broadcast offset and keeps
    * rows while offset + local running total stays under the budget. Two
    * narrow passes over a ~40-byte projection, one tiny collect — no
    * global sort bottleneck beyond the range exchange.
    *
    * Spec-pinned to produce the IDENTICAL pick set as the window form.
    */
  def stratifiedSampleScalable(spark: SparkSession, sfDir: String,
      parts: Int = 8): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val t = col("text")
    val nTokens = when(length(trim(t)) === 0, lit(0L))
      .otherwise(size(split(trim(t), "\\s+")).cast("long"))
    val d = docs(spark, sfDir).select(
      col("doc_id"), col("lang"), nTokens.as("n_tokens"),
      md5(col("doc_id").cast("string").cast("binary")).as("h"))
      .repartitionByRange(parts, col("lang"), col("h"), col("doc_id"))
      .sortWithinPartitions(col("lang"), col("h"), col("doc_id"))
      .as[(Long, String, Long, String)]
      // eager cut, not persist(): pass 2's offsets are keyed by partition
      // id, so the partitioning pass 1 observed must be frozen — a cache
      // eviction + range-exchange recompute could legally redraw boundaries
      .localCheckpoint(true)

    // pass 1: per-partition per-stratum subtotals (tiny)
    val subtotals = d.mapPartitions { it =>
      var pid = -1
      val acc = scala.collection.mutable.LinkedHashMap[String, Long]()
      it.foreach { case (_, lang, n, _) =>
        pid = org.apache.spark.TaskContext.getPartitionId()
        acc.updateWith(lang)(v => Some(v.getOrElse(0L) + n))
      }
      acc.iterator.map { case (lang, n) => (pid, lang, n) }
    }.collect()

    // driver prefix: starting offset of each (partition, stratum)
    val offsets: Map[(Int, String), Long] = {
      val byLang = subtotals.groupBy(_._2)
      byLang.flatMap { case (lang, rows) =>
        var run = 0L
        rows.sortBy(_._1).map { case (pid, _, n) =>
          val off = run; run += n; ((pid, lang), off)
        }
      }
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val budget = SampleTokenBudget

    // pass 2: local running sums resumed from the broadcast offsets
    val picked = d.mapPartitions { it =>
      val off = bcOff.value
      val run = scala.collection.mutable.HashMap[String, Long]()
      it.flatMap { case (id, lang, n, _) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val prior = run.getOrElse(lang, off.getOrElse((pid, lang), 0L))
        run(lang) = prior + n
        if (prior < budget) Some((id, lang, n)) else None
      }
    }.toDF("doc_id", "lang", "n_tokens")
    picked
  }

  // ---------------------------------------------------- PII scrubbing

  /** PII patterns — the RE2 ∩ java.util.regex common subset (no
    * lookaround, no backrefs), so Spark's codegen'd regexp_replace and the
    * DuckDB oracle evaluate the identical automaton.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PhoneRe = "\\+\\d{10,11}"

  /** The corpus text is PII-free, so the scrub operator runs over a
    * deterministic PII-injected view: every doc_id % 4 == 1 document gets
    * an email, an IPv4, and an E.164-ish phone appended, all derived from
    * doc_id by plain integer arithmetic — the exact string both engines
    * rebuild (the docsWithDups pattern).
    */
  private[pipeline] def piiDocs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(4)) === 1,
        concat(col("text"),
          lit(" reach user"), col("doc_id").cast("string"), lit("@example.com at 10."),
          pmod(col("doc_id"), lit(256)).cast("string"), lit(".0."),
          pmod(col("doc_id"), lit(100)).cast("string"),
          lit(" or +1555"), lpad(pmod(col("doc_id"), lit(10000000)).cast("string"), 7, "0")))
        .otherwise(col("text")).as("text"))

  /** Count and redact emails / IPv4s / phone numbers — the redaction pass
    * every training-data pipeline runs before release. Pure codegen'd
    * column expressions (counts from regexp_extract_all, redaction from a
    * regexp_replace chain, emails first so the later automata never see
    * their text); one narrow map stage, scales embarrassingly.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    // expr() parses a SQL string literal (backslash-unescaping), the Column
    // regexp_replace below takes the pattern raw — double only here
    def cnt(re: String): Column =
      size(expr(s"regexp_extract_all(text, '${re.replace("\\", "\\\\")}', 0)")).cast("long")
    piiDocs(spark, sfDir).select(
      col("doc_id"),
      cnt(EmailRe).as("n_emails"),
      cnt(Ipv4Re).as("n_ipv4"),
      cnt(PhoneRe).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("scrubbed"))
  }

  /** Whitespace token count — built-in split, no UDF. */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      when(length(trim(col("text"))) === 0, lit(0L))
        .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
        .as("n_tokens"))

  /** BPE-ish subword count: runs of letters, runs of digits, single other
    * non-space chars — the standard pre-tokenizer shape. Codegen'd regexp
    * (RE2-compatible so the DuckDB oracle evaluates the same pattern).
    */
  def subwordCounts(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
        .cast("long").as("n_subwords"))

  /** Quality counters + integer score. All counts are in UTF-8 bytes
    * (octet_length) with ASCII character classes, so Spark (UTF-16 strings)
    * and DuckDB (UTF-8 strings) agree exactly on any input.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    def bytes(c: Column): Column = octet_length(c).cast("long")
    val nBytes = bytes(col("text"))
    val punct = nBytes - bytes(regexp_replace(col("text"), "[.!?,;:]", ""))
    val letters = nBytes - bytes(regexp_replace(col("text"), "[A-Za-z]", ""))
    val spaces = nBytes - bytes(regexp_replace(col("text"), " ", ""))
    d.select(
      col("doc_id"), nBytes.as("n_bytes"), punct.as("n_punct"),
      letters.as("n_letters"), spaces.as("n_spaces"),
      // integer quality heuristic: letters weighted up, punctuation down,
      // clamped at zero — same formula in the oracle SQL
      greatest(lit(0L), letters * 2 + spaces - punct * 3).as("score"))
  }

  /** Gopher stop-word list (Rae et al. 2021, §A.1.1): a document must
    * contain ≥ 2 of these to pass the stop-word rule. Counted as token
    * OCCURRENCES (a doc with "the … the" passes), the interpretation the
    * public reimplementations use (e.g. HuggingFace DataTrove's
    * GopherQualityFilter sums per-token membership).
    */
  val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The documented Gopher quality rules (Rae et al. 2021, "Scaling Language
    * Models: ...", Appendix A quality filtering) as pure column
    * expressions — all counters are integers and every threshold is an
    * integer cross-multiplication, so the DuckDB oracle agrees exactly
    * (no float ratio ever compared):
    *
    *   1. word count in [50, 100_000]
    *   2. mean word length in [3, 10] (bytes — corpus is ASCII; byte counts
    *      keep Spark UTF-16 and DuckDB UTF-8 engines exact)
    *   3. symbol-to-word ratio (# and "...") ≤ 0.1
    *   4. lines starting with a bullet ≤ 90%
    *   5. lines ending with an ellipsis ≤ 30%
    *   6. words with ≥ 1 alphabetic char ≥ 80%
    *   7. ≥ 2 distinct Gopher stop-words present
    *   8. duplicate-line fraction ≤ 30% (the line-level repetition rule)
    *
    * One narrow codegen'd map — no UDF, no shuffle; at 100 TB this is a
    * pure scan-rate operator.
    */
  def qualityGopher(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    def bytes(c: Column): Column = octet_length(c).cast("long")
    val ws = when(length(trim(t)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(t), "\\s+"))
    val nWords = size(ws).cast("long")
    val sumWordBytes = bytes(regexp_replace(t, "\\s", ""))
    val nHash = bytes(t) - bytes(regexp_replace(t, "#", ""))
    // byte delta is always a multiple of 3, so the double division is exact
    // and the cast back to long loses nothing
    val nEllipsis = ((bytes(t) - bytes(expr("replace(text, '...', '')"))) / lit(3)).cast("long")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      l.startsWith("•") || l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val nEllLines = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val nDupLines = nLines - size(array_distinct(lines)).cast("long")
    val nAlphaWords = size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long")
    val wl = when(length(trim(t)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(t), "\\W+"))
    // stop-word OCCURRENCES (see GopherStops doc), not distinct types
    val stopHits = size(filter(wl, w => w.isin(GopherStops: _*))).cast("long")
    val pass =
      nWords.between(50L, 100000L) &&
        (sumWordBytes >= nWords * 3L) && (sumWordBytes <= nWords * 10L) &&
        ((nHash + nEllipsis) * 10L <= nWords) &&
        (nBullet * 10L <= nLines * 9L) &&
        (nEllLines * 10L <= nLines * 3L) &&
        (nAlphaWords * 10L >= nWords * 8L) &&
        (stopHits >= 2L) &&
        (nDupLines * 10L <= nLines * 3L)
    docs(spark, sfDir).select(
      col("doc_id"),
      nWords.as("n_words"),
      sumWordBytes.as("word_bytes"),
      (nHash + nEllipsis).as("n_symbols"),
      nLines.as("n_lines"),
      nBullet.as("n_bullet_lines"),
      nEllLines.as("n_ellipsis_lines"),
      nDupLines.as("n_dup_lines"),
      nAlphaWords.as("n_alpha_words"),
      stopHits.as("n_stop_hits"),
      when(pass, 1L).otherwise(0L).as("pass"))
  }

  // ------------------------------------------- exact distributed quantiles

  /** Exact per-source deciles of document length (n_chars) WITHOUT a
    * global sort: aggregate a (source, value) histogram, cumulative-sum it
    * over the DISTINCT values per source (a window over the bounded
    * value-histogram, never the row set), and pick decile k as the
    * smallest value whose inclusive cumulative count reaches ⌈k·n/10⌉ —
    * percentile_disc semantics in pure integer arithmetic
    * (cum ≥ ⌈kn/10⌉ ⟺ 10·cum ≥ k·n). The corpus-profiling step a data
    * pipeline runs per source/shard before choosing length cutoffs.
    *
    * Scale shape: one (source, value)-keyed map-side-combined agg, a
    * per-source scan over distinct values, a 9-row broadcast cross join —
    * the row set itself is never sorted or shuffled wider than the
    * histogram. Returns (source, decile 1..9, value).
    */
  def lenDeciles(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val hist = docs(spark, sfDir).groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"))
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
    val tot = hist.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val ks = (1 to 9).map(_.toLong).toDF("decile")
    cum.join(tot, Seq("source"))
      .join(broadcast(ks))
      .filter(col("cum") * 10L >= col("decile") * col("n"))
      .groupBy(col("source"), col("decile"))
      .agg(min(col("n_chars")).as("value"))
  }

  // ------------------------------------------------- C4 cleaning rules

  /** The corpus text is single-line and punctuation-free, so the C4 rules
    * run over a deterministic injected view (the [[piiDocs]] pattern):
    * doc_id % 5 picks one of five line/sentence structures — a clean pass,
    * a "lorem ipsum" page, a curly-brace page, a page whose non-sentence /
    * "javascript" lines are dropped until < 3 sentences remain, and a
    * page with no terminal punctuation at all. Both engines rebuild the
    * identical string with integer arithmetic only.
    */
  private[pipeline] def c4Docs(spark: SparkSession, sfDir: String): DataFrame = {
    val base = col("text")
    val m = pmod(col("doc_id"), lit(5))
    val v = when(m === 0, concat(base, lit(". This is a good sentence. It ends well today.")))
      .when(m === 1, concat(base, lit(". This is a good sentence. It ends well. lorem ipsum dolor sit.")))
      .when(m === 2, concat(base, lit(". This line has a { brace. It still ends well today.")))
      .when(m === 3, concat(base, lit(".\nno terminal punctuation on this line\nPlease enable javascript in your browser now.\nAnother full sentence is right here.")))
      .otherwise(base)
    docs(spark, sfDir).select(col("doc_id"), v.as("text"))
  }

  /** The documented C4 cleaning heuristics (Raffel et al. 2020, "Exploring
    * the Limits of Transfer Learning...", §2.2 — public) as pure column
    * expressions:
    *
    *   - keep only lines that end in terminal punctuation (`.` `!` `?` `"`)
    *     AND contain ≥ 5 words AND do not mention "javascript"
    *   - drop the whole page if the cleaned text has < 3 sentences
    *     (terminal-punctuation count over kept lines)
    *   - drop pages containing "lorem ipsum" (case-insensitive) or `{`
    *
    * All counters are integers and the cleaned text is an exact string, so
    * the DuckDB oracle agrees byte-for-byte. One narrow codegen'd map — a
    * pure scan-rate operator at 100 TB, like [[qualityGopher]].
    */
  /** Unicode NFC canonicalization over a deterministic injected view (the
    * piiScrub idiom — the base corpus is ASCII, so the mixed-composition
    * reality of multilingual web text is injected identically in both
    * engines): doc_id % 4 == 2 docs gain a DECOMPOSED suffix (e + U+0301,
    * i + U+0308 — combining marks), doc_id % 4 == 3 docs gain an already-
    * PRECOMPOSED suffix (U+00E9), the rest stay raw ASCII. The engine
    * normalizes with the codegen'd native [[graft.functions.NfcExpr]]
    * (UAX #15 via java.text.Normalizer); the oracle uses DuckDB's own
    * independent `nfc_normalize` — two implementations of the public
    * standard agreeing byte-for-byte. Returns (doc_id, changed,
    * n_chars_raw, n_chars_nfc, text_nfc): only the decomposed class may
    * change, and its codepoint count must SHRINK (marks compose away).
    * Scan-rate at any scale — one narrow codegen'd map, no shuffle.
    */
  def textNfc(spark: SparkSession, sfDir: String): DataFrame = {
    val injected = docs(spark, sfDir).select(col("doc_id"),
      when(col("doc_id") % 4 === 2,
        concat(col("text"), lit(" cafe\u0301 nai\u0308ve")))
        .when(col("doc_id") % 4 === 3,
          concat(col("text"), lit(" caf\u00e9 plain")))
        .otherwise(col("text")).as("t"))
    injected.select(col("doc_id"),
        col("t"), graft.functions.NfcExpr.nfcCol(col("t")).as("n"))
      .select(col("doc_id"),
        when(col("n") =!= col("t"), 1L).otherwise(0L).as("changed"),
        length(col("t")).cast("long").as("n_chars_raw"),
        length(col("n")).cast("long").as("n_chars_nfc"),
        col("n").as("text_nfc"))
  }

  /** Exact-integer unigram token entropy per document — the classic
    * low-diversity / template-page quality signal (a page repeating one
    * token scores 0; maximal-diversity text scores log2(n_tokens)):
    *
    *   H_q16(d) = (Σ_w tf_w · (log2fix(dl) − log2fix(tf_w))) div dl
    *
    * which is Σ (tf/dl)·log2(dl/tf) carried in Q16 with one final floor —
    * every intermediate a Long, so the DuckDB oracle bit-replays the
    * transcendental via the same unrolled Turner iteration as dd_lm_score.
    * Overflow audit: tf ≤ dl ≤ 2^36 keeps tf·lg ≤ 2^36·(36·2^16) < 2^58.
    *
    * Scale shape: one (doc_id, term) map-side-combined aggregation then a
    * per-doc agg; log2fix runs only over DISTINCT (tf and dl) values via a
    * broadcast lookup table (the [[Lm.lmScore]] discipline) — the token
    * stream shuffles once and no transcendental touches the wide path.
    */
  def unigramEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val tf = docs(spark, sfDir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\W+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val per = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"), count(lit(1)).as("n_types"))
      .localCheckpoint(true)
    // log2fix over distinct tf and dl values only — a tiny broadcast table
    val lgtab = tf.select(col("tf").as("v")).union(per.select(col("dl").as("v")))
      .distinct().as[Long].map(v => (v, Lm.log2fix(v))).toDF("v", "lg")
    val sumTf = tf
      .join(broadcast(lgtab.withColumnRenamed("v", "tv").withColumnRenamed("lg", "lgt")),
        col("tf") === col("tv"))
      .groupBy(col("doc_id")).agg(sum(col("tf") * col("lgt")).as("s_tf_lg"))
    val scored = per
      .join(broadcast(lgtab.withColumnRenamed("v", "dv").withColumnRenamed("lg", "lgd")),
        col("dl") === col("dv"))
      .join(sumTf, Seq("doc_id"))
      .select(col("doc_id"), col("dl").as("n_tokens"), col("n_types"),
        expr("CAST((dl * lgd - s_tf_lg) div dl AS BIGINT)").as("entropy_q16"))
    docs(spark, sfDir).select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("entropy_q16"), lit(0L)).as("entropy_q16"))
  }

  def qualityC4(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    def bytes(c: Column): Column = octet_length(c).cast("long")
    val lines = split(t, "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= 5 &&
        !lower(l).contains("javascript"))
    val cleaned = array_join(kept, "\n")
    val nSentences = bytes(cleaned) - bytes(regexp_replace(cleaned, "[.!?]", ""))
    val hasLorem = when(lower(t).contains("lorem ipsum"), 1L).otherwise(0L)
    val hasBrace = when(t.contains("{"), 1L).otherwise(0L)
    val pass = when(
      nSentences >= 3L && hasLorem === 0L && hasBrace === 0L, 1L).otherwise(0L)
    c4Docs(spark, sfDir).select(
      col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      nSentences.as("n_sentences"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      pass.as("pass"),
      cleaned.as("cleaned"))
  }

  private val DeStop = Set("der", "die", "das", "und", "ist", "nicht", "ein",
    "eine", "mit", "von", "auf", "für", "dem", "den", "sich", "im")
  private val EnStop = Set("the", "and", "is", "of", "to", "a", "in", "that",
    "it", "was", "for", "on", "with", "as", "this")

  /** Heuristic language ID: CJK codepoint density → ja; else stopword vote
    * between de/en n-gram profiles. Deterministic pure function.
    */
  def langIdOf(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var total = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (!Character.isWhitespace(cp)) {
        total += 1
        val b = Character.UnicodeScript.of(cp)
        if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
          b == Character.UnicodeScript.KATAKANA) cjk += 1
      }
      i += Character.charCount(cp)
    }
    if (total > 0 && cjk * 5 >= total) "ja"
    else {
      val words = text.toLowerCase.split("\\W+")
      var de = 0
      var en = 0
      words.foreach { w => if (DeStop(w)) de += 1; if (EnStop(w)) en += 1 }
      if (de > en) "de" else "en"
    }
  }

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val f = udf(langIdOf _)
    docs(spark, sfDir).select(col("doc_id"), col("lang"), f(col("text")).as("lang_pred"))
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03) over fixed
    * 16-gram bands: md5 of each 5-char gram, lexicographic minimum per band,
    * consecutive equal band-minima collapsed. md5 (not a rolling hash) keeps
    * the computation exactly reproducible by the DuckDB oracle; a production
    * deployment swaps in a rolling 64-bit hash — the dataflow (narrow map +
    * small per-doc explode, nothing wide) is identical.
    *
    * Emitted as scalar rows (doc_id, band, gram_md5) — array columns are
    * opaque to the driver's comparator and to most downstream SQL.
    */
  def fingerprintRowsOf(text: String): Seq[(Long, String)] = {
    if (text == null || text.length < 5) return Nil
    val md = java.security.MessageDigest.getInstance("MD5")
    val nGrams = text.length - 4
    val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var band = 0L
    var last: String = null
    var i = 0
    while (i < nGrams) {
      val end = math.min(i + 16, nGrams)
      var m: String = null
      var j = i
      while (j < end) {
        val h = hexOf(md.digest(
          text.substring(j, j + 5).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        if (m == null || h.compareTo(m) < 0) m = h
        j += 1
      }
      if (last == null || m != last) { out += ((band, m)); last = m }
      band += 1
      i += 16
    }
    out.toSeq
  }

  private val HexDigits = "0123456789abcdef".toCharArray
  def hexOf(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  @inline def mix64(z0: Long): Long = {
    var z = z0 * 0xbf58476d1ce4e5b9L
    z ^= z >>> 32; z *= 0x94d049bb133111ebL
    z ^= z >>> 29
    z
  }

  def fingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    docs(spark, sfDir).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        fingerprintRowsOf(t).map { case (b, h) => (id, b, h) }
      }
      .toDF("doc_id", "band", "gram_md5")
  }
}
