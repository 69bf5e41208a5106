package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.queries.{AnalyticsQueries => A, CrawlQueries => C}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names map to the SURVEY.md §2 operator inventory; each has an exact
  * DuckDB oracle in [[oracleSql]]. Crawl-engine queries run over the
  * deterministic synthetic corpus (graft.corpus.CorpusGen, seed=42) and are
  * checked against the generator's ground-truth tables (`links`, `meta`,
  * `robots`) which only the oracle reads — the engine itself sees nothing but
  * `pages(url, warc_ts, html, text, lang)` per BASELINE.json's input_hint.
  */
object SparkEntry {

  /** Corpus ground-truth location for the sf0.01 verify run (the driver's
    * DuckDB oracle reads these parquet files directly; Verify materializes
    * them before any oracle runs).
    */
  private val Corpus = "/root/repo/work/corpus/sf0.01"
  private def gt(table: String): String =
    s"read_parquet('$Corpus/$table.parquet/*.parquet')"

  /** Min-depth BFS reachability over the ground-truth link graph — the
    * relational statement of the reference's FIFO crawl (SURVEY §7.4a).
    */
  private val reachCte =
    s"""WITH RECURSIVE reach(url, depth) AS (
       |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth
       |  UNION
       |  SELECT l.dst_url, r.depth + 1
       |  FROM reach r JOIN ${gt("links")} l ON l.src_url = r.url
       |  WHERE r.depth < 64
       |), seen AS (SELECT url, MIN(depth) AS depth FROM reach GROUP BY url)""".stripMargin

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: a full crawl of
    * the synthetic corpus from the host0 seed, returning the saved pages.
    */
  def entry(spark: SparkSession): DataFrame =
    C.fullCrawl(spark, "/root/testdata/sf0.001").saved

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- crawl engine (SURVEY §2.1-§2.9 over the synthetic corpus) ----
    "crawl_bfs_seen" -> ((s, d) => C.bfsSeen(s, d)),
    "crawl_saved_titles" -> ((s, d) => C.savedTitles(s, d)),
    "crawl_saved_articles" -> ((s, d) => C.savedArticles(s, d)),
    "crawl_limit_cut" -> ((s, d) => C.limitCut(s, d, 100)),
    "crawl_robots_seen" -> ((s, d) => C.robotsSeen(s, d)),
    "crawl_follow_seen" -> ((s, d) => C.followSeen(s, d)),
    "crawl_resume_seen" -> ((s, d) => C.resumedSeen(s, d)),
    "crawl_wave_metrics" -> ((s, d) => C.waveMetrics(s, d)),
    "crawl_link_extract" -> ((s, d) => C.linkExtract(s, d)),
    "crawl_extract_titles" -> ((s, d) => C.extractTitles(s, d)),
    "crawl_robots_blocked" -> ((s, d) => C.robotsBlocked(s, d)),
    "crawl_host_budget" -> ((s, d) => C.hostBudget(s, d, 50)),
    "crawl_list_dedup" -> ((s, d) => C.listDedup(s, d)),
    "crawl_url_normalize" -> ((s, d) => C.urlNormalize(s, d)),
    "crawl_glob_match" -> ((s, d) => C.globMatch(s, d)),
    "crawl_sink_jsonl" -> ((s, d) => C.sinkJsonl(s, d)),
    "crawl_sink_xml" -> ((s, d) => C.sinkXml(s, d)),
    "crawl_sink_json" -> ((s, d) => C.sinkJson(s, d)),
    // ---- relational primitives the engine is built from (§2.3-§2.7) ----
    "q1_agg" -> ((s, d) => A.q1Agg(s, d)),
    "q_join_agg" -> ((s, d) => A.joinAgg(s, d)),
    "q_anti_join" -> ((s, d) => A.antiJoin(s, d)),
    "q_semi_join" -> ((s, d) => A.semiJoin(s, d)),
    "q_window_running" -> ((s, d) => A.windowRunning(s, d)),
    "q_topk" -> ((s, d) => A.topK(s, d)),
    "q_union_distinct" -> ((s, d) => A.unionDistinct(s, d)),
    "q_dim_chain" -> ((s, d) => A.dimChain(s, d)),
    // ---- training-data pipeline ops (dedup / similarity / text / blob) ----
    "dd_exact_groups" -> ((s, d) => Dedup.exactGroups(s, d)),
    "dd_minhash_pairs" -> ((s, d) => Dedup.minhashPairs(s, d)),
    "dd_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dd_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "dd_token_count" -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "dd_subword_count" -> ((s, d) => TextAnalysis.subwordCounts(s, d)),
    "dd_quality" -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "dd_lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "dd_fingerprint" -> ((s, d) => TextAnalysis.fingerprints(s, d)),
    "ann_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "ann_lsh_topk" -> ((s, d) => Similarity.lshTopK(s, d)),
    "ann_dup_pairs" -> ((s, d) => Similarity.embeddingDupPairs(s, d)),
    "mm_blob_meta" -> ((s, d) => Multimodal.blobMeta(s, d)),
    "mm_blob_features" -> ((s, d) => Multimodal.blobFeatures(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (TPC-H-ish tables by name; corpus ground truth
    * via read_parquet absolute paths).
    */
  def oracleSql: Map[String, String] = Map(
    "crawl_bfs_seen" ->
      s"""$reachCte
         |SELECT url, CAST(depth AS BIGINT) AS depth FROM seen""".stripMargin,
    "crawl_saved_titles" ->
      s"""$reachCte
         |SELECT m.url, m.title FROM seen r JOIN ${gt("meta")} m ON m.url = r.url""".stripMargin,
    "crawl_saved_articles" ->
      s"""$reachCte
         |SELECT m.url, m.title FROM seen r JOIN ${gt("meta")} m ON m.url = r.url
         |WHERE m.section = 'articles'""".stripMargin,
    "crawl_limit_cut" -> "SELECT CAST(100 AS BIGINT) AS saved_cnt",
    "crawl_robots_seen" ->
      s"""WITH RECURSIVE reach(url, depth) AS (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth
         |  UNION
         |  SELECT l.dst_url, r.depth + 1
         |  FROM reach r JOIN ${gt("links")} l ON l.src_url = r.url
         |  WHERE r.depth < 64 AND NOT EXISTS (
         |    SELECT 1 FROM ${gt("robots")} rb
         |    WHERE l.dst_url LIKE 'http://' || rb.host || rb.disallow_prefix || '%')
         |)
         |SELECT url, CAST(MIN(depth) AS BIGINT) AS depth FROM reach GROUP BY url""".stripMargin,
    "crawl_follow_seen" ->
      s"""WITH RECURSIVE reach(url, depth) AS (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth
         |  UNION
         |  SELECT l.dst_url, r.depth + 1
         |  FROM reach r JOIN ${gt("links")} l ON l.src_url = r.url
         |  WHERE r.depth < 64 AND (
         |    regexp_replace(l.dst_url, '^https?://[^/]*', '') = '/'
         |    OR regexp_replace(l.dst_url, '^https?://[^/]*', '') LIKE '/articles/%'
         |    OR regexp_replace(l.dst_url, '^https?://[^/]*', '') LIKE '/docs/%')
         |)
         |SELECT url, CAST(MIN(depth) AS BIGINT) AS depth FROM reach GROUP BY url""".stripMargin,
    "crawl_resume_seen" ->
      s"""$reachCte
         |SELECT url, CAST(depth AS BIGINT) AS depth FROM seen""".stripMargin,
    "crawl_wave_metrics" ->
      s"""$reachCte
         |SELECT CAST(r.depth AS BIGINT) AS depth,
         |       COUNT(*) AS popped,
         |       CAST(SUM(CASE WHEN m.url IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS fetched
         |FROM seen r LEFT JOIN ${gt("meta")} m ON m.url = r.url
         |GROUP BY 1""".stripMargin,
    "crawl_link_extract" ->
      s"SELECT src_url, dst_url, CAST(pos AS BIGINT) AS pos FROM ${gt("links")}",
    "crawl_extract_titles" ->
      s"SELECT url, title FROM ${gt("meta")}",
    "crawl_robots_blocked" ->
      s"""SELECT l.src_url, l.dst_url
         |FROM ${gt("links")} l
         |JOIN ${gt("robots")} r
         |  ON l.dst_url LIKE 'http://' || r.host || r.disallow_prefix || '%'""".stripMargin,
    "crawl_host_budget" ->
      s"""SELECT host, CAST(LEAST(50, COUNT(*)) AS BIGINT) AS saved_cnt
         |FROM ${gt("meta")} GROUP BY host""".stripMargin,
    "crawl_list_dedup" ->
      s"""SELECT url,
         |  CAST(ROW_NUMBER() OVER (ORDER BY host_idx, page_idx) - 1 AS BIGINT) AS first_line
         |FROM ${gt("meta")}""".stripMargin,
    "crawl_url_normalize" ->
      s"""SELECT url || '#section' AS input, url AS normalized FROM ${gt("meta")}
         |UNION ALL SELECT substr(url, 8), url FROM ${gt("meta")}
         |UNION ALL SELECT url || '/', url FROM ${gt("meta")}
         |UNION ALL SELECT url || '?q=a&b=c#x', url || '?q=a&b=c' FROM ${gt("meta")}""".stripMargin,
    "crawl_glob_match" ->
      s"""WITH paths AS (
         |  SELECT DISTINCT regexp_replace(url, '^https?://[^/]*', '') AS path FROM ${gt("meta")}
         |), pats AS (
         |  SELECT * FROM (VALUES ('/articles/**'), ('**/page-1'), ('/docs/*'), ('/')) AS t(pattern)
         |)
         |SELECT p.path, q.pattern,
         |  CAST(CASE q.pattern
         |    WHEN '/articles/**' THEN CASE WHEN p.path LIKE '/articles/%' THEN 1 ELSE 0 END
         |    WHEN '**/page-1' THEN CASE WHEN p.path LIKE '%/page-1' THEN 1 ELSE 0 END
         |    WHEN '/docs/*' THEN CASE WHEN p.path LIKE '/docs/%' AND p.path NOT LIKE '/docs/%/%' THEN 1 ELSE 0 END
         |    WHEN '/' THEN CASE WHEN p.path = '/' THEN 1 ELSE 0 END
         |  END AS BIGINT) AS matched
         |FROM paths p CROSS JOIN pats q""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01')""".stripMargin,
    "q_semi_join" ->
      """SELECT p_brand, COUNT(*) AS n_parts FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
        |GROUP BY p_brand""".stripMargin,
    "q_window_running" ->
      """SELECT event_id, user_id,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT) AS running_v100
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_union_distinct" ->
      """SELECT DISTINCT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  UNION ALL SELECT c_custkey FROM customer)""".stripMargin,
    "q_dim_chain" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "dd_exact_groups" ->
      """SELECT md5(text) AS text_md5, COUNT(*) AS cnt, MIN(doc_id) AS keeper_id
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL
        |      SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0)
        |GROUP BY 1""".stripMargin,
    "dd_token_count" ->
      """SELECT doc_id,
        |  CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
        |       ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |  END AS n_tokens
        |FROM documents""".stripMargin,
    "dd_subword_count" ->
      """SELECT doc_id,
        |  CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        |    AS n_subwords
        |FROM documents""".stripMargin,
    "dd_quality" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(strlen(text) - strlen(regexp_replace(text, '[.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(strlen(text) - strlen(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_letters,
        |  CAST(strlen(text) - strlen(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS n_spaces,
        |  CAST(GREATEST(0,
        |    (strlen(text) - strlen(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 2
        |    + (strlen(text) - strlen(regexp_replace(text, ' ', '', 'g')))
        |    - (strlen(text) - strlen(regexp_replace(text, '[.!?,;:]', '', 'g'))) * 3) AS BIGINT) AS score
        |FROM documents""".stripMargin,
    "ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 20),
        |scored AS (
        |  SELECT q.qid, e.vec_id AS nid,
        |    list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS c
        |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid)
        |SELECT query_id, rank, neighbor_id FROM (
        |  SELECT qid AS query_id, nid AS neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin,
    "mm_blob_meta" ->
      s"""SELECT url, CAST(octet_length(html) AS BIGINT) AS n_bytes,
         |  CAST(CASE WHEN substr(CAST(html AS VARCHAR), 1, 5) = '<html' THEN 1 ELSE 0 END AS BIGINT) AS is_html
         |FROM ${gt("pages")}""".stripMargin,
  )
}
