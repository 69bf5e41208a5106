package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.{Bpe, Dedup, Multimodal, Search, Similarity, TextAnalysis}
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

  /** Corpus ground-truth location placeholder: graft.Verify substitutes the
    * actual corpus dir for the sfDir it runs at (CorpusGen.corpusDir) before
    * dumping oracle_sql.json, so the oracle always reads the ground truth of
    * the scale factor actually verified.
    */
  val CorpusPlaceholder = "__CORPUS__"
  private def gt(table: String): String =
    s"read_parquet('$CorpusPlaceholder/$table.parquet/*.parquet')"

  // ---- SQL helpers for oracle construction -------------------------------

  private val B = "\\"

  /** Go encoding/json escaping (graft.sinks.Sinks.goJsonEscape) as a DuckDB
    * replace chain — covers the characters that can occur in corpus
    * titles/urls/markdown (backslash, quote, \n \r \t, < > &; full control
    * range is Scala-side only).
    */
  private def escSql(e: String): String =
    Seq(
      (s"'$B'", s"'$B$B'"),
      ("'\"'", s"'$B\"'"),
      ("chr(10)", s"'${B}n'"),
      ("chr(13)", s"'${B}r'"),
      ("chr(9)", s"'${B}t'"),
      ("'<'", s"'${B}u003c'"),
      ("'>'", s"'${B}u003e'"),
      ("'&'", s"'${B}u0026'"),
    ).foldLeft(e) { case (acc, (f, r)) => s"replace($acc, $f, $r)" }

  /** CorpusGen.TableMd as a chr(10)-joined SQL literal. */
  private val tableMdSql = graft.corpus.CorpusGen.TableMd
    .split("\n").map(l => s"'$l'").mkString(" || chr(10) || ")

  /** The duplicate-injected documents view (graft.pipeline.Dedup.docsWithDups)
    * reproduced in SQL: exact dups verbatim, near dups with one word swapped
    * at a modular-arithmetic index.
    */
  private val dupDocsCte =
    """dup_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    array_to_string(
      |      [CASE WHEN i = CAST(((doc_id % 1000003) * 2654435761) % len(ws) AS BIGINT) + 1
      |            THEN 'zzyzx' ELSE ws[i] END
      |       for i in generate_series(1, len(ws))], ' ') AS text
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
      |        FROM documents WHERE doc_id % 5 = 0))""".stripMargin

  /** Distinct 3-word shingles (graft.pipeline.Dedup.shingleSet, as strings —
    * Jaccard over distinct shingle strings equals Jaccard over their
    * collision-free hashes) for a docs CTE named `dup_docs`.
    */
  private val shinglesCte =
    """shx AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
      |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
      |         ELSE list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                             for i in generate_series(1, len(ws)-2)]) END AS sh
      |  FROM (SELECT doc_id,
      |          list_filter(regexp_split_to_array(lower(text), '\W+'), w -> w <> '') AS ws
      |        FROM dup_docs))""".stripMargin

  /** 64-bit-md5 SimHash as a 64-char bit string (see Dedup.simhash64: the
    * SQL bit order is a fixed permutation of the Scala bit order, which
    * preserves pairwise Hamming distance) for a docs CTE named `dup_docs`.
    */
  private val simhashCte =
    """wordsx AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\W+'), w -> w <> '')) AS w
      |  FROM dup_docs),
      |wh AS (SELECT doc_id, substr(md5(w), 17, 16) AS hx FROM wordsx),
      |bitsx AS (
      |  SELECT doc_id, j, k,
      |    SUM(CASE WHEN ((strpos('0123456789abcdef', substr(hx, j, 1)) - 1)
      |              // (CASE k WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)) % 2 = 1
      |             THEN 1 ELSE -1 END) AS v
      |  FROM wh
      |  CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS j)
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
      |  GROUP BY 1, 2, 3),
      |sigx AS (
      |  SELECT doc_id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j, k) AS s
      |  FROM bitsx GROUP BY doc_id)""".stripMargin

  /** 8-bit hyperplane LSH signature (graft.pipeline.Similarity.lshSig) as a
    * bit string, with the plane constants embedded as exact double literals.
    * Input CTE must be named `ex` with columns (vec_id, v DOUBLE[]).
    */
  private val lshSigExpr: String = {
    import graft.pipeline.Similarity
    (0 until Similarity.LshBits).map { b =>
      s"(CASE WHEN list_dot_product(v, ${Similarity.planeSqlList(b, Similarity.EmbDims)}) >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
  }

  /** The k-means-refined IVF coarse quantizer (Similarity.ivfKmeansTopK)
    * replayed exactly in SQL. Centroids derive ONLY from exact integer sums
    * of floor(x·2^20)-quantized components (integer addition commutes, so
    * Spark's partition order and DuckDB's aggregation order cannot diverge);
    * the mean's long→double rounding + division are IEEE-deterministic; ties
    * go to the lower cid in both engines. One CTE block per Lloyd iteration,
    * unrolled [[graft.pipeline.Similarity.KmeansIters]] times; empty
    * clusters keep their previous centroid via the COALESCE join.
    */
  private def ivfKmeansCtesOver(eCte: String): String = {
    import graft.pipeline.Similarity
    val iters = Similarity.KmeansIters
    val head =
      s"""$eCte,
         |c0 AS (
         |  SELECT vec_id AS cid, CAST(q AS DOUBLE[]) AS m
         |  FROM e WHERE vec_id < ${Similarity.IvfLists})""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""a$k AS (
         |  SELECT vec_id, q, cid FROM (
         |    SELECT e.vec_id, e.q, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(c.m, CAST(e.q AS DOUBLE[])) DESC, c.cid) AS rn
         |    FROM e CROSS JOIN c${k - 1} c) WHERE rn = 1),
         |s$k AS (
         |  SELECT cid, i AS dim, SUM(q[i]) AS s, COUNT(*) AS cnt
         |  FROM a$k CROSS JOIN (SELECT unnest(generate_series(1, ${graft.pipeline.Similarity.EmbDims})) AS i) t
         |  GROUP BY cid, i),
         |n$k AS (
         |  SELECT cid, list(CAST(s AS DOUBLE) / cnt ORDER BY dim) AS m
         |  FROM s$k GROUP BY cid),
         |c$k AS (
         |  SELECT p.cid, COALESCE(n.m, p.m) AS m
         |  FROM c${k - 1} p LEFT JOIN n$k n ON n.cid = p.cid)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  private val ivfKmeansCtes: String = {
    val scale = graft.pipeline.Similarity.KmeansScale.toLong
    ivfKmeansCtesOver(
      s"""e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * $scale) AS BIGINT)
         |     for i in generate_series(1, len(embedding))] AS q
         |  FROM embeddings)""".stripMargin)
  }

  /** [[ivfKmeansCtesOver]] instantiated on the dup-injected embedding view
    * (dup_emb, the ann_dup_pairs CTE) — the SemDeDup oracle's clustering.
    * dup_emb's v is already CAST(embedding AS DOUBLE[]) elementwise, so
    * quantization on v is bit-identical to quantization on the REAL list.
    */
  private lazy val semKmeansCtes: String = {
    val scale = graft.pipeline.Similarity.KmeansScale.toLong
    s"""$dupEmbCte,
       |${ivfKmeansCtesOver(
      s"""e AS (
         |  SELECT vec_id, v,
         |    [CAST(floor(v[i] * $scale) AS BIGINT)
         |     for i in generate_series(1, len(v))] AS q
         |  FROM dup_emb)""".stripMargin)}""".stripMargin
  }

  /** BPE training (graft.pipeline.Bpe) replayed exactly in SQL, one CTE
    * block per merge step: pair counts are integer SUMs over the
    * distinct-word table, the best pair is the (cnt DESC, a, b) total order,
    * and merge application is `replace` on the bracketed symbol string —
    * SQL replace's left-to-right non-overlapping substitution IS greedy BPE
    * merging (see Bpe's scaladoc), identically in both engines.
    */
  private val bpeCtes: String = {
    val head =
      s"""wf AS (
         |  SELECT w, COUNT(*) AS freq FROM (
         |    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'),
         |      x -> x <> '')) AS w
         |    FROM documents) GROUP BY w),
         |s0 AS (
         |  SELECT w, freq,
         |    '(' || array_to_string([substr(w, i, 1)
         |      for i in generate_series(1, len(w))], ')(') || ')' AS s
         |  FROM wf)""".stripMargin
    val steps = (1 to Bpe.NumMerges).map { j =>
      s"""pr$j AS (
         |  SELECT freq, t, unnest(generate_series(1, len(t) - 1)) AS i
         |  FROM (SELECT freq, regexp_extract_all(s, '\\(([^)]*)\\)', 1) AS t FROM s${j - 1})
         |  WHERE len(t) >= 2),
         |pc$j AS (SELECT t[i] AS a, t[i+1] AS b, SUM(freq) AS cnt FROM pr$j GROUP BY 1, 2),
         |b$j AS (SELECT a, b FROM pc$j ORDER BY cnt DESC, a, b LIMIT 1),
         |s$j AS (
         |  SELECT w, freq,
         |    replace(s, '(' || b.a || ')(' || b.b || ')', '(' || b.a || b.b || ')') AS s
         |  FROM s${j - 1} CROSS JOIN b$j b)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** The PQ chain in SQL (graft.pipeline.Similarity.trainPqCodebooks +
    * pqTopK): per-subspace integer Lloyd replayed round by round
    * (assignment = exact integer squared-L2, tie to lower cid; update =
    * floored integer means — the +2^22 offset keeps the numerator
    * non-negative because DuckDB's // truncates where the engine's
    * floorDiv floors, the dd_dsir_sample trick), then encode + ADC table
    * lookups. Requires `e(vec_id, q)` (quantized vectors) in scope; ends
    * at `pqsc(qid, vec_id, dist)`. Shared by ann_pq_topk and ann_recall.
    */
  private lazy val pqCtes: String = {
    import graft.pipeline.Similarity.{PqSubspaces, PqSubDims, PqK, PqIters}
    val d2 = "CAST(list_sum(list_transform(list_zip(%s, %s)," +
      " p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
    def dist(a: String, b: String) = d2.format(a, b)
    val steps = (1 to PqIters).map { k =>
      s"""pa$k AS MATERIALIZED (
         |  SELECT vec_id, sub, sq, cid FROM (
         |    SELECT es.vec_id, es.sub, es.sq, b.cid,
         |      ROW_NUMBER() OVER (PARTITION BY es.vec_id, es.sub
         |        ORDER BY ${dist("es.sq", "b.mv")} ASC, b.cid ASC) AS rn
         |    FROM es JOIN pb${k - 1} b ON b.sub = es.sub) WHERE rn = 1),
         |ps$k AS (
         |  SELECT sub, cid, i AS dim, SUM(sq[i]) AS sm, COUNT(*) AS cnt
         |  FROM pa$k CROSS JOIN (SELECT unnest(generate_series(1, $PqSubDims)) AS i) t
         |  GROUP BY 1, 2, 3),
         |pn$k AS (
         |  SELECT sub, cid,
         |    list(CAST(((sm + cnt * 4194304) // cnt) - 4194304 AS BIGINT)
         |         ORDER BY dim) AS mv
         |  FROM ps$k GROUP BY 1, 2),
         |pb$k AS MATERIALIZED (
         |  SELECT p.sub, p.cid, COALESCE(n.mv, p.mv) AS mv
         |  FROM pb${k - 1} p LEFT JOIN pn$k n
         |    ON n.sub = p.sub AND n.cid = p.cid)""".stripMargin
    }.mkString(",\n")
    s"""es AS MATERIALIZED (
       |  SELECT vec_id, s.sub,
       |    array_slice(q, s.sub * $PqSubDims + 1, (s.sub + 1) * $PqSubDims) AS sq
       |  FROM e CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${PqSubspaces - 1})) AS sub) s),
       |pb0 AS (SELECT sub, CAST(vec_id AS INTEGER) AS cid, sq AS mv
       |        FROM es WHERE vec_id < $PqK),
       |$steps,
       |penc AS MATERIALIZED (
       |  SELECT vec_id, sub, cid FROM (
       |    SELECT es.vec_id, es.sub, b.cid,
       |      ROW_NUMBER() OVER (PARTITION BY es.vec_id, es.sub
       |        ORDER BY ${dist("es.sq", "b.mv")} ASC, b.cid ASC) AS rn
       |    FROM es JOIN pb$PqIters b ON b.sub = es.sub) WHERE rn = 1),
       |pq20 AS (SELECT vec_id AS qid, sub, sq FROM es
       |        WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 20)),
       |pdt AS MATERIALIZED (
       |  SELECT q.qid, q.sub, b.cid, ${dist("q.sq", "b.mv")} AS d
       |  FROM pq20 q JOIN pb$PqIters b ON b.sub = q.sub),
       |pqsc AS (
       |  SELECT pdt.qid, penc.vec_id, CAST(SUM(pdt.d) AS BIGINT) AS dist
       |  FROM penc JOIN pdt ON pdt.sub = penc.sub AND pdt.cid = penc.cid
       |  WHERE penc.vec_id <> pdt.qid GROUP BY 1, 2)""".stripMargin
  }

  /** The naive-Bayes classifier chain in SQL (graft.pipeline.NbQuality in
    * SQL), nb_-prefixed so it composes with the lm/dsir chains (which use
    * tok, vals, the lg chain and lgt themselves). Requires gcnt ([[gopherCtes]]) in
    * scope; ends at `nb_sc(doc_id, s, n)` and `nb_bs(b)`.
    */
  private lazy val nbCtes: String = {
    import graft.pipeline.Lm.{LogScaleBits, LogFracBits}
    import graft.pipeline.NbQuality.{TrainMod, VocabSize}
    val two = 1L << (LogScaleBits + 1)
    val steps = (1 to LogFracBits).map { i =>
      s"""nblg$i AS (
         |  SELECT v, CASE WHEN y >= $two THEN y >> 1 ELSE y END AS x,
         |    r * 2 + CASE WHEN y >= $two THEN 1 ELSE 0 END AS r
         |  FROM (SELECT v, r, (x * x) >> $LogScaleBits AS y FROM nblg${i - 1}))""".stripMargin
    }.mkString(",\n")
    s"""nb_lab AS (SELECT doc_id,
       |          CASE WHEN $gopherPassCond THEN 1 ELSE 0 END AS pass
       |        FROM gcnt),
       |nb_tok AS (SELECT doc_id,
       |          unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'),
       |                             x -> x <> '')) AS w
       |        FROM documents),
       |nb_ttok AS (SELECT nb_tok.doc_id, nb_tok.w, nb_lab.pass
       |         FROM nb_tok JOIN nb_lab ON nb_lab.doc_id = nb_tok.doc_id
       |         WHERE nb_tok.doc_id % $TrainMod = 0),
       |nb_vocab AS (SELECT w FROM (
       |            SELECT w, COUNT(DISTINCT doc_id) AS df FROM nb_ttok GROUP BY 1)
       |          ORDER BY df DESC, w LIMIT $VocabSize),
       |nb_vc AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM nb_vocab),
       |nb_tc AS (SELECT vb.w,
       |         CAST(SUM(CASE WHEN t.pass = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |         CAST(SUM(CASE WHEN t.pass = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cf
       |       FROM nb_vocab vb JOIN nb_ttok t ON t.w = vb.w GROUP BY 1),
       |nb_tots AS (SELECT CAST(SUM(cp) + (SELECT v FROM nb_vc) AS BIGINT) AS tp,
       |                CAST(SUM(cf) + (SELECT v FROM nb_vc) AS BIGINT) AS tf
       |         FROM nb_tc),
       |nb_pri AS (SELECT
       |          CAST(SUM(CASE WHEN pass = 1 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS np,
       |          CAST(SUM(CASE WHEN pass = 0 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS nf
       |        FROM nb_lab WHERE doc_id % $TrainMod = 0),
       |nb_vals AS (SELECT DISTINCT cp + 1 AS v FROM nb_tc
       |         UNION SELECT DISTINCT cf + 1 FROM nb_tc
       |         UNION SELECT tp FROM nb_tots UNION SELECT tf FROM nb_tots
       |         UNION SELECT np FROM nb_pri UNION SELECT nf FROM nb_pri),
       |nblg0 AS (
       |  SELECT v,
       |    (v << $LogScaleBits) >> (length(format('{:b}', v)) - 1) AS x,
       |    CAST(length(format('{:b}', v)) - 1 AS BIGINT) AS r
       |  FROM nb_vals),
       |$steps,
       |nb_lgt AS (SELECT v, r AS lg FROM nblg$LogFracBits),
       |nb_wt AS (
       |  SELECT nb_tc.w,
       |    (lp.lg - (SELECT lg FROM nb_lgt WHERE v = (SELECT tp FROM nb_tots)))
       |    - (lf.lg - (SELECT lg FROM nb_lgt WHERE v = (SELECT tf FROM nb_tots))) AS wq
       |  FROM nb_tc JOIN nb_lgt lp ON lp.v = nb_tc.cp + 1
       |          JOIN nb_lgt lf ON lf.v = nb_tc.cf + 1),
       |nb_bs AS (SELECT (SELECT lg FROM nb_lgt WHERE v = (SELECT np FROM nb_pri))
       |            - (SELECT lg FROM nb_lgt WHERE v = (SELECT nf FROM nb_pri)) AS b),
       |nb_sc AS (SELECT nb_tok.doc_id, SUM(nb_wt.wq) AS s, COUNT(*) AS n
       |       FROM nb_tok JOIN nb_wt ON nb_wt.w = nb_tok.w GROUP BY 1)""".stripMargin
  }

  /** The robots-seeded sitemap discovery chain in SQL (RobotsParser
    * .sitemaps → fetch-join → one index level → urlset parse). Ends at
    * `disc(host, sitemap_url, loc, lastmod)`. Shared by
    * crawl_sitemap_discovery and crawl_sitemap_recrawl.
    */
  private lazy val sitemapDiscoveryCtes: String =
    s"""rl AS (
       |  SELECT host,
       |    trim(CASE WHEN strpos(raw, '#') > 0
       |         THEN substr(raw, 1, strpos(raw, '#') - 1) ELSE raw END) AS l
       |  FROM (SELECT host, unnest(str_split(body, chr(10))) AS raw
       |        FROM ${gt("robots_txt")})),
       |rsm AS (
       |  SELECT DISTINCT host, trim(substr(l, strpos(l, ':') + 1)) AS adv_url
       |  FROM rl
       |  WHERE l <> '' AND strpos(l, ':') > 1
       |    AND lower(trim(substr(l, 1, strpos(l, ':') - 1))) = 'sitemap'
       |    AND trim(substr(l, strpos(l, ':') + 1)) <> ''),
       |sm AS (SELECT url, body FROM ${gt("sitemaps")}),
       |f0 AS (SELECT r.host, r.adv_url AS sitemap_url, s.body
       |       FROM rsm r JOIN sm s ON s.url = r.adv_url),
       |kids AS (
       |  SELECT host, trim(regexp_extract(b, '<loc>([^<]*)</loc>', 1)) AS adv_url
       |  FROM (SELECT host,
       |          unnest(regexp_extract_all(body, '<sitemap>.*?</sitemap>')) AS b
       |        FROM f0 WHERE contains(body, '<sitemapindex'))),
       |f1 AS (SELECT k.host, k.adv_url AS sitemap_url, s.body
       |       FROM kids k JOIN sm s ON s.url = k.adv_url),
       |dcs AS (SELECT host, sitemap_url, body FROM f0
       |        WHERE NOT contains(body, '<sitemapindex')
       |        UNION ALL SELECT host, sitemap_url, body FROM f1),
       |bl AS (SELECT host, sitemap_url,
       |         unnest(regexp_extract_all(body, '<url>.*?</url>')) AS b
       |       FROM dcs),
       |disc AS (
       |  SELECT host, sitemap_url,
       |    trim(regexp_extract(b, '<loc>([^<]*)</loc>', 1)) AS loc,
       |    regexp_extract(b, '<lastmod>([^<]*)</lastmod>', 1) AS lastmod
       |  FROM bl)""".stripMargin

  /** The boilerplate-injected view + per-(source, line) doc counts
    * (Dedup.bpDocs / sourceBoilerplate in SQL). Ends at
    * `l2(doc_id, source, line_no, line)`, `pl(source, line, n_docs)` and
    * `tt(source, n_total)`.
    */
  private lazy val bpCtes: String =
    s"""bpv AS (
       |  SELECT doc_id, source,
       |    concat_ws(chr(10), text,
       |      '(c) ' || source || ' syndication network',
       |      CASE WHEN (doc_id * 2654435761) % 100 < 50 THEN 'All rights reserved by ' || source END,
       |      CASE WHEN doc_id % 3 = 0 THEN 'Subscribe to ' || source || ' updates today' END)
       |      AS text
       |  FROM documents),
       |l2 AS (
       |  SELECT doc_id, source, CAST(p[2] AS BIGINT) - 1 AS line_no, p[1] AS line
       |  FROM (SELECT doc_id, source,
       |          unnest(list_zip(ls, generate_series(1, len(ls)))) AS p
       |        FROM (SELECT doc_id, source, string_split(text, chr(10)) AS ls
       |              FROM bpv))),
       |pl AS (SELECT source, line, COUNT(DISTINCT doc_id) AS n_docs
       |       FROM l2 GROUP BY 1, 2),
       |tt AS (SELECT source, COUNT(*) AS n_total FROM bpv GROUP BY 1)""".stripMargin

  /** Gopher quality counters (graft.pipeline.TextAnalysis.qualityGopher in
    * SQL) as composable CTEs `gbase`/`gcnt`, plus the pass condition —
    * shared by dd_quality_gopher and dd_train_manifest so the gates cannot
    * drift between them. All counters integer; thresholds integer
    * cross-multiplications.
    */
  private lazy val gopherCtes: String = {
    // stop-word OCCURRENCES (TextAnalysis.GopherStops doc): count matching
    // tokens, not distinct types
    val stopList = graft.pipeline.TextAnalysis.GopherStops
      .map(s => s"'$s'").mkString(", ")
    val stopSum = s"len(list_filter(wl, w -> w IN ($stopList)))"
    s"""gbase AS (
       |  SELECT doc_id, text,
       |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ws,
       |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(lower(text), '\\W+') END AS wl,
       |    string_split(text, chr(10)) AS ls
       |  FROM documents),
       |gcnt AS (
       |  SELECT doc_id,
       |    CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(strlen(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS word_bytes,
       |    CAST(strlen(text) - strlen(replace(text, '#', '')) AS BIGINT)
       |      + CAST((strlen(text) - strlen(replace(text, '...', ''))) // 3 AS BIGINT)
       |      AS n_symbols,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(ls, l -> starts_with(l, '•')
       |      OR starts_with(l, '- ') OR starts_with(l, '* '))) AS BIGINT) AS n_bullet_lines,
       |    CAST(len(list_filter(ls, l -> ends_with(l, '...')
       |      OR ends_with(l, '…'))) AS BIGINT) AS n_ellipsis_lines,
       |    CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS n_dup_lines,
       |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT)
       |      AS n_alpha_words,
       |    CAST($stopSum AS BIGINT) AS n_stop_hits
       |  FROM gbase)""".stripMargin
  }

  /** The unrolled Turner log2 iteration (Lm.log2fix, Turner 2010) as SQL
    * CTEs: consumes a prior CTE `vals(v)` of positive BIGINTs and ends at
    * `lgt(v, lg)` — the Q16 log2 of every distinct input value, bit-
    * identical to the engine's 16-step shift-and-square iteration. Shared
    * by every oracle that replays a transcendental (LM score, DSIR,
    * unigram entropy).
    */
  private lazy val log2Ctes: String = {
    import graft.pipeline.Lm.{LogScaleBits, LogFracBits}
    val two = 1L << (LogScaleBits + 1) // mantissa ≥ 2.0 in Q24
    val steps = (1 to LogFracBits).map { i =>
      s"""lg$i AS (
         |  SELECT v, CASE WHEN y >= $two THEN y >> 1 ELSE y END AS x,
         |    r * 2 + CASE WHEN y >= $two THEN 1 ELSE 0 END AS r
         |  FROM (SELECT v, r, (x * x) >> $LogScaleBits AS y FROM lg${i - 1}))""".stripMargin
    }.mkString(",\n")
    s"""lg0 AS (
       |  SELECT v,
       |    (v << $LogScaleBits) >> (length(format('{:b}', v)) - 1) AS x,
       |    CAST(length(format('{:b}', v)) - 1 AS BIGINT) AS r
       |  FROM vals),
       |$steps,
       |lgt AS (SELECT v, r AS lg FROM lg$LogFracBits)""".stripMargin
  }

  /** Unigram-entropy CTE chain (TextAnalysis.unigramEntropy in SQL): per-
    * doc tf histogram, Q16 entropy = (dl·lg(dl) − Σ tf·lg(tf)) // dl with
    * the logs from [[log2Ctes]]. Ends at `esc(doc_id, dl, n_types, e)` for
    * every doc with ≥ 1 token.
    */
  private lazy val entropyCtes: String =
    s"""ed AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS wl
       |  FROM documents),
       |etf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
       |        FROM (SELECT doc_id, unnest(wl) AS w FROM ed) GROUP BY 1, 2),
       |eper AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl,
       |           CAST(COUNT(*) AS BIGINT) AS n_types
       |         FROM etf GROUP BY 1),
       |vals AS (SELECT DISTINCT tf AS v FROM etf
       |         UNION SELECT DISTINCT dl FROM eper),
       |$log2Ctes,
       |est AS (SELECT etf.doc_id, SUM(etf.tf * lgt.lg) AS s
       |        FROM etf JOIN lgt ON lgt.v = etf.tf GROUP BY 1),
       |esc AS (
       |  SELECT eper.doc_id, eper.dl, eper.n_types,
       |    CAST((eper.dl * l2.lg - est.s) // eper.dl AS BIGINT) AS e
       |  FROM eper JOIN lgt l2 ON l2.v = eper.dl
       |  JOIN est ON est.doc_id = eper.doc_id)""".stripMargin

  /** Full standalone oracle SELECT for the integer-weighted ranker
    * (Search.searchTopK) — shared verbatim by its own driver row and, as a
    * derived-table subquery, by the search_ranker_eval audit.
    */
  private lazy val searchTopkSql: String = {
    val vals = Search.Queries.map { case (id, q) => s"($id, '$q')" }.mkString(", ")
    s"""WITH q(query_id, query) AS (VALUES $vals),
       |qt AS (SELECT CAST(query_id AS BIGINT) AS query_id,
       |         unnest(string_split(query, ' ')) AS w FROM q),
       |tok AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')) AS w
       |  FROM documents),
       |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
       |qw AS (SELECT qt.query_id, qt.w,
       |         CAST(${Search.WeightScale} // dfq.df AS BIGINT) AS weight
       |       FROM qt JOIN dfq ON dfq.w = qt.w),
       |sc AS (SELECT qw.query_id, tf.doc_id,
       |         CAST(SUM(tf.tf * qw.weight) AS BIGINT) AS score
       |       FROM tf JOIN qw ON qw.w = tf.w GROUP BY 1, 2)
       |SELECT query_id, rank, doc_id, score FROM (
       |  SELECT query_id, doc_id, score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc)
       |WHERE rank <= ${Search.TopK}""".stripMargin
  }

  /** Full standalone oracle SELECT for Okapi BM25 (Search.bm25TopK) —
    * shared by its driver row and the search_ranker_eval audit. Keeps its
    * own inline Turner-log2 unroll because its vals feed idf specifically
    * (2df+1, 2n+2) rather than the generic [[log2Ctes]] contract.
    */
  private lazy val bm25Sql: String = {
    import graft.pipeline.Lm.{LogScaleBits, LogFracBits}
    import Search.{Q16, Q16K1, Q16B}
    val two = 1L << (LogScaleBits + 1)
    val steps = (1 to LogFracBits).map { i =>
      s"""lg$i AS (
         |  SELECT v, CASE WHEN y >= $two THEN y >> 1 ELSE y END AS x,
         |    r * 2 + CASE WHEN y >= $two THEN 1 ELSE 0 END AS r
         |  FROM (SELECT v, r, (x * x) >> $LogScaleBits AS y FROM lg${i - 1}))""".stripMargin
    }.mkString(",\n")
    val qvals = Search.Queries.map { case (id, q) => s"($id, '$q')" }.mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS wl
       |  FROM documents),
       |dln AS (SELECT doc_id, CAST(len(wl) AS BIGINT) AS dl FROM d),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dln),
       |q(query_id, query) AS (VALUES $qvals),
       |qt AS (SELECT CAST(query_id AS BIGINT) AS query_id,
       |         unnest(string_split(query, ' ')) AS w FROM q),
       |tok AS (SELECT doc_id, unnest(wl) AS w FROM d),
       |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       |       WHERE w IN (SELECT DISTINCT w FROM qt) GROUP BY 1, 2),
       |dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |vals AS (SELECT DISTINCT 2 * df + 1 AS v FROM dfq
       |         UNION SELECT DISTINCT 2 * n + 2 FROM st),
       |lg0 AS (
       |  SELECT v,
       |    (v << $LogScaleBits) >> (length(format('{:b}', v)) - 1) AS x,
       |    CAST(length(format('{:b}', v)) - 1 AS BIGINT) AS r
       |  FROM vals),
       |$steps,
       |lgt AS (SELECT v, r AS lg FROM lg$LogFracBits),
       |idf AS (SELECT dfq.w,
       |    (SELECT lg FROM lgt WHERE v = (SELECT 2 * n + 2 FROM st)) - lgt.lg AS idf_q16
       |  FROM dfq JOIN lgt ON lgt.v = 2 * dfq.df + 1),
       |sc AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(SUM((idf.idf_q16 * ((tf.tf * ${Q16K1 + Q16} * $Q16) //
       |      (tf.tf * $Q16 + $Q16K1 * (($Q16 - $Q16B)
       |        + ($Q16B * dln.dl * st.n) // st.t)))) // $Q16) AS BIGINT) AS score_q16
       |  FROM tf JOIN qt ON qt.w = tf.w JOIN idf ON idf.w = tf.w
       |  JOIN dln ON dln.doc_id = tf.doc_id CROSS JOIN st
       |  GROUP BY 1, 2)
       |SELECT query_id, rank, doc_id, score_q16 FROM (
       |  SELECT query_id, doc_id, score_q16,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_q16 DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc)
       |WHERE rank <= ${Search.TopK}""".stripMargin
  }

  /** Full standalone oracle SELECT for Dirichlet query likelihood
    * (Search.qlDirichletTopK) — shared by its driver row and the
    * search_ranker_eval audit.
    */
  private lazy val qlDirichletSql: String = {
    val qvals = Search.Queries.map { case (id, q) => s"($id, '$q')" }.mkString(", ")
    val mu = Search.QlMu
    s"""WITH q(query_id, query) AS (VALUES $qvals),
       |qt AS (SELECT CAST(query_id AS BIGINT) AS query_id,
       |         unnest(string_split(query, ' ')) AS w FROM q),
       |tok AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')) AS w
       |  FROM documents),
       |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
       |dld AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM tok),
       |cf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cf FROM tok GROUP BY 1),
       |qp AS (SELECT qt.query_id, qt.w, cf.cf, $mu * cf.cf AS mucf
       |       FROM qt JOIN cf ON cf.w = qt.w),
       |cand AS (SELECT qp.query_id, tf.doc_id, dld.dl, qp.mucf,
       |           tf.tf * (SELECT t FROM tot) + qp.mucf AS num
       |         FROM tf JOIN qp ON qp.w = tf.w
       |         JOIN dld ON dld.doc_id = tf.doc_id),
       |vals AS (SELECT DISTINCT num AS v FROM cand
       |         UNION SELECT DISTINCT mucf FROM qp
       |         UNION SELECT DISTINCT dl + $mu FROM cand
       |         UNION SELECT t FROM tot),
       |$log2Ctes,
       |pres AS (SELECT c.query_id, c.doc_id, MIN(c.dl) AS dl,
       |           SUM(ln.lg - lm.lg) AS sp
       |         FROM cand c JOIN lgt ln ON ln.v = c.num
       |         JOIN lgt lm ON lm.v = c.mucf
       |         GROUP BY 1, 2),
       |qc AS (SELECT qp.query_id, SUM(lm.lg) AS cq, COUNT(*) AS nq
       |       FROM qp JOIN lgt lm ON lm.v = qp.mucf GROUP BY 1),
       |sc AS (SELECT p.query_id, p.doc_id,
       |         CAST(p.sp + qc.cq
       |           - qc.nq * (SELECT lg FROM lgt WHERE v = (SELECT t FROM tot))
       |           - qc.nq * ld.lg AS BIGINT) AS score_q16
       |       FROM pres p JOIN qc ON qc.query_id = p.query_id
       |       JOIN lgt ld ON ld.v = p.dl + $mu)
       |SELECT query_id, rank, doc_id, score_q16 FROM (
       |  SELECT query_id, doc_id, score_q16,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_q16 DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc)
       |WHERE rank <= ${Search.TopK}""".stripMargin
  }

  /** Manifest + temperature-flattened mix-budget CTE chain (Dedup
    * .mixBudget in SQL): the gated manifest `mani(doc_id, lang, n_tokens,
    * bucket)` and the largest-remainder apportionment ending at
    * `mixr`/`mixl` — shared by dd_mix_budget and dd_corpus_assembly so the
    * allocation arithmetic cannot drift between them.
    */
  private def mixBudgetCtes(budget: Long): String =
    dupClusterCtes + ",\n" +
      s"""$gopherCtes,
         |$lmScoreCtes,
         |$lmBucketCtes,
         |mani AS (
         |  SELECT c.doc_id, d.lang,
         |    CASE WHEN trim(d.text) = '' THEN CAST(0 AS BIGINT)
         |         ELSE CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT)
         |    END AS n_tokens,
         |    COALESCE(
         |      CASE WHEN r.lang_rank * 3 <= r.n_lang THEN 'head'
         |           WHEN r.lang_rank * 3 <= r.n_lang * 2 THEN 'middle'
         |           WHEN r.lang_rank IS NOT NULL THEN 'tail' END,
         |      'tail') AS bucket
         |  FROM gcnt c JOIN documents d ON d.doc_id = c.doc_id
         |  LEFT JOIN rk r ON r.doc_id = c.doc_id
         |  WHERE ($gopherPassCond)
         |    AND c.doc_id NOT IN (
         |      SELECT doc_id FROM l${Dedup.ClusterIters} WHERE doc_id <> lbl)),
         |mixw AS (
         |  SELECT lang, bucket, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(FLOOR(SQRT(CAST(SUM(n_tokens) AS BIGINT))) AS BIGINT) AS weight
         |  FROM mani GROUP BY 1, 2),
         |mixt AS (SELECT SUM(weight) AS w_total FROM mixw),
         |mixq AS (SELECT lang, bucket, total_tokens, weight,
         |           ($budget * weight) // w_total AS base,
         |           ($budget * weight) % w_total AS rem
         |         FROM mixw CROSS JOIN mixt),
         |mixl AS (SELECT $budget - SUM(base) AS leftover FROM mixq),
         |mixr AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang, bucket) AS rk
         |         FROM mixq)""".stripMargin

  /** The stupid-backoff bigram LM score CTE chain (graft.pipeline.Lm
    * .lmScore in SQL): exact integer counts, log2 in Q16 fixed point via
    * the SAME 16-step shift-and-square integer iteration Lm.log2fix runs
    * (Turner 2010) — a transcendental made bit-replayable. Ends at
    * `agg(doc_id, s, n)` = (summed Q16 score, transition count) for every
    * doc with ≥ 1 bigram. Shared by dd_lm_score, dd_lm_buckets and the
    * bucket column of dd_train_manifest.
    */
  private lazy val lmScoreCtes: String = {
    s"""d AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS wl
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(wl) AS w FROM d),
       |uni AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS t FROM uni),
       |pr AS (SELECT doc_id, unnest(list_zip(wl, wl[2:])) AS p FROM d),
       |big AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM pr
       |        WHERE p[2] IS NOT NULL),
       |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
       |sp AS (
       |  SELECT b.doc_id,
       |    CAST(CASE WHEN c.c2 IS NOT NULL THEN c.c2 ELSE u2.cw * 2 END AS BIGINT) AS num,
       |    CAST(CASE WHEN c.c2 IS NOT NULL THEN u1.cw ELSE (SELECT t FROM tot) * 5 END AS BIGINT) AS den
       |  FROM big b
       |  LEFT JOIN c2 c ON c.w1 = b.w1 AND c.w2 = b.w2
       |  JOIN uni u1 ON u1.w = b.w1
       |  JOIN uni u2 ON u2.w = b.w2),
       |vals AS (SELECT DISTINCT num AS v FROM sp UNION SELECT DISTINCT den FROM sp),
       |$log2Ctes,
       |agg AS (
       |  SELECT sp.doc_id, SUM(ln.lg - ld.lg) AS s, COUNT(*) AS n
       |  FROM sp JOIN lgt ln ON ln.v = sp.num JOIN lgt ld ON ld.v = sp.den
       |  GROUP BY 1)""".stripMargin
  }

  /** The DSIR score CTE chain (graft.pipeline.Dsir.dsirWeights in SQL):
    * sha256-prefix hashed-unigram buckets, add-1 smoothed en-target vs raw
    * histograms, Q16 log-ratio weights via the unrolled Turner log2
    * iteration. Ends at `sc(doc_id, s, n)` = (summed Q16 importance,
    * feature count) for every doc with ≥ 1 token. Shared by
    * dd_dsir_weights and dd_dsir_sample.
    */
  private lazy val dsirScoreCtes: String = {
    val nb = graft.pipeline.Dsir.NumBuckets
    s"""d AS (
       |  SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS wl
       |  FROM documents),
       |tok AS (SELECT doc_id, lang, unnest(wl) AS w FROM d),
       |hx AS (SELECT i, format('{:02x}', i) AS h FROM range($nb) t(i)),
       |tb AS (SELECT tok.doc_id, tok.lang, hx.i AS b
       |       FROM tok JOIN hx ON substr(sha256(tok.w), 1, 2) = hx.h),
       |rawc AS (SELECT b, COUNT(*) AS rc FROM tb GROUP BY 1),
       |tgtc AS (SELECT b, COUNT(*) AS tc FROM tb WHERE lang = 'en' GROUP BY 1),
       |bk AS (
       |  SELECT hx.i AS b, CAST(COALESCE(rc, 0) + 1 AS BIGINT) AS rc1,
       |    CAST(COALESCE(tc, 0) + 1 AS BIGINT) AS tc1
       |  FROM hx LEFT JOIN rawc ON rawc.b = hx.i LEFT JOIN tgtc ON tgtc.b = hx.i),
       |tots AS (SELECT CAST((SELECT SUM(rc) FROM rawc) + $nb AS BIGINT) AS rt,
       |                CAST((SELECT SUM(tc) FROM tgtc) + $nb AS BIGINT) AS tt),
       |vals AS (SELECT DISTINCT rc1 AS v FROM bk UNION SELECT DISTINCT tc1 FROM bk
       |         UNION SELECT rt FROM tots UNION SELECT tt FROM tots),
       |$log2Ctes,
       |wt AS (
       |  SELECT bk.b,
       |    (lt.lg - (SELECT lg FROM lgt WHERE v = (SELECT tt FROM tots)))
       |    - (lr.lg - (SELECT lg FROM lgt WHERE v = (SELECT rt FROM tots))) AS wq
       |  FROM bk JOIN lgt lt ON lt.v = bk.tc1 JOIN lgt lr ON lr.v = bk.rc1),
       |sc AS (SELECT tb.doc_id, SUM(wt.wq) AS s, COUNT(*) AS n
       |       FROM tb JOIN wt ON wt.b = tb.b GROUP BY 1)""".stripMargin
  }

  /** CCNet tercile bucketing over [[lmScoreCtes]]'s `agg` (Lm.lmBuckets in
    * SQL): per-token score by exact floor division, per-(lang, score)
    * histogram with an exclusive running sum for the rank offset, tie rank
    * by doc_id within the (lang, score) group. Ends at
    * `rk(doc_id, lang, tok, lang_rank, n_lang)`.
    */
  private lazy val lmBucketCtes: String =
    """lmsc AS (
      |  SELECT a.doc_id, d2.lang, a.s // a.n AS tok
      |  FROM agg a JOIN documents d2 ON d2.doc_id = a.doc_id),
      |lmhist AS (SELECT lang, tok, COUNT(*) AS c FROM lmsc GROUP BY 1, 2),
      |lmcum AS (
      |  SELECT lang, tok,
      |    COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY tok DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
      |    SUM(c) OVER (PARTITION BY lang) AS n_lang
      |  FROM lmhist),
      |rk AS (
      |  SELECT s.doc_id, s.lang, s.tok,
      |    m.cum_before + ROW_NUMBER() OVER (PARTITION BY s.lang, s.tok
      |      ORDER BY s.doc_id) AS lang_rank,
      |    m.n_lang
      |  FROM lmsc s JOIN lmcum m ON m.lang = s.lang AND m.tok = s.tok)""".stripMargin

  private val gopherPassCond: String =
    """n_words BETWEEN 50 AND 100000
      |    AND word_bytes >= n_words * 3 AND word_bytes <= n_words * 10
      |    AND n_symbols * 10 <= n_words
      |    AND n_bullet_lines * 10 <= n_lines * 9
      |    AND n_ellipsis_lines * 10 <= n_lines * 3
      |    AND n_alpha_words * 10 >= n_words * 8
      |    AND n_stop_hits >= 2
      |    AND n_dup_lines * 10 <= n_lines * 3""".stripMargin

  /** The dup-cluster CTE chain (graft.pipeline.Dedup.dupClusters in SQL):
    * minhash + simhash pair edges over the dup-injected docs, then
    * [[Dedup.ClusterIters]] unrolled rounds of hash-min label propagation
    * (`pp<k>`) each followed by the pointer-doubling shortcut lbl := lbl(lbl)
    * (`l<k>`) — `l<k>` holds (doc_id, lbl) after round k. Shared by the
    * dd_dup_clusters, dd_dup_keep and dd_cluster_residual oracles.
    */
  /** Shared fixed-point-PageRank CTE chain (defines x, e, hosts, outw, nh,
    * p0..p{iters}); consumed by graph_host_pagerank and the priority-
    * frontier scheduler. dm_k = iteration k's dangling-host mass,
    * redistributed uniformly (dm // N per host) inside the damping update —
    * total mass conserved within integer-floor slack (mirrors HostGraph).
    */
  private lazy val pagerankCteBody: String = {
    val iters = graft.pipeline.HostGraph.PageRankIters
    val scale = graft.pipeline.HostGraph.PrScale
    val head =
      s"""x AS (SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS s,
         |  regexp_extract(dst_url, '^https?://([^/]+)', 1) AS d FROM ${gt("xlinks")}),
         |e AS (SELECT s, d, COUNT(*) AS w FROM x GROUP BY 1, 2),
         |hosts AS (SELECT DISTINCT h FROM (SELECT s AS h FROM e UNION SELECT d FROM e)),
         |outw AS (SELECT s, SUM(w) AS ow FROM e GROUP BY s),
         |nh AS (SELECT COUNT(*) AS n FROM hosts),
         |p0 AS (SELECT h, CAST($scale AS BIGINT) AS pr FROM hosts)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""c$k AS (
         |  SELECT e.d, SUM((p.pr * e.w) // o.ow) AS m
         |  FROM e JOIN p${k - 1} p ON p.h = e.s JOIN outw o ON o.s = e.s GROUP BY e.d),
         |dm$k AS (
         |  SELECT COALESCE(SUM(pr), 0) AS dm FROM p${k - 1}
         |  WHERE h NOT IN (SELECT s FROM outw)),
         |p$k AS (
         |  SELECT h.h, CAST(${15L * scale / 100}
         |      + (85 * (COALESCE(c.m, 0) + dm.dm // nh.n)) // 100 AS BIGINT) AS pr
         |  FROM hosts h LEFT JOIN c$k c ON c.d = h.h CROSS JOIN dm$k dm CROSS JOIN nh)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  private lazy val dupClusterCtes: String = {
    val iters = Dedup.ClusterIters
    val head =
      s"""WITH $dupDocsCte,
         |$shinglesCte,
         |$simhashCte,
         |mp AS (
         |  SELECT a.doc_id AS pa, b.doc_id AS pb,
         |    len(list_intersect(a.sh, b.sh)) AS it, len(a.sh) AS la, len(b.sh) AS lb
         |  FROM shx a JOIN shx b ON a.doc_id < b.doc_id),
         |mhp AS (SELECT pa, pb FROM mp
         |  WHERE la + lb - it > 0 AND CAST(it AS DOUBLE) / (la + lb - it) >= 0.8),
         |shp AS (
         |  SELECT a.doc_id AS pa, b.doc_id AS pb
         |  FROM sigx a JOIN sigx b ON a.doc_id < b.doc_id
         |  WHERE hamming(a.s, b.s) <= 3),
         |pe AS MATERIALIZED (SELECT pa, pb FROM mhp UNION SELECT pa, pb FROM shp),
         |ed AS MATERIALIZED (
         |  SELECT pa AS u, pb AS v FROM pe UNION SELECT pb AS u, pa AS v FROM pe),
         |l0 AS (SELECT DISTINCT u AS doc_id, u AS lbl FROM ed)""".stripMargin
    // Each round references the previous label map three times (nm, pp, and
    // the pp self-join); MATERIALIZED stops DuckDB's CTE inlining from
    // growing the plan 3^k-fold — the SQL analogue of the engine side's
    // per-round localCheckpoint.
    val steps = (1 to iters).map { k =>
      s"""nm$k AS (
         |  SELECT ed.u, MIN(l.lbl) AS nl
         |  FROM ed JOIN l${k - 1} l ON l.doc_id = ed.v GROUP BY ed.u),
         |pp$k AS MATERIALIZED (
         |  SELECT l.doc_id, LEAST(l.lbl, COALESCE(n.nl, l.lbl)) AS lbl
         |  FROM l${k - 1} l LEFT JOIN nm$k n ON n.u = l.doc_id),
         |l$k AS MATERIALIZED (
         |  SELECT p.doc_id, COALESCE(q.lbl, p.lbl) AS lbl
         |  FROM pp$k p LEFT JOIN pp$k q ON q.doc_id = p.lbl)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** The duplicate-injected embeddings view
    * (graft.pipeline.Similarity.embWithDups) in SQL, as DOUBLE[] vectors.
    */
  private val dupEmbCte =
    """dup_emb AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id,
      |    [CAST(CAST(CAST(embedding[i] AS DOUBLE)
      |                + 0.001 * (((vec_id * 131 + (i-1)) % 1000) / 1000.0) AS REAL) AS DOUBLE)
      |     for i in generate_series(1, len(embedding))] AS v
      |  FROM embeddings WHERE vec_id % 4 = 0)""".stripMargin

  /** Per-host pop cap for crawl_politeness_cap. */
  val PolitenessCap = 300

  /** The sf dir the oracle SQL will be replayed against — set by
    * [[graft.Verify]] before it dumps oracle_sql.json, so unroll depths
    * that depend on corpus size (the politeness-cap rounds) are derived
    * from the sf actually being verified instead of a hard constant.
    */
  @volatile var oracleSfDir: String = "/root/testdata/sf0.01"

  /** Unroll depth for the politeness-cap oracle, derived from the sf
    * label at query-build time: a capped single-host crawl needs at most
    * ceil(host0_pages / cap) pop rounds plus the BFS tree depth (host0 is
    * a binary i→2i+1,2i+2 tree, so depth ≤ log2(pages)+1; cross edges only
    * shorten paths), +4 slack. host0's page count upper-bounds its
    * reachable set. sf0.01 → 22 rounds (engine drains in 14); sf0.1 → ~58.
    * Extra rounds are empty on BOTH sides, so overshoot is free.
    */
  def capRounds: Int = {
    val host0 = graft.corpus.CorpusGen.specFor(oracleSfDir).hostSizes(0)
    math.ceil(host0.toDouble / PolitenessCap).toInt +
      (64 - java.lang.Long.numberOfLeadingZeros(host0.toLong max 1L)).toInt + 4
  }

  /** The politeness-capped crawl schedule replayed in SQL: [[capRounds]]
    * unrolled rounds of (FIFO rank ≤ cap → pop; links of popped pages,
    * first-wins by (parent_seq, pos), anti-joined against everything ever
    * enqueued → fresh rows seq'd after the running max). Single-host crawl
    * ⇒ the global seq rank IS the per-host rank. MATERIALIZED is
    * load-bearing: DuckDB inlines CTEs, so an un-materialized iterative
    * chain is exponential in rounds.
    */
  private def politenessCapCtes: String = {
    val cap = PolitenessCap
    val rounds = capRounds
    val head =
      s"""p0 AS MATERIALIZED (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth,
         |    CAST(0 AS BIGINT) AS seq),
         |s0 AS MATERIALIZED (SELECT url, seq FROM p0)""".stripMargin
    val steps = (1 to rounds).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT url, depth, seq, ROW_NUMBER() OVER (ORDER BY seq) AS rk FROM p${k - 1}),
         |k$k AS MATERIALIZED (SELECT url, depth, seq FROM r$k WHERE rk <= $cap),
         |d$k AS MATERIALIZED (SELECT url, depth, seq FROM r$k WHERE rk > $cap),
         |l$k AS MATERIALIZED (
         |  SELECT l.dst_url AS url, p.seq AS pseq, l.pos, p.depth AS pd
         |  FROM ${gt("links")} l JOIN k$k p ON l.src_url = p.url),
         |w$k AS MATERIALIZED (
         |  SELECT url, MIN(pseq * 1000000 + pos) AS ok FROM l$k
         |  WHERE url NOT IN (SELECT url FROM s${k - 1}) GROUP BY url),
         |n$k AS MATERIALIZED (
         |  SELECT w.url, l.pd + 1 AS depth,
         |    (SELECT MAX(seq) FROM s${k - 1})
         |      + ROW_NUMBER() OVER (ORDER BY w.ok) AS seq
         |  FROM w$k w JOIN l$k l ON l.url = w.url AND l.pseq * 1000000 + l.pos = w.ok),
         |p$k AS MATERIALIZED (
         |  SELECT url, depth, seq FROM d$k UNION ALL SELECT url, depth, seq FROM n$k),
         |s$k AS MATERIALIZED (
         |  SELECT url, seq FROM s${k - 1} UNION ALL SELECT url, seq FROM n$k),
         |o$k AS MATERIALIZED (SELECT url, depth, $k AS wave FROM k$k)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** crawl_priority_bfs parameters, derived from the verified sf: the
    * global pop P scales with corpus size (~12 full-P rounds at any sf)
    * and the per-host cap is 3P/10 (engages whenever ≥ 4 hosts carry deep
    * frontiers, and alone bounds drain to ≤ 40 rounds since cap =
    * ~total/40).
    */
  def priorityPopFor(sfDir: String): Int = {
    val total = graft.corpus.CorpusGen.specFor(sfDir).actualTotal
    math.max(500L, (total + 11) / 12).toInt
  }
  def priorityHostCapFor(sfDir: String): Int = priorityPopFor(sfDir) * 3 / 10

  /** Unroll depth for the crawl_priority_bfs oracle. Worst case the hosts
    * drain SEQUENTIALLY at cap pops/round: Σ_h ceil(size_h/cap) ≤
    * ceil(total/cap) + nHosts rounds, plus the discovery-lag margin (the
    * graph's eccentricity ≤ log2(max host size) within a binary-tree host
    * + one hop per host boundary) and slack. Every round past the real
    * drain is empty on BOTH sides, so overshoot is free.
    */
  def priorityBfsRounds: Int = {
    val spec = graft.corpus.CorpusGen.specFor(oracleSfDir)
    val cap = priorityHostCapFor(oracleSfDir)
    ((spec.actualTotal + cap - 1) / cap).toInt +
      (64 - java.lang.Long.numberOfLeadingZeros(spec.hostSizes.max.toLong max 1L)).toInt +
      spec.hostSizes.length + 4
  }

  /** The best-first (priority + politeness) schedule replayed in SQL:
    * [[priorityBfsRounds]] unrolled rounds of (per-host rank by url ≤ cap
    * → global rank by (pr desc, url) ≤ P → pop; links of popped pages,
    * first-wins by (parent_seq, pos), anti-joined against everything ever
    * enqueued, depth = first discoverer's + 1). Consumes the PageRank CTE
    * chain ([[pagerankCteBody]]'s p{iters}). MATERIALIZED is load-bearing
    * (DuckDB inlines CTEs).
    */
  private def priorityBfsCtes: String = {
    val pP = priorityPopFor(oracleSfDir)
    val cap = priorityHostCapFor(oracleSfDir)
    val rounds = priorityBfsRounds
    val prIters = graft.pipeline.HostGraph.PageRankIters
    val hostRe = "'^https?://([^/]+)'"
    val head =
      s"""prh AS MATERIALIZED (SELECT h AS host, pr FROM p$prIters),
         |pf0 AS MATERIALIZED (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url,
         |    CAST('host0.test' AS VARCHAR) AS host, 0 AS depth,
         |    CAST(0 AS BIGINT) AS seq),
         |ps0 AS MATERIALIZED (SELECT url, seq FROM pf0)""".stripMargin
    val steps = (1 to rounds).map { k =>
      s"""pr$k AS MATERIALIZED (
         |  SELECT f.url, f.host, f.depth, f.seq, COALESCE(p.pr, 0) AS pr,
         |    ROW_NUMBER() OVER (PARTITION BY f.host ORDER BY f.url) AS hrk
         |  FROM pf${k - 1} f LEFT JOIN prh p ON p.host = f.host),
         |pg$k AS MATERIALIZED (
         |  SELECT url, host, depth, seq, pr,
         |    ROW_NUMBER() OVER (ORDER BY pr DESC, url) AS grk
         |  FROM pr$k WHERE hrk <= $cap),
         |pk$k AS MATERIALIZED (SELECT url, host, depth, seq FROM pg$k WHERE grk <= $pP),
         |pd$k AS MATERIALIZED (
         |  SELECT url, host, depth, seq FROM pr$k WHERE hrk > $cap
         |  UNION ALL SELECT url, host, depth, seq FROM pg$k WHERE grk > $pP),
         |pl$k AS MATERIALIZED (
         |  SELECT l.dst_url AS url, p.seq AS pseq, l.pos, p.depth AS pd
         |  FROM ${gt("xlinks")} l JOIN pk$k p ON l.src_url = p.url),
         |pw$k AS MATERIALIZED (
         |  SELECT url, MIN(pseq * 1000000 + pos) AS ok FROM pl$k
         |  WHERE url NOT IN (SELECT url FROM ps${k - 1}) GROUP BY url),
         |pn$k AS MATERIALIZED (
         |  SELECT w.url, regexp_extract(w.url, $hostRe, 1) AS host,
         |    l.pd + 1 AS depth,
         |    (SELECT MAX(seq) FROM ps${k - 1})
         |      + ROW_NUMBER() OVER (ORDER BY w.ok) AS seq
         |  FROM pw$k w JOIN pl$k l ON l.url = w.url AND l.pseq * 1000000 + l.pos = w.ok),
         |pf$k AS MATERIALIZED (
         |  SELECT url, host, depth, seq FROM pd$k
         |  UNION ALL SELECT url, host, depth, seq FROM pn$k),
         |ps$k AS MATERIALIZED (
         |  SELECT url, seq FROM ps${k - 1} UNION ALL SELECT url, seq FROM pn$k),
         |po$k AS MATERIALIZED (SELECT url, depth, $k AS wave FROM pk$k)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** crawl_politeness_delay parameters: the cap budget (pops·seconds per
    * wave) scales with corpus size; a parsed crawl-delay d gives its host
    * cap = budget div d, delay-less hosts get budget div 3. The corpus's
    * largest delay is 4 s, so the smallest cap is ~total/40 and the
    * sequential-drain round bound stays ~40 + margins at any sf.
    */
  def delayBudgetFor(sfDir: String): Int =
    math.max(600L, graft.corpus.CorpusGen.specFor(sfDir).actualTotal / 10).toInt
  def delayDefaultCapFor(sfDir: String): Int = delayBudgetFor(sfDir) / 3

  /** Unroll depth for the crawl_politeness_delay oracle — the
    * [[priorityBfsRounds]] argument with min cap = budget div 4. */
  def delayRounds: Int = {
    val spec = graft.corpus.CorpusGen.specFor(oracleSfDir)
    val minCap = math.max(1, delayBudgetFor(oracleSfDir) / 4)
    ((spec.actualTotal + minCap - 1) / minCap).toInt +
      (64 - java.lang.Long.numberOfLeadingZeros(spec.hostSizes.max.toLong max 1L)).toInt +
      spec.hostSizes.length + 4
  }

  /** The crawl-delay-capped multi-host FIFO schedule replayed in SQL:
    * per-host caps from the robots parse's winning-group crawl-delay
    * ([[robotsParseCtes]]' rb_grp/rb_wgrp), then [[delayRounds]] unrolled
    * pop/defer rounds ordered by seq within each host.
    */
  private def politenessDelayCtes: String = {
    val budget = delayBudgetFor(oracleSfDir)
    val defCap = delayDefaultCapFor(oracleSfDir)
    val rounds = delayRounds
    val hostRe = "'^https?://([^/]+)'"
    val head =
      s"""rb_delay AS MATERIALIZED (
         |  SELECT host, CAST(v AS BIGINT) AS delay FROM (
         |    SELECT g.host, g.v,
         |      ROW_NUMBER() OVER (PARTITION BY g.host ORDER BY g.line_no) AS rn
         |    FROM rb_grp g JOIN rb_wgrp w ON w.host = g.host AND w.grp = g.grp
         |    WHERE g.k = 'crawl-delay' AND regexp_matches(g.v, '^[0-9]+$$'))
         |  WHERE rn = 1),
         |dcaps AS MATERIALIZED (
         |  SELECT host, GREATEST(1, $budget // delay) AS cap FROM rb_delay),
         |df0 AS MATERIALIZED (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url,
         |    CAST('host0.test' AS VARCHAR) AS host, 0 AS depth,
         |    CAST(0 AS BIGINT) AS seq),
         |ds0 AS MATERIALIZED (SELECT url, seq FROM df0)""".stripMargin
    val steps = (1 to rounds).map { k =>
      s"""dr$k AS MATERIALIZED (
         |  SELECT f.url, f.host, f.depth, f.seq, COALESCE(c.cap, $defCap) AS cap,
         |    ROW_NUMBER() OVER (PARTITION BY f.host ORDER BY f.seq) AS hrk
         |  FROM df${k - 1} f LEFT JOIN dcaps c ON c.host = f.host),
         |dk$k AS MATERIALIZED (SELECT url, host, depth, seq FROM dr$k WHERE hrk <= cap),
         |dd$k AS MATERIALIZED (SELECT url, host, depth, seq FROM dr$k WHERE hrk > cap),
         |dl$k AS MATERIALIZED (
         |  SELECT l.dst_url AS url, p.seq AS pseq, l.pos, p.depth AS pd
         |  FROM ${gt("xlinks")} l JOIN dk$k p ON l.src_url = p.url),
         |dw$k AS MATERIALIZED (
         |  SELECT url, MIN(pseq * 1000000 + pos) AS ok FROM dl$k
         |  WHERE url NOT IN (SELECT url FROM ds${k - 1}) GROUP BY url),
         |dn$k AS MATERIALIZED (
         |  SELECT w.url, regexp_extract(w.url, $hostRe, 1) AS host,
         |    l.pd + 1 AS depth,
         |    (SELECT MAX(seq) FROM ds${k - 1})
         |      + ROW_NUMBER() OVER (ORDER BY w.ok) AS seq
         |  FROM dw$k w JOIN dl$k l ON l.url = w.url AND l.pseq * 1000000 + l.pos = w.ok),
         |df$k AS MATERIALIZED (
         |  SELECT url, host, depth, seq FROM dd$k
         |  UNION ALL SELECT url, host, depth, seq FROM dn$k),
         |ds$k AS MATERIALIZED (
         |  SELECT url, seq FROM ds${k - 1} UNION ALL SELECT url, seq FROM dn$k),
         |do$k AS MATERIALIZED (SELECT url, depth, $k AS wave FROM dk$k)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** The RFC 9309 robots.txt BODY parse (graft.crawl.RobotsParser)
    * replayed line by line in SQL over the corpus's served bodies, for the
    * engine UA: comment strip → trim → drop empty / colon-less lines →
    * (lowercased key, value) split on the FIRST colon → user-agent runs
    * numbered into groups (lag + running sum) → token scoring ('*' = 0,
    * prefix-of-ua = token length) → longest token wins, all groups
    * carrying it merge → allow/disallow lines with non-empty values in
    * body order. Ends with `rb_rules(host, rule_id, verdict, pattern)`.
    * MATERIALIZED throughout (DuckDB inlines CTEs).
    */
  private def robotsParseCtes(ua: String = "graftbot"): String =
    s"""rb_raw AS MATERIALIZED (
       |  SELECT host, unnest(list_zip(str_split(body, chr(10)),
       |    range(1, len(str_split(body, chr(10))) + 1))) AS p
       |  FROM ${gt("robots_txt")}),
       |rb_lines AS MATERIALIZED (
       |  SELECT host, CAST(p[2] AS BIGINT) AS line_no,
       |    trim(CASE WHEN strpos(p[1], '#') > 0
       |         THEN substr(p[1], 1, strpos(p[1], '#') - 1) ELSE p[1] END) AS l
       |  FROM rb_raw),
       |rb_kv AS MATERIALIZED (
       |  SELECT host, line_no,
       |    lower(trim(substr(l, 1, strpos(l, ':') - 1))) AS k,
       |    trim(substr(l, strpos(l, ':') + 1)) AS v
       |  FROM rb_lines WHERE l <> '' AND strpos(l, ':') > 1),
       |rb_mark AS MATERIALIZED (
       |  SELECT host, line_no, k, v,
       |    CASE WHEN k = 'user-agent' AND
       |      COALESCE(lag(k) OVER (PARTITION BY host ORDER BY line_no), '')
       |        <> 'user-agent' THEN 1 ELSE 0 END AS st
       |  FROM rb_kv),
       |rb_grp AS MATERIALIZED (
       |  SELECT host, line_no, k, v,
       |    SUM(st) OVER (PARTITION BY host ORDER BY line_no) AS grp
       |  FROM rb_mark),
       |rb_agents AS MATERIALIZED (
       |  SELECT host, grp,
       |    lower(CASE WHEN strpos(v, ' ') > 0
       |          THEN substr(v, 1, strpos(v, ' ') - 1) ELSE v END) AS tok
       |  FROM rb_grp WHERE k = 'user-agent'),
       |rb_cand AS MATERIALIZED (
       |  SELECT host, grp, tok,
       |    CASE WHEN tok = '*' THEN 0 ELSE strlen(tok) END AS score
       |  FROM rb_agents
       |  WHERE tok = '*' OR (tok <> '' AND starts_with('$ua', tok))),
       |rb_win AS MATERIALIZED (
       |  SELECT host, MAX(score) AS s FROM rb_cand GROUP BY host),
       |rb_wgrp AS MATERIALIZED (
       |  SELECT DISTINCT a.host, a.grp
       |  FROM rb_cand c
       |  JOIN rb_win w ON w.host = c.host AND c.score = w.s
       |  JOIN rb_agents a ON a.host = c.host AND a.tok = c.tok),
       |rb_rules AS MATERIALIZED (
       |  SELECT g.host,
       |    ROW_NUMBER() OVER (PARTITION BY g.host ORDER BY g.line_no) - 1 AS rule_id,
       |    g.k AS verdict, g.v AS pattern
       |  FROM rb_grp g JOIN rb_wgrp w ON w.host = g.host AND w.grp = g.grp
       |  WHERE g.k IN ('allow', 'disallow') AND g.v <> '')""".stripMargin

  /** Pattern → regex inside SQL, mirroring Robots9309.ruleRegex (escape
    * '.' first, then '*' → '.*', anchored at start).
    */
  private val rbRegexSql: String =
    "'^' || replace(replace(pattern, '.', '\\.'), '*', '.*')"

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
    "crawl_meta_flags" -> ((s, d) => C.metaFlags(s, d)),
    "crawl_meta_gated" -> ((s, d) => C.metaGatedCrawl(s, d)),
    "crawl_redirect_targets" -> ((s, d) => C.redirectTargets(s, d)),
    "crawl_redirect_gated" -> ((s, d) => C.redirectCrawl(s, d)),
    "crawl_redirect_chains" -> ((s, d) => C.redirectChains(s, d)),
    "crawl_url_scrub" -> ((s, d) => C.urlScrub(s, d)),
    "crawl_index_fold" -> ((s, d) => C.indexFold(s, d)),
    "crawl_canonical_targets" -> ((s, d) => C.canonicalTargets(s, d)),
    "crawl_canonical_fold" -> ((s, d) => C.canonicalFold(s, d)),
    "crawl_full_gates" -> ((s, d) => C.fullGatesCrawl(s, d)),
    "crawl_cuckoo_seen" -> ((s, d) => C.cuckooSeen(s, d)),
    "crawl_saved_titles" -> ((s, d) => C.savedTitles(s, d)),
    "crawl_article_html" -> ((s, d) => C.savedArticleHtml(s, d)),
    "crawl_saved_articles" -> ((s, d) => C.savedArticles(s, d)),
    "crawl_limit_cut" -> ((s, d) => C.limitCut(s, d, 100)),
    "crawl_robots_seen" -> ((s, d) => C.robotsSeen(s, d)),
    "crawl_bfs_rfc9309" -> ((s, d) => C.robots9309Seen(s, d)),
    "crawl_robots_parse" -> ((s, d) => graft.crawl.Robots9309.parsedRules(s, d)),
    "crawl_multihost_rfc9309" -> ((s, d) => C.multihost9309Seen(s, d)),
    "crawl_multihost_seen" -> ((s, d) => C.multihostSeen(s, d)),
    "crawl_xlink_extract" -> ((s, d) => C.xlinkExtract(s, d)),
    "crawl_follow_seen" -> ((s, d) => C.followSeen(s, d)),
    "crawl_resume_seen" -> ((s, d) => C.resumedSeen(s, d)),
    "crawl_wave_metrics" -> ((s, d) => C.waveMetrics(s, d)),
    "crawl_link_extract" -> ((s, d) => C.linkExtract(s, d)),
    "crawl_extract_titles" -> ((s, d) => C.extractTitles(s, d)),
    "crawl_extract_markdown" -> ((s, d) => C.extractMarkdown(s, d)),
    "crawl_recrawl_delta" -> ((s, d) => C.recrawlDelta(s, d)),
    "crawl_selector_md" -> ((s, d) => C.selectorMd(s, d)),
    "stream_extract" -> ((s, d) => C.streamExtract(s, d)),
    "stream_sessions" -> ((s, d) => C.fetchSessions(s, d)),
    "stream_host_state" -> ((s, d) => C.streamHostState(s, d)),
    "stream_host_distinct" -> ((s, d) => C.streamHostDistinct(s, d)),
    "crawl_limit_prefix" -> ((s, d) => C.limitPrefix(s, d, 100)),
    "crawl_limit_set" -> ((s, d) => C.limitSet(s, d, 100)),
    "crawl_robots_blocked" -> ((s, d) => C.robotsBlocked(s, d)),
    "crawl_host_budget" -> ((s, d) => C.hostBudget(s, d, 50)),
    "crawl_politeness_cap" -> ((s, d) => C.politenessCap(s, d, PolitenessCap)),
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
    "dd_dup_clusters" -> ((s, d) => Dedup.dupClusters(s, d)),
    "dd_cluster_residual" -> ((s, d) => Dedup.clusterConvergence(s, d)),
    "dd_dup_keep" -> ((s, d) => Dedup.dedupedDocs(s, d)),
    "dd_dup_rate_by_source" -> ((s, d) => Dedup.dupRateBySource(s, d)),
    "dd_train_manifest" -> ((s, d) => Dedup.trainManifest(s, d)),
    "dd_data_mix" -> ((s, d) => Dedup.dataMix(s, d)),
    "dd_mix_budget" -> ((s, d) => Dedup.mixBudget(s, d)),
    "dd_corpus_assembly" -> ((s, d) => Dedup.corpusAssembly(s, d)),
    "dd_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "dd_repeated_ngrams" -> ((s, d) => Dedup.repeatedNgrams(s, d)),
    "dd_span_coverage" -> ((s, d) => Dedup.spanCoverage(s, d)),
    "dd_contamination" -> ((s, d) => Dedup.contamination(s, d)),
    "dd_token_count" -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "dd_pii_scrub" -> ((s, d) => TextAnalysis.piiScrub(s, d)),
    "dd_sample_stratified" -> ((s, d) => TextAnalysis.stratifiedSample(s, d)),
    "dd_subword_count" -> ((s, d) => TextAnalysis.subwordCounts(s, d)),
    "dd_bpe_merges" -> ((s, d) => Bpe.mergeTable(s, d)),
    "dd_bpe_token_count" -> ((s, d) => Bpe.tokenCounts(s, d)),
    "dd_quality" -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "dd_quality_gopher" -> ((s, d) => TextAnalysis.qualityGopher(s, d)),
    "dd_quality_c4" -> ((s, d) => TextAnalysis.qualityC4(s, d)),
    "dd_lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "dd_lang_id_profile" -> ((s, d) => TextAnalysis.langIdProfile(s, d)),
    "dd_fingerprint" -> ((s, d) => TextAnalysis.fingerprints(s, d)),
    "dd_lm_score" -> ((s, d) => graft.pipeline.Lm.lmScore(s, d)),
    "dd_unigram_entropy" ->
      ((s, d) => graft.pipeline.TextAnalysis.unigramEntropy(s, d)),
    "dd_text_nfc" -> ((s, d) => graft.pipeline.TextAnalysis.textNfc(s, d)),
    "dd_dsir_weights" -> ((s, d) => graft.pipeline.Dsir.dsirWeights(s, d)),
    "dd_dsir_sample" -> ((s, d) => graft.pipeline.Dsir.dsirSample(s, d)),
    "dd_nb_quality" -> ((s, d) => graft.pipeline.NbQuality.nbQuality(s, d)),
    "dd_len_deciles" -> ((s, d) => TextAnalysis.lenDeciles(s, d)),
    "crawl_url_templates" -> ((s, d) => C.urlTemplates(s, d)),
    "crawl_trap_gated" -> ((s, d) => C.trapGatedSeen(s, d)),
    "dd_lm_buckets" -> ((s, d) => graft.pipeline.Lm.lmBuckets(s, d)),
    "dd_line_dedup" -> ((s, d) => Dedup.lineDedup(s, d)),
    "dd_source_boilerplate" -> ((s, d) => Dedup.sourceBoilerplate(s, d)),
    "dd_boilerplate_clean" -> ((s, d) => Dedup.boilerplateClean(s, d)),
    "dd_filter_funnel" -> ((s, d) => Dedup.filterFunnel(s, d)),
    "dd_shard_manifest" -> ((s, d) => Dedup.shardManifest(s, d)),
    "dd_cms_est" -> ((s, d) => graft.pipeline.CountMin.inlinkCmsAudit(s, d)),
    "dd_source_overlap" -> ((s, d) => Dedup.sourceOverlap(s, d)),
    "dd_semdedup" -> ((s, d) => Similarity.semDedup(s, d)),
    "search_postings" -> ((s, d) => Search.postings(s, d)),
    "search_topk" -> ((s, d) => Search.searchTopK(s, d)),
    "search_bm25" -> ((s, d) => Search.bm25TopK(s, d)),
    "search_more_like_this" -> ((s, d) => Search.moreLikeThis(s, d)),
    "search_postings_varbyte" -> ((s, d) => Search.postingsVarbyte(s, d)),
    "search_ql_dirichlet" -> ((s, d) => Search.qlDirichletTopK(s, d)),
    "search_ranker_eval" -> ((s, d) => Search.rankerEval(s, d)),
    "search_rrf" -> ((s, d) => Search.rrfTopK(s, d)),
    "search_snippets" -> ((s, d) => Search.searchSnippets(s, d)),
    "search_bm25f" -> ((s, d) =>
      Search.bm25fTopK(s, C.extractMarkdown(s, d), C.anchorText(s, d))),
    "search_phrase" -> ((s, d) => Search.phraseTopK(s, d)),
    "ann_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "ann_pq_topk" -> ((s, d) => Similarity.pqTopK(s, d)),
    "ann_lsh_topk" -> ((s, d) => Similarity.lshTopK(s, d)),
    "ann_ivf_topk" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "ann_ivf_kmeans_topk" -> ((s, d) => Similarity.ivfKmeansTopK(s, d)),
    "ann_dup_pairs" -> ((s, d) => Similarity.embeddingDupPairs(s, d)),
    "ann_recall" -> ((s, d) => Similarity.annRecall(s, d)),
    "ann_recall_planted" -> ((s, d) => Similarity.annRecallPlanted(s, d)),
    "graph_host_stats" -> ((s, d) => graft.pipeline.HostGraph.hostStats(s, d)),
    "graph_host_edges" -> ((s, d) => graft.pipeline.HostGraph.hostEdges(s, d)),
    "graph_anchor_text" -> ((s, d) => C.anchorText(s, d)),
    "graph_anchor_index" -> ((s, d) => C.anchorIndex(s, d)),
    "graph_host_distinct_kmv" ->
      ((s, d) => graft.pipeline.HostGraph.hostDistinctKmv(s, d)),
    "graph_host_hits" -> ((s, d) => graft.pipeline.HostGraph.hostHits(s, d)),
    "crawl_sink_warc" -> ((s, d) => graft.sinks.Warc.warcRecords(s, d)),
    "crawl_warc_roundtrip" -> ((s, d) => C.warcRoundtrip(s, d)),
    "crawl_warc_bfs" -> ((s, d) => C.warcBfsSeen(s, d)),
    "crawl_warc_revisit" -> ((s, d) => graft.sinks.Warc.revisitRecords(s, d)),
    "crawl_revisit_resolve" -> ((s, d) => C.revisitResolve(s, d)),
    "crawl_churn_stats" -> ((s, d) => C.churnStats(s, d)),
    "search_index_delta" -> ((s, d) => C.searchIndexDelta(s, d)),
    "crawl_wet_roundtrip" -> ((s, d) => C.wetRoundtrip(s, d)),
    "crawl_robots_rfc9309" -> ((s, d) => graft.crawl.Robots9309.verdicts(s, d)),
    "crawl_cdx_index" -> ((s, d) => graft.sinks.Warc.cdxIndex(s, d)),
    "crawl_sink_wet" -> ((s, d) => graft.sinks.Warc.wetRecords(s, d)),
    "crawl_priority_frontier" -> ((s, d) => graft.crawl.PriorityCrawl.schedule(s, d)),
    "crawl_priority_bfs" -> ((s, d) =>
      C.priorityBfs(s, d, priorityPopFor(d), priorityHostCapFor(d))),
    "crawl_politeness_delay" -> ((s, d) =>
      C.politenessDelay(s, d, delayBudgetFor(d), delayDefaultCapFor(d))),
    "crawl_sitemap_seeds" -> ((s, d) => graft.sources.Sitemap.entries(s, d)),
    "crawl_sitemap_list" -> ((s, d) => C.sitemapList(s, d)),
    "crawl_sitemap_discovery" -> ((s, d) =>
      graft.sources.Sitemap.discoveredEntries(s, d)),
    "crawl_sitemap_recrawl" -> ((s, d) => C.sitemapRecrawl(s, d)),
    "crawl_sitemap_priority" -> ((s, d) => graft.sources.Sitemap.entriesMeta(s, d)),
    "crawl_sitemap_schedule" -> ((s, d) => graft.sources.Sitemap.prioritySchedule(s, d)),
    "crawl_sitemap_due" -> ((s, d) => C.sitemapDue(s, d)),
    "crawl_refresh_budget" -> ((s, d) => C.refreshBudget(s, d)),
    "graph_host_pagerank" -> ((s, d) => graft.pipeline.HostGraph.hostPageRank(s, d)),
    "graph_host_ppr" ->
      ((s, d) => graft.pipeline.HostGraph.hostPersonalizedPr(s, d)),
    "mm_blob_meta" -> ((s, d) => Multimodal.blobMeta(s, d)),
    "mm_blob_features" -> ((s, d) => Multimodal.blobFeatures(s, d)),
    "mm_blob_transform" -> ((s, d) => Multimodal.blobTransforms(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (TPC-H-ish tables by name; corpus ground truth
    * via read_parquet absolute paths).
    */
  def oracleSql: Map[String, String] = Map(
    "crawl_bfs_seen" ->
      s"""$reachCte
         |SELECT url, CAST(depth AS BIGINT) AS depth FROM seen""".stripMargin,
    // page-level <meta name="robots"> flags parsed from raw HTML, pinned
    // page-by-page against the encode-side ground truth (case-insensitive
    // name/tokens, comma list, the "none" shorthand, agent-specific and
    // description metas ignored)
    "crawl_meta_flags" ->
      s"""SELECT url, CAST(noindex AS BIGINT) AS noindex,
         |  CAST(nofollow AS BIGINT) AS nofollow
         |FROM ${gt("meta")} WHERE empty_html = 0""".stripMargin,
    // meta-robots-gated BFS: reachability stops expanding at nofollow
    // pages; saved = seen ∧ live ∧ not noindex (dangling discoveries have
    // no meta row → saved 0)
    "crawl_meta_gated" ->
      s"""WITH RECURSIVE mreach(url, depth) AS (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth
         |  UNION
         |  SELECT l.dst_url, r.depth + 1
         |  FROM mreach r
         |  JOIN ${gt("meta")} m ON m.url = r.url AND m.nofollow = 0
         |  JOIN ${gt("links")} l ON l.src_url = r.url
         |  WHERE r.depth < 64
         |), mseen AS (SELECT url, MIN(depth) AS depth FROM mreach GROUP BY url)
         |SELECT s.url, CAST(s.depth AS BIGINT) AS depth,
         |  CAST(CASE WHEN m.empty_html = 0 AND m.noindex = 0
         |       THEN 1 ELSE 0 END AS BIGINT) AS saved
         |FROM mseen s LEFT JOIN ${gt("meta")} m ON m.url = s.url""".stripMargin,
    // EVERY production gate in ONE crawl: parsed RFC 9309 rules (longest
    // match, allow wins ties), the mined trap blocklist, meta-robots
    // nofollow/noindex, and meta-refresh redirects — the oracle composes
    // the proven per-gate CTEs over one jointly-filtered edge set
    "crawl_full_gates" ->
      s"""WITH RECURSIVE ${robotsParseCtes()},
         |r9 AS MATERIALIZED (
         |  SELECT host, rule_id, verdict, pattern, $rbRegexSql AS regex,
         |    strlen(pattern) AS plen
         |  FROM rb_rules),
         |tmt AS MATERIALIZED (
         |  SELECT regexp_extract(dst_url, '^https?://([^/]+)', 1) AS h,
         |    regexp_replace(regexp_extract(dst_url, '^https?://[^/]+(.*)${"$"}', 1),
         |      '[0-9]+', 'N', 'g') AS t,
         |    COUNT(DISTINCT dst_url) AS n
         |  FROM ${gt("xlinks")} GROUP BY 1, 2),
         |blk AS MATERIALIZED (
         |  SELECT h, t FROM (
         |    SELECT h, t, ROW_NUMBER() OVER (PARTITION BY h
         |      ORDER BY n DESC, t) AS rn FROM tmt)
         |  WHERE rn = 1),
         |edges AS MATERIALIZED (
         |  SELECT url AS src_url, redirect_to AS dst_url
         |  FROM ${gt("meta")} WHERE redirect_to <> ''
         |  UNION ALL
         |  SELECT l.src_url, l.dst_url
         |  FROM ${gt("links")} l JOIN ${gt("meta")} m ON m.url = l.src_url
         |  WHERE m.redirect_to = '' AND m.nofollow = 0),
         |cand AS MATERIALIZED (SELECT DISTINCT dst_url FROM edges),
         |rgate AS MATERIALIZED (
         |  SELECT dst_url FROM (
         |    SELECT c.dst_url, rb.verdict,
         |      ROW_NUMBER() OVER (PARTITION BY c.dst_url
         |        ORDER BY rb.plen DESC, rb.verdict ASC, rb.rule_id ASC) AS rn
         |    FROM cand c LEFT JOIN r9 rb
         |      ON rb.host = regexp_extract(c.dst_url, '^https?://([^/]+)', 1)
         |     AND regexp_matches(
         |      regexp_replace(c.dst_url, '^https?://[^/]*', ''), rb.regex)
         |  ) WHERE rn = 1 AND COALESCE(verdict, 'allow') = 'allow'),
         |okd AS MATERIALIZED (
         |  SELECT g.dst_url FROM rgate g WHERE NOT EXISTS (
         |    SELECT 1 FROM blk
         |    WHERE blk.h = regexp_extract(g.dst_url, '^https?://([^/]+)', 1)
         |      AND blk.t = regexp_replace(
         |        regexp_extract(g.dst_url, '^https?://[^/]+(.*)${"$"}', 1),
         |        '[0-9]+', 'N', 'g'))),
         |ged AS MATERIALIZED (
         |  SELECT e.src_url, e.dst_url FROM edges e
         |  JOIN okd o ON o.dst_url = e.dst_url),
         |freach(url, depth) AS (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth
         |  UNION
         |  SELECT e.dst_url, r.depth + 1
         |  FROM freach r JOIN ged e ON e.src_url = r.url
         |  WHERE r.depth < 64
         |), fseen AS (SELECT url, MIN(depth) AS depth FROM freach GROUP BY url)
         |SELECT s.url, CAST(s.depth AS BIGINT) AS depth,
         |  CAST(CASE WHEN m.empty_html = 0 AND m.noindex = 0
         |         AND m.redirect_to = '' THEN 1 ELSE 0 END AS BIGINT) AS saved
         |FROM fseen s LEFT JOIN ${gt("meta")} m ON m.url = s.url""".stripMargin,
    // rel=canonical targets parsed+resolved from raw HTML (REL token list
    // case-insensitive, absolute + relative spellings, stylesheet links
    // ignored); self-canonicals resolve to the page itself
    "crawl_canonical_targets" ->
      s"""SELECT url, canonical_to FROM ${gt("meta")}
         |WHERE empty_html = 0""".stripMargin,
    // canonical-aware dedup fold: rep = declared canonical else self;
    // group sizes over the live pages
    "crawl_canonical_fold" ->
      s"""WITH f AS (
         |  SELECT url,
         |    CASE WHEN canonical_to <> '' THEN canonical_to ELSE url END AS rep
         |  FROM ${gt("meta")} WHERE empty_html = 0),
         |gs AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS group_size
         |       FROM f GROUP BY rep)
         |SELECT f.url, f.rep, gs.group_size
         |FROM f JOIN gs ON gs.rep = f.rep""".stripMargin,
    // meta-refresh targets parsed+resolved from raw HTML: three raw
    // spellings must land on the encode-side normalized value, '' elsewhere
    "crawl_redirect_targets" ->
      s"""SELECT url, redirect_to FROM ${gt("meta")}
         |WHERE empty_html = 0""".stripMargin,
    // redirect-following BFS: a redirect page's only outgoing edge is its
    // target; it is seen, never saved
    "crawl_redirect_gated" ->
      s"""WITH RECURSIVE redges AS MATERIALIZED (
         |  SELECT l.src_url, l.dst_url
         |  FROM ${gt("links")} l JOIN ${gt("meta")} m
         |    ON m.url = l.src_url AND m.redirect_to = ''
         |  UNION ALL
         |  SELECT url AS src_url, redirect_to AS dst_url
         |  FROM ${gt("meta")} WHERE redirect_to <> ''),
         |rreach(url, depth) AS (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth
         |  UNION
         |  SELECT e.dst_url, r.depth + 1
         |  FROM rreach r JOIN redges e ON e.src_url = r.url
         |  WHERE r.depth < 64
         |), rseen AS (SELECT url, MIN(depth) AS depth FROM rreach GROUP BY url)
         |SELECT s.url, CAST(s.depth AS BIGINT) AS depth,
         |  CAST(CASE WHEN m.empty_html = 0 AND m.redirect_to = ''
         |       THEN 1 ELSE 0 END AS BIGINT) AS saved
         |FROM rseen s LEFT JOIN ${gt("meta")} m ON m.url = s.url""".stripMargin,
    // tracking-param scrub over the injected 3-variant view: the oracle
    // states the scrubbed form by construction (tracking keys removed,
    // survivors sorted), the engine re-derives it with the real parser.
    // NOTE (ADVICE r5): the string concatenation below is only correct
    // because corpus base urls are query- and '?'-free (CorpusGen page
    // urls carry no query string); a CorpusGen change adding query-bearing
    // urls would make this row fail — by construction, not by engine drift.
    "crawl_url_scrub" ->
      s"""WITH u AS (SELECT url, substr(md5(url), 1, 4) AS h FROM ${gt("meta")}),
         |vars AS (
         |  SELECT url AS vurl, url AS scrubbed FROM u
         |  UNION ALL
         |  SELECT url || '?z=9&utm_source=feed&id=' || h || '&a=1',
         |         url || '?a=1&id=' || h || '&z=9' FROM u
         |  UNION ALL
         |  SELECT url || '?a=1&id=' || h || '&utm_medium=rss&z=9',
         |         url || '?a=1&id=' || h || '&z=9' FROM u)
         |SELECT vurl AS url, scrubbed FROM vars""".stripMargin,
    // redirect-chain fold: walk each redirect source one hop per recursion
    // step; the walk stops naturally when the cursor is not a redirect page
    // (terminal) and is cut at R hops (a chain still walking after R hops
    // revisited some node — it is cycle-trapped). Exactly the pointer-
    // doubling semantics, derived independently.
    "crawl_redirect_chains" ->
      s"""WITH RECURSIVE r AS MATERIALIZED (
         |  SELECT url, redirect_to FROM ${gt("meta")} WHERE redirect_to <> ''),
         |walk(src, cur, hops) AS (
         |  SELECT url AS src, redirect_to AS cur, CAST(1 AS BIGINT) AS hops
         |  FROM r
         |  UNION ALL
         |  SELECT w.src, r2.redirect_to, w.hops + 1
         |  FROM walk w JOIN r r2 ON r2.url = w.cur
         |  WHERE w.hops <= (SELECT COUNT(*) FROM r)),
         |term AS (
         |  SELECT w.src, w.cur AS terminal, w.hops
         |  FROM walk w LEFT JOIN r r3 ON r3.url = w.cur
         |  WHERE r3.url IS NULL)
         |SELECT s.url, COALESCE(t.terminal, '') AS terminal,
         |  COALESCE(t.hops, CAST(-1 AS BIGINT)) AS hops,
         |  CAST(CASE WHEN t.src IS NULL THEN 1 ELSE 0 END AS BIGINT) AS cycled
         |FROM (SELECT url FROM r) s LEFT JOIN term t ON t.src = s.url""".stripMargin,
    // representative-url index fold: X68 × X51 composed — redirect sources
    // fold to the canonical-or-self of their chain terminal, cycles get no
    // representative, everything else folds canonical-or-self
    "crawl_index_fold" ->
      s"""WITH RECURSIVE r AS MATERIALIZED (
         |  SELECT url, redirect_to FROM ${gt("meta")} WHERE redirect_to <> ''),
         |walk(src, cur, hops) AS (
         |  SELECT url AS src, redirect_to AS cur, CAST(1 AS BIGINT) AS hops
         |  FROM r
         |  UNION ALL
         |  SELECT w.src, r2.redirect_to, w.hops + 1
         |  FROM walk w JOIN r r2 ON r2.url = w.cur
         |  WHERE w.hops <= (SELECT COUNT(*) FROM r)),
         |term AS (
         |  SELECT w.src, w.cur AS terminal
         |  FROM walk w LEFT JOIN r r3 ON r3.url = w.cur
         |  WHERE r3.url IS NULL),
         |chains AS (
         |  SELECT s.url, COALESCE(t.terminal, '') AS terminal,
         |    CASE WHEN t.src IS NULL THEN 1 ELSE 0 END AS cycled
         |  FROM (SELECT url FROM r) s LEFT JOIN term t ON t.src = s.url),
         |c AS (SELECT url, canonical_to FROM ${gt("meta")} WHERE empty_html = 0),
         |crep AS (SELECT url AS cu,
         |           CASE WHEN canonical_to <> '' THEN canonical_to ELSE url END AS crep
         |         FROM c)
         |SELECT c.url,
         |  CASE WHEN c.canonical_to <> '' THEN c.canonical_to ELSE c.url END AS rep,
         |  CASE WHEN c.canonical_to <> '' THEN 'canonical' ELSE 'self' END AS via
         |FROM c WHERE c.url NOT IN (SELECT url FROM r)
         |UNION ALL
         |SELECT ch.url,
         |  CASE WHEN ch.cycled = 1 THEN ''
         |       ELSE COALESCE(cr.crep, ch.terminal) END AS rep,
         |  CASE WHEN ch.cycled = 1 THEN 'cycle'
         |       WHEN cr.crep IS NOT NULL AND cr.crep <> ch.terminal
         |         THEN 'redirect+canonical'
         |       ELSE 'redirect' END AS via
         |FROM chains ch LEFT JOIN crep cr ON cr.cu = ch.terminal""".stripMargin,
    // cuckoo seen-filter run: the pre-filter cannot change exact results,
    // so the oracle is the identical reachability CTE — any cuckoo false
    // negative would surface as duplicate rows / wrong depths here
    "crawl_cuckoo_seen" ->
      s"""$reachCte
         |SELECT url, CAST(depth AS BIGINT) AS depth FROM seen""".stripMargin,
    "crawl_saved_titles" ->
      s"""$reachCte
         |SELECT m.url, m.title FROM seen r JOIN ${gt("meta")} m ON m.url = r.url
         |WHERE m.empty_html = 0""".stripMargin,
    "crawl_saved_articles" ->
      s"""$reachCte
         |SELECT m.url, m.title FROM seen r JOIN ${gt("meta")} m ON m.url = r.url
         |WHERE m.section = 'articles' AND m.empty_html = 0""".stripMargin,
    "crawl_article_html" ->
      s"""$reachCte
         |SELECT m.url, m.article_html FROM seen r JOIN ${gt("meta")} m ON m.url = r.url
         |WHERE m.empty_html = 0""".stripMargin,
    "crawl_limit_cut" ->
      s"""$reachCte
         |SELECT CAST(LEAST(100, COUNT(*)) AS BIGINT) AS saved_cnt
         |FROM seen r JOIN ${gt("meta")} m ON m.url = r.url
         |WHERE m.empty_html = 0""".stripMargin,
    // politeness wave cap: fetched pages with their pop wave — the unrolled
    // pop/defer rounds; non-empty pages only (empty html ≙ fetch error)
    "crawl_politeness_cap" ->
      s"""WITH $politenessCapCtes,
         |oall AS (${(1 to capRounds).map(k => s"SELECT url, depth, wave FROM o$k")
        .mkString(" UNION ALL ")})
         |SELECT o.url, CAST(o.depth AS BIGINT) AS depth, CAST(o.wave AS BIGINT) AS wave
         |FROM oall o JOIN ${gt("meta")} m ON m.url = o.url
         |WHERE m.empty_html = 0""".stripMargin,
    // best-first priority schedule through the wave engine (politeness cap
    // active): unrolled pop/defer rounds over the PageRank host priorities;
    // non-empty pages only (empty html ≙ fetch error)
    "crawl_priority_bfs" ->
      s"""WITH $pagerankCteBody,
         |$priorityBfsCtes,
         |poall AS (${(1 to priorityBfsRounds)
        .map(k => s"SELECT url, depth, wave FROM po$k").mkString(" UNION ALL ")})
         |SELECT o.url, CAST(o.depth AS BIGINT) AS depth, CAST(o.wave AS BIGINT) AS wave
         |FROM poall o JOIN ${gt("meta")} m ON m.url = o.url
         |WHERE m.empty_html = 0""".stripMargin,
    "crawl_limit_prefix" ->
      s"""$reachCte,
         |sv AS (SELECT r.depth, COUNT(*) AS n
         |       FROM seen r JOIN ${gt("meta")} m ON m.url = r.url
         |       WHERE m.empty_html = 0 GROUP BY 1),
         |run AS (SELECT depth, SUM(n) OVER (ORDER BY depth) AS cum FROM sv),
         |cutd AS (SELECT MIN(depth) AS d FROM run WHERE cum >= 100)
         |SELECT r.url, CAST(r.depth AS BIGINT) AS depth
         |FROM seen r JOIN ${gt("meta")} m ON m.url = r.url, cutd
         |WHERE m.empty_html = 0 AND r.depth < cutd.d""".stripMargin,
    // the EXACT --limit saved set incl. the partial cut depth's FIFO prefix:
    // a url's within-depth rank is the lexicographic min over its
    // shortest-path link-pos arrays (enqueue order = depth, parent_seq, pos)
    "crawl_limit_set" ->
      s"""WITH RECURSIVE paths(url, depth, path) AS (
         |  SELECT CAST('http://host0.test/' AS VARCHAR), 0, CAST([] AS BIGINT[])
         |  UNION
         |  SELECT l.dst_url, p.depth + 1, list_append(p.path, CAST(l.pos AS BIGINT))
         |  FROM paths p JOIN ${gt("links")} l ON l.src_url = p.url
         |  WHERE p.depth < 8
         |),
         |mind AS (SELECT url, MIN(depth) AS depth FROM paths GROUP BY url),
         |keyed AS (
         |  SELECT p.url, p.depth, MIN(p.path) AS sortkey
         |  FROM paths p JOIN mind m ON m.url = p.url AND m.depth = p.depth
         |  GROUP BY p.url, p.depth
         |),
         |sv AS (
         |  SELECT k.url, k.depth, k.sortkey
         |  FROM keyed k JOIN ${gt("meta")} mt ON mt.url = k.url
         |  WHERE mt.empty_html = 0
         |),
         |ranked AS (SELECT url, depth, ROW_NUMBER() OVER (ORDER BY depth, sortkey) AS rn FROM sv)
         |SELECT url, CAST(depth AS BIGINT) AS depth FROM ranked WHERE rn <= 100""".stripMargin,
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
    // BFS reachability gated by RFC 9309 rules PARSED from host0's served
    // robots.txt body: a link is enqueued only if its longest-matching rule
    // (allow wins ties) is an allow. The verdicts are precomputed per
    // DISTINCT link target in a MATERIALIZED gate CTE (window-ranked
    // winner, no correlated subquery) so the recursion is pure equi-joins:
    // DuckDB 1.0 evaluates a correlated subquery over window-function CTEs
    // NONDETERMINISTICALLY inside recursion (observed 1779 vs 1803 rows on
    // back-to-back runs of the same query).
    "crawl_bfs_rfc9309" ->
      s"""WITH RECURSIVE ${robotsParseCtes()},
         |r9 AS MATERIALIZED (
         |  SELECT rule_id, verdict, pattern, $rbRegexSql AS regex,
         |    strlen(pattern) AS plen
         |  FROM rb_rules WHERE host = 'host0.test'),
         |gate AS MATERIALIZED (
         |  SELECT dst_url FROM (
         |    SELECT d.dst_url, rb.verdict,
         |      ROW_NUMBER() OVER (PARTITION BY d.dst_url
         |        ORDER BY rb.plen DESC, rb.verdict ASC, rb.rule_id ASC) AS rn
         |    FROM (SELECT DISTINCT dst_url FROM ${gt("links")}) d
         |    LEFT JOIN r9 rb ON regexp_matches(
         |      regexp_replace(d.dst_url, '^https?://[^/]*', ''), rb.regex)
         |  ) WHERE rn = 1 AND COALESCE(verdict, 'allow') = 'allow'),
         |reach(url, depth) AS (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth
         |  UNION
         |  SELECT l.dst_url, r.depth + 1
         |  FROM reach r JOIN ${gt("links")} l ON l.src_url = r.url
         |  JOIN gate g ON g.dst_url = l.dst_url
         |  WHERE r.depth < 64
         |)
         |SELECT url, CAST(MIN(depth) AS BIGINT) AS depth FROM reach GROUP BY url""".stripMargin,
    // crawl-delay politeness end to end: per-host caps derived from the
    // winning group's crawl-delay in the PARSED robots bodies, then the
    // multi-host FIFO pop/defer schedule under those caps
    "crawl_politeness_delay" ->
      s"""WITH ${robotsParseCtes()},
         |$politenessDelayCtes,
         |doall AS (${(1 to delayRounds)
        .map(k => s"SELECT url, depth, wave FROM do$k").mkString(" UNION ALL ")})
         |SELECT o.url, CAST(o.depth AS BIGINT) AS depth, CAST(o.wave AS BIGINT) AS wave
         |FROM doall o JOIN ${gt("meta")} m ON m.url = o.url
         |WHERE m.empty_html = 0""".stripMargin,
    // sitemap seed acquisition: every <url> block of every urlset document
    // (index documents contribute none; their children are separate rows),
    // locs trimmed, lastmod '' when absent — mirrors sources.Sitemap
    "crawl_sitemap_seeds" ->
      s"""WITH sm AS (
         |  SELECT host, url AS sitemap_url, body FROM ${gt("sitemaps")}
         |  WHERE NOT contains(body, '<sitemapindex')),
         |bl AS (
         |  SELECT host, sitemap_url,
         |    unnest(regexp_extract_all(body, '<url>.*?</url>')) AS b
         |  FROM sm)
         |SELECT host, sitemap_url,
         |  trim(regexp_extract(b, '<loc>([^<]*)</loc>', 1)) AS loc,
         |  regexp_extract(b, '<lastmod>([^<]*)</lastmod>', 1) AS lastmod
         |FROM bl""".stripMargin,
    // full per-entry sitemap metadata: changefreq token and the priority
    // hint in integer tenths (protocol default 0.5 -> 5 when absent)
    "crawl_sitemap_priority" ->
      s"""WITH sm AS (
         |  SELECT host, url AS sitemap_url, body FROM ${gt("sitemaps")}
         |  WHERE NOT contains(body, '<sitemapindex')),
         |bl AS (
         |  SELECT host, sitemap_url,
         |    unnest(regexp_extract_all(body, '<url>.*?</url>')) AS b
         |  FROM sm)
         |SELECT host, sitemap_url,
         |  trim(regexp_extract(b, '<loc>([^<]*)</loc>', 1)) AS loc,
         |  regexp_extract(b, '<lastmod>([^<]*)</lastmod>', 1) AS lastmod,
         |  trim(regexp_extract(b, '<changefreq>([^<]*)</changefreq>', 1)) AS changefreq,
         |  CAST(CASE WHEN regexp_extract(b, '<priority>([^<]*)</priority>', 1)
         |              SIMILAR TO '[01]\\.[0-9]'
         |       THEN CAST(substr(trim(regexp_extract(b, '<priority>([^<]*)</priority>', 1)), 1, 1) AS INT) * 10
         |          + CAST(substr(trim(regexp_extract(b, '<priority>([^<]*)</priority>', 1)), 3, 1) AS INT)
         |       ELSE 5 END AS BIGINT) AS priority_q10
         |FROM bl""".stripMargin,
    // priority-ordered per-host fetch schedule: sibling-sitemap duplicates
    // merge by max hint, rank (priority desc, loc), top 10 per host
    "crawl_sitemap_schedule" ->
      s"""WITH sm AS (
         |  SELECT host, body FROM ${gt("sitemaps")}
         |  WHERE NOT contains(body, '<sitemapindex')),
         |bl AS (
         |  SELECT host, unnest(regexp_extract_all(body, '<url>.*?</url>')) AS b
         |  FROM sm),
         |e AS (
         |  SELECT host,
         |    trim(regexp_extract(b, '<loc>([^<]*)</loc>', 1)) AS loc,
         |    CASE WHEN regexp_extract(b, '<priority>([^<]*)</priority>', 1)
         |           SIMILAR TO '[01]\\.[0-9]'
         |         THEN CAST(substr(trim(regexp_extract(b, '<priority>([^<]*)</priority>', 1)), 1, 1) AS INT) * 10
         |            + CAST(substr(trim(regexp_extract(b, '<priority>([^<]*)</priority>', 1)), 3, 1) AS INT)
         |         ELSE 5 END AS q
         |  FROM bl),
         |m AS (SELECT host, loc, MAX(q) AS priority_q10 FROM e GROUP BY 1, 2),
         |r AS (SELECT host, loc, CAST(priority_q10 AS BIGINT) AS priority_q10,
         |        ROW_NUMBER() OVER (PARTITION BY host
         |          ORDER BY priority_q10 DESC, loc) AS rank
         |      FROM m)
         |SELECT host, loc, priority_q10, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 10""".stripMargin,
    // hint-aware due set: lastmod + changefreq interval lapsed at the cycle
    // date (always/hourly 0, daily 1, weekly+default 7, monthly 30, yearly
    // 365, never: never due)
    "crawl_sitemap_due" ->
      s"""WITH sm AS (
         |  SELECT host, body FROM ${gt("sitemaps")}
         |  WHERE NOT contains(body, '<sitemapindex')),
         |bl AS (
         |  SELECT host, unnest(regexp_extract_all(body, '<url>.*?</url>')) AS b
         |  FROM sm),
         |e AS (
         |  SELECT host,
         |    trim(regexp_extract(b, '<loc>([^<]*)</loc>', 1)) AS loc,
         |    regexp_extract(b, '<lastmod>([^<]*)</lastmod>', 1) AS lastmod,
         |    trim(regexp_extract(b, '<changefreq>([^<]*)</changefreq>', 1)) AS changefreq
         |  FROM bl)
         |SELECT DISTINCT host, loc, lastmod, changefreq,
         |  CAST(CASE WHEN changefreq = 'never' THEN 0
         |       WHEN CAST(lastmod AS DATE) +
         |            (CASE changefreq WHEN 'always' THEN 0 WHEN 'hourly' THEN 0
         |                  WHEN 'daily' THEN 1 WHEN 'monthly' THEN 30
         |                  WHEN 'yearly' THEN 365 ELSE 7 END)
         |            <= DATE '${graft.queries.CrawlQueries.SitemapRecrawlCutoff}'
         |       THEN 1 ELSE 0 END AS BIGINT) AS due
         |FROM e WHERE lastmod <> ''""".stripMargin,
    // largest-remainder apportionment of the next-cycle refresh budget over
    // per-host change rates: base = floor(K*w/W), leftover slots by
    // remainder rank, sum(alloc) == K exactly
    "crawl_refresh_budget" ->
      s"""WITH mx AS (
         |  SELECT m.url, m.host_idx, m.page_idx, p.html
         |  FROM ${gt("meta")} m JOIN ${gt("pages")} p ON p.url = m.url),
         |don AS (
         |  SELECT c.url, d.html AS dhtml
         |  FROM mx c JOIN mx d
         |    ON d.host_idx = c.host_idx AND d.page_idx = c.page_idx - 1
         |  WHERE c.page_idx % 7 = 3),
         |v2 AS (
         |  SELECT mx.url,
         |    CASE WHEN sha256(decode(COALESCE(don.dhtml, mx.html)))
         |              = sha256(decode(mx.html))
         |         THEN 1 ELSE 0 END AS stable
         |  FROM mx LEFT JOIN don ON don.url = mx.url),
         |ch AS (
         |  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         |    CAST(SUM(1 - stable) AS BIGINT) AS n_changed
         |  FROM v2 GROUP BY 1),
         |w AS (SELECT host, n_changed, n_changed + 1 AS weight FROM ch),
         |t AS (SELECT SUM(weight) AS w_total FROM w),
         |q AS (SELECT host, n_changed, weight,
         |        (${graft.queries.CrawlQueries.RefreshBudget} * weight) // w_total AS base,
         |        (${graft.queries.CrawlQueries.RefreshBudget} * weight) % w_total AS rem
         |      FROM w CROSS JOIN t),
         |l AS (SELECT ${graft.queries.CrawlQueries.RefreshBudget} - SUM(base) AS leftover FROM q),
         |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, host) AS rk FROM q)
         |SELECT host, n_changed, CAST(weight AS BIGINT) AS weight,
         |  CAST(base + CASE WHEN rk <= (SELECT leftover FROM l) THEN 1 ELSE 0 END
         |       AS BIGINT) AS alloc
         |FROM r""".stripMargin,
    // sitemap-seeded list crawl: titles of the advertised pages that are
    // live and non-empty (ghost entries are fetch misses)
    "crawl_sitemap_list" ->
      s"""WITH sm AS (
         |  SELECT body FROM ${gt("sitemaps")}
         |  WHERE NOT contains(body, '<sitemapindex')),
         |locs AS (
         |  SELECT DISTINCT trim(regexp_extract(u, '<loc>([^<]*)</loc>', 1)) AS url
         |  FROM (SELECT unnest(regexp_extract_all(body, '<url>.*?</url>')) AS u FROM sm))
         |SELECT m.url, m.title FROM ${gt("meta")} m
         |JOIN locs l ON l.url = m.url
         |WHERE m.empty_html = 0""".stripMargin,
    // robots-seeded sitemap discovery: Sitemap: lines parsed out of every
    // robots body (groupless, comment-stripped, key case-insensitive),
    // fetched by join (dead advertised urls drop = fetch miss), one index
    // level resolved, urlsets parsed — the orphan sitemap-old.xml rows
    // must contribute nothing
    "crawl_sitemap_discovery" ->
      s"""WITH $sitemapDiscoveryCtes
         |SELECT host, sitemap_url, loc, lastmod FROM disc""".stripMargin,
    // sitemap-lastmod recrawl: the discovery chain's entries filtered to
    // lastmod past the cutoff (ISO strings compare lexicographically),
    // distinct locs through the list-crawl semantics (live, non-empty)
    "crawl_sitemap_recrawl" ->
      s"""WITH $sitemapDiscoveryCtes,
         |due AS (SELECT DISTINCT loc FROM disc
         |        WHERE lastmod <> ''
         |          AND lastmod > '${graft.queries.CrawlQueries.SitemapRecrawlCutoff}')
         |SELECT m.url, m.title FROM ${gt("meta")} m
         |JOIN due d ON d.loc = m.url
         |WHERE m.empty_html = 0""".stripMargin,
    // the per-host parsed rules TABLE itself: engine = RobotsParser over
    // the served bodies, oracle = the same grammar replayed in SQL
    "crawl_robots_parse" ->
      s"""WITH ${robotsParseCtes()}
         |SELECT host, CAST(rule_id AS BIGINT) AS rule_id, verdict, pattern
         |FROM rb_rules""".stripMargin,
    // multi-host BFS over xlinks where EACH host's gate comes from its own
    // parsed robots.txt (the three body classes differ, so crossing a host
    // boundary switches rule sets mid-crawl)
    "crawl_multihost_rfc9309" ->
      s"""WITH RECURSIVE ${robotsParseCtes()},
         |r9 AS MATERIALIZED (
         |  SELECT host, rule_id, verdict, pattern, $rbRegexSql AS regex,
         |    strlen(pattern) AS plen
         |  FROM rb_rules),
         |gate AS MATERIALIZED (
         |  SELECT dst_url FROM (
         |    SELECT d.dst_url, rb.verdict,
         |      ROW_NUMBER() OVER (PARTITION BY d.dst_url
         |        ORDER BY rb.plen DESC, rb.verdict ASC, rb.rule_id ASC) AS rn
         |    FROM (SELECT DISTINCT dst_url FROM ${gt("xlinks")}) d
         |    LEFT JOIN r9 rb
         |      ON rb.host = regexp_extract(d.dst_url, '^https?://([^/]+)', 1)
         |     AND regexp_matches(
         |      regexp_replace(d.dst_url, '^https?://[^/]*', ''), rb.regex)
         |  ) WHERE rn = 1 AND COALESCE(verdict, 'allow') = 'allow'),
         |reach(url, depth) AS (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth
         |  UNION
         |  SELECT l.dst_url, r.depth + 1
         |  FROM reach r JOIN ${gt("xlinks")} l ON l.src_url = r.url
         |  JOIN gate g ON g.dst_url = l.dst_url
         |  WHERE r.depth < 64
         |)
         |SELECT url, CAST(MIN(depth) AS BIGINT) AS depth FROM reach GROUP BY url""".stripMargin,
    // multi-host BFS reachability with robots: the frontier crosses hosts
    // along the ground-truth xlinks graph; a robots-disallowed url is never
    // enqueued (same rule semantics as crawl_robots_seen)
    "crawl_multihost_seen" ->
      s"""WITH RECURSIVE reach(url, depth) AS (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth
         |  UNION
         |  SELECT l.dst_url, r.depth + 1
         |  FROM reach r JOIN ${gt("xlinks")} l ON l.src_url = r.url
         |  WHERE r.depth < 64 AND NOT EXISTS (
         |    SELECT 1 FROM ${gt("robots")} rb
         |    WHERE l.dst_url LIKE 'http://' || rb.host || rb.disallow_prefix || '%')
         |)
         |SELECT url, CAST(MIN(depth) AS BIGINT) AS depth FROM reach GROUP BY url""".stripMargin,
    "crawl_xlink_extract" ->
      s"SELECT src_url, dst_url, CAST(pos AS BIGINT) AS pos FROM ${gt("xlinks")}",
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
         |       CAST(SUM(CASE WHEN m.url IS NOT NULL AND m.empty_html = 0
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS fetched
         |FROM seen r LEFT JOIN ${gt("meta")} m ON m.url = r.url
         |GROUP BY 1""".stripMargin,
    "crawl_link_extract" ->
      s"SELECT src_url, dst_url, CAST(pos AS BIGINT) AS pos FROM ${gt("links")}",
    "crawl_extract_titles" ->
      s"SELECT url, title FROM ${gt("meta")}",
    // streaming surface parity: the StreamIngest pipeline (micro-batched
    // file source + watermarked url dedup + checkpointed append sink) must
    // land exactly the batch kernel's rows for every non-empty page
    "stream_extract" ->
      s"SELECT url, title, markdown FROM ${gt("meta")} WHERE empty_html = 0",
    // session_window ≡ gap-based lag/cumsum segmentation: events merge while
    // the inter-event gap is < 3 min (Spark breaks at >= gap — mirrored)
    "stream_sessions" ->
      s"""WITH ev AS (
         |  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host, warc_ts
         |  FROM ${gt("pages")}),
         |d AS (
         |  SELECT host, warc_ts,
         |    CASE WHEN lag(warc_ts) OVER (PARTITION BY host ORDER BY warc_ts) IS NULL
         |           OR warc_ts - lag(warc_ts) OVER (PARTITION BY host ORDER BY warc_ts)
         |              >= INTERVAL 3 MINUTE
         |         THEN 1 ELSE 0 END AS brk
         |  FROM ev),
         |s AS (
         |  SELECT host, warc_ts,
         |    SUM(brk) OVER (PARTITION BY host ORDER BY warc_ts) AS sid
         |  FROM d)
         |SELECT host, MIN(warc_ts) AS session_start, MAX(warc_ts) AS session_end,
         |  COUNT(*) AS n_pages
         |FROM s GROUP BY host, sid""".stripMargin,
    // flatMapGroupsWithState per-host running state: each host's FINAL
    // emitted snapshot equals the batch aggregate (counts in the update log
    // strictly increase, so max-count row = last state)
    "stream_host_state" ->
      s"""SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         |  CAST(COUNT(*) AS BIGINT) AS n_pages,
         |  CAST(epoch_ms(MIN(warc_ts)) AS BIGINT) AS min_ts,
         |  CAST(epoch_ms(MAX(warc_ts)) AS BIGINT) AS max_ts
         |FROM ${gt("pages")} GROUP BY 1""".stripMargin,
    // streaming KMV, final snapshot per host == batch sketch over ALL of
    // the host's page urls (same 56-bit md5-prefix hash recipe)
    "stream_host_distinct" -> {
      import graft.pipeline.HostGraph.{KmvK, KmvM}
      s"""WITH hv AS (
         |  SELECT DISTINCT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         |    ('0x' || substr(md5(url), 1, 14))::BIGINT AS hv
         |  FROM ${gt("pages")}),
         |rk AS (SELECT host, hv,
         |         ROW_NUMBER() OVER (PARTITION BY host ORDER BY hv) AS rn FROM hv),
         |nh AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS nh FROM hv GROUP BY 1),
         |kth AS (SELECT host, hv AS hk FROM rk WHERE rn = $KmvK)
         |SELECT nh.host,
         |  CAST(LEAST(nh.nh, $KmvK) AS BIGINT) AS n_mins,
         |  CAST(CASE WHEN nh.nh < $KmvK THEN nh.nh
         |       ELSE ${(KmvK - 1) * KmvM} // kth.hk END AS BIGINT) AS kmv_est
         |FROM nh LEFT JOIN kth ON kth.host = nh.host""".stripMargin
    },
    "crawl_extract_markdown" ->
      s"SELECT url, markdown FROM ${gt("meta")}",
    // snapshot-delta recrawl: changed pages (page_idx%7==3) serve the same
    // host's page_idx-1 html in v2, so their refreshed markdown must be the
    // DONOR page's ground truth; everything else keeps its own
    "crawl_recrawl_delta" ->
      s"""WITH mx AS (SELECT url, host_idx, page_idx, markdown FROM ${gt("meta")}),
         |don AS (
         |  SELECT c.url, d.markdown AS dmd
         |  FROM mx c JOIN mx d
         |    ON d.host_idx = c.host_idx AND d.page_idx = c.page_idx - 1
         |  WHERE c.page_idx % 7 = 3)
         |SELECT m.url, COALESCE(don.dmd, m.markdown) AS markdown
         |FROM mx m LEFT JOIN don ON don.url = m.url""".stripMargin,
    // miss pages (i%5 != 1) take the raw-HTML fallback, so the expectation is
    // the SELECTOR-branch ground truth (sel_markdown): image variants keep
    // their noscript-unwrapped / lazy-promoted image there
    "crawl_selector_md" ->
      s"""SELECT url,
         |  CASE WHEN page_idx % 5 = 1 THEN '' ELSE title END AS title,
         |  CASE WHEN empty_html = 1 THEN ''
         |       WHEN page_idx % 5 = 1 THEN $tableMdSql
         |       ELSE sel_markdown END AS markdown
         |FROM ${gt("meta")}""".stripMargin,
    "crawl_sink_xml" ->
      s"""$reachCte
         |SELECT m.url,
         |  '<page>' || chr(10) || '  <title>' || m.title || '</title>' || chr(10) ||
         |  '  <url>' || m.url || '</url>' || chr(10) || '  <content>' || chr(10) ||
         |  m.markdown || chr(10) || '  </content>' || chr(10) || '</page>' AS xml
         |FROM seen r JOIN ${gt("meta")} m ON m.url = r.url
         |WHERE m.section = 'articles' AND m.empty_html = 0""".stripMargin,
    "crawl_sink_jsonl" ->
      s"""$reachCte
         |SELECT m.url,
         |  '{"title":"' || ${escSql("m.title")} || '","url":"' || ${escSql("m.url")} ||
         |  '","content":"' || ${escSql("m.markdown")} || '"}' AS jsonl
         |FROM seen r JOIN ${gt("meta")} m ON m.url = r.url
         |WHERE m.section = 'articles' AND m.empty_html = 0""".stripMargin,
    "crawl_sink_json" ->
      s"""WITH items AS (
         |  SELECT '  {' || chr(10) ||
         |         '    "title": "' || ${escSql("title")} || '",' || chr(10) ||
         |         '    "url": "' || ${escSql("url")} || '",' || chr(10) ||
         |         '    "content": "' || ${escSql("markdown")} || '"' || chr(10) ||
         |         '  }' AS item, host_idx, page_idx
         |  FROM ${gt("meta")} WHERE section = 'articles' AND empty_html = 0)
         |SELECT '[' || chr(10) ||
         |       string_agg(item, ',' || chr(10) ORDER BY host_idx, page_idx) ||
         |       chr(10) || ']' AS json_payload
         |FROM items""".stripMargin,
    "crawl_robots_blocked" ->
      s"""SELECT l.src_url, l.dst_url
         |FROM ${gt("links")} l
         |JOIN ${gt("robots")} r
         |  ON l.dst_url LIKE 'http://' || r.host || r.disallow_prefix || '%'""".stripMargin,
    "crawl_host_budget" ->
      s"""SELECT host,
         |  CAST(LEAST(50, SUM(CASE WHEN empty_html = 0 THEN 1 ELSE 0 END)) AS BIGINT) AS saved_cnt
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
    "dd_minhash_pairs" ->
      s"""WITH $dupDocsCte,
         |$shinglesCte,
         |jx AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |    len(list_intersect(a.sh, b.sh)) AS it, len(a.sh) AS la, len(b.sh) AS lb
         |  FROM shx a JOIN shx b ON a.doc_id < b.doc_id)
         |SELECT da AS doc_a, db AS doc_b FROM jx
         |WHERE la + lb - it > 0 AND CAST(it AS DOUBLE) / (la + lb - it) >= 0.8""".stripMargin,
    "dd_ngram_jaccard" ->
      s"""WITH $dupDocsCte,
         |$shinglesCte,
         |pairs AS (
         |  SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id AS doc_a, doc_id + 2000000 AS doc_b FROM documents WHERE doc_id % 10 = 0),
         |jx AS (
         |  SELECT p.doc_a, p.doc_b,
         |    len(list_intersect(a.sh, b.sh)) AS it, len(a.sh) AS la, len(b.sh) AS lb
         |  FROM pairs p
         |  JOIN shx a ON a.doc_id = p.doc_a
         |  JOIN shx b ON b.doc_id = p.doc_b)
         |SELECT doc_a, doc_b,
         |  CAST(floor(CAST(it AS DOUBLE) / (la + lb - it) * 100 + 0.5) AS BIGINT) AS jaccard_pct
         |FROM jx""".stripMargin,
    // exact repeated-span dedup (Lee et al. 2022 at word granularity):
    // 8-token windows over the dup-injected view; the oracle rebuilds the
    // same windows with list slicing (ws[i:i+7] is 1-based inclusive)
    "dd_repeated_ngrams" ->
      s"""WITH $dupDocsCte,
         |toks AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(lower(text), '\\W+'), w -> w <> '') AS ws
         |  FROM dup_docs),
         |win AS (
         |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
         |  FROM toks WHERE len(ws) >= 8),
         |wing AS (
         |  SELECT doc_id, i AS pos, md5(array_to_string(ws[i:i+7], ' ')) AS g FROM win)
         |SELECT g AS gram_md5,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  COUNT(*) AS n_occ,
         |  MIN(doc_id) AS keeper_doc
         |FROM wing GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin,
    // benchmark decontamination: bench grams = window at pos 6 of every
    // doc_id%25==7 doc; a doc is contaminated if any of its windows matches
    "dd_contamination" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(lower(text), '\\W+'), w -> w <> '') AS ws
         |  FROM documents),
         |win AS (
         |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
         |  FROM toks WHERE len(ws) >= 8),
         |wing AS (
         |  SELECT doc_id, i AS pos, md5(array_to_string(ws[i:i+7], ' ')) AS g FROM win),
         |bench AS (SELECT DISTINCT g FROM wing WHERE doc_id % 25 = 7 AND pos = 6)
         |SELECT w.doc_id, CAST(COUNT(DISTINCT w.g) AS BIGINT) AS n_hits
         |FROM wing w JOIN bench b ON b.g = w.g
         |GROUP BY w.doc_id""".stripMargin,
    "dd_span_coverage" ->
      s"""WITH $dupDocsCte,
         |toks AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(lower(text), '\\W+'), w -> w <> '') AS ws
         |  FROM dup_docs),
         |win AS (
         |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
         |  FROM toks WHERE len(ws) >= 8),
         |wing AS (
         |  SELECT doc_id, i AS pos, md5(array_to_string(ws[i:i+7], ' ')) AS g FROM win),
         |rep AS (
         |  SELECT g FROM wing GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2)
         |SELECT w.doc_id,
         |  COUNT(*) AS n_windows,
         |  CAST(SUM(CASE WHEN r.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated
         |FROM wing w LEFT JOIN rep r ON r.g = w.g
         |GROUP BY w.doc_id""".stripMargin,
    "dd_simhash_pairs" ->
      s"""WITH $dupDocsCte,
         |$simhashCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM sigx a JOIN sigx b ON a.doc_id < b.doc_id
         |WHERE hamming(a.s, b.s) <= 3""".stripMargin,
    // connected components over the union of the minhash+simhash pair edges
    // (graft.pipeline.Dedup.dupClusters): hash-min label propagation,
    // iterations unrolled — integer MIN/LEAST are exact in both engines
    "dd_dup_clusters" ->
      (dupClusterCtes +
        s"\nSELECT doc_id, lbl AS keeper_id FROM l${Dedup.ClusterIters}"),
    // the deduplicated corpus: drop every non-keeper cluster member
    "dd_dup_keep" ->
      (dupClusterCtes +
        s"""\nSELECT doc_id FROM dup_docs WHERE doc_id NOT IN (
           |  SELECT doc_id FROM l${Dedup.ClusterIters} WHERE doc_id <> lbl)""".stripMargin),
    // per-source dedup-loss report: injected ids map to their base doc's
    // source by the +1M/+2M offsets; loss rate in exact Q16
    "dd_dup_rate_by_source" ->
      (dupClusterCtes +
        s""",
           |srcs AS (SELECT doc_id AS bid, source FROM documents),
           |dd2 AS (SELECT doc_id,
           |          CASE WHEN doc_id >= 2000000 THEN doc_id - 2000000
           |               WHEN doc_id >= 1000000 THEN doc_id - 1000000
           |               ELSE doc_id END AS bid
           |        FROM dup_docs),
           |losers AS (SELECT doc_id FROM l${Dedup.ClusterIters} WHERE doc_id <> lbl)
           |SELECT s.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(CASE WHEN lo.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_dup_losers,
           |  CAST((SUM(CASE WHEN lo.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 65536)
           |    // COUNT(*) AS BIGINT) AS loser_rate_q16
           |FROM dd2 JOIN srcs s ON s.bid = dd2.bid
           |LEFT JOIN losers lo ON lo.doc_id = dd2.doc_id
           |GROUP BY 1""".stripMargin),
    // convergence audit: every pair edge must have both endpoints on one
    // label after the fixed round budget (graft.pipeline.Dedup
    // .clusterConvergence) — residual measured, not assumed
    "dd_cluster_residual" ->
      (dupClusterCtes +
        s"""\nSELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |  CAST(SUM(CASE WHEN a.lbl <> b.lbl THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_unconverged
           |FROM pe JOIN l${Dedup.ClusterIters} a ON a.doc_id = pe.pa
           |        JOIN l${Dedup.ClusterIters} b ON b.doc_id = pe.pb""".stripMargin),
    "dd_lang_id" ->
      """SELECT doc_id, lang,
        |  CASE WHEN text IS NULL OR text = '' THEN 'und'
        |       WHEN total > 0 AND cjk * 5 >= total THEN 'ja'
        |       WHEN de_cnt > en_cnt THEN 'de'
        |       ELSE 'en' END AS lang_pred
        |FROM (
        |  SELECT doc_id, lang, text,
        |    length(regexp_replace(text, '[^\p{Han}\p{Hiragana}\p{Katakana}]', '', 'g')) AS cjk,
        |    length(regexp_replace(text, '\s', '', 'g')) AS total,
        |    len(list_filter(regexp_split_to_array(lower(text), '\W+'),
        |        w -> w IN ('der','die','das','und','ist','nicht','ein','eine','mit','von','auf','für','dem','den','sich','im'))) AS de_cnt,
        |    len(list_filter(regexp_split_to_array(lower(text), '\W+'),
        |        w -> w IN ('the','and','is','of','to','a','in','that','it','was','for','on','with','as','this'))) AS en_cnt
        |  FROM documents)""".stripMargin,
    "dd_fingerprint" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(generate_series(1, length(text)-4)) AS i
        |  FROM documents WHERE length(text) >= 5),
        |g AS (
        |  SELECT doc_id, CAST((i-1)//16 AS BIGINT) AS band, min(md5(substr(text, i, 5))) AS mh
        |  FROM pos GROUP BY 1, 2),
        |d AS (
        |  SELECT doc_id, band, mh, lag(mh) OVER (PARTITION BY doc_id ORDER BY band) AS prev
        |  FROM g)
        |SELECT doc_id, band, mh AS gram_md5 FROM d WHERE prev IS NULL OR mh <> prev""".stripMargin,
    "ann_lsh_topk" ->
      s"""WITH ex AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sig AS (SELECT vec_id, v, $lshSigExpr AS s FROM ex),
         |q AS (SELECT vec_id AS qid, v AS qv, s AS qs FROM sig ORDER BY vec_id LIMIT 20),
         |cand AS (
         |  SELECT q.qid, e2.vec_id AS nid, list_cosine_similarity(q.qv, e2.v) AS c
         |  FROM q JOIN sig e2 ON e2.vec_id <> q.qid AND hamming(q.qs, e2.s) <= 1)
         |SELECT query_id, rank, neighbor_id FROM (
         |  SELECT qid AS query_id, nid AS neighbor_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS BIGINT) AS rank
         |  FROM cand)
         |WHERE rank <= 10""".stripMargin,
    "ann_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < ${graft.pipeline.Similarity.IvfLists}),
         |d AS (SELECT e.vec_id, e.v, c.cid,
         |        list_cosine_similarity(c.cv, e.v) AS s FROM e CROSS JOIN c),
         |asg AS (SELECT vec_id, v, cid FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM d)
         |  WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e ORDER BY vec_id LIMIT 20),
         |qp AS (SELECT qid, qv, cid FROM (
         |  SELECT q.qid, q.qv, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY q.qid
         |      ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cid) AS rn
         |  FROM q CROSS JOIN c) WHERE rn <= ${graft.pipeline.Similarity.IvfProbes}),
         |cand AS (
         |  SELECT p.qid, a.vec_id AS nid, list_cosine_similarity(p.qv, a.v) AS cos
         |  FROM qp p JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.qid)
         |SELECT query_id, rank, neighbor_id FROM (
         |  SELECT qid AS query_id, nid AS neighbor_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS BIGINT) AS rank
         |  FROM cand)
         |WHERE rank <= 10""".stripMargin,
    "ann_ivf_kmeans_topk" ->
      s"""WITH $ivfKmeansCtes,
         |af AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT e.vec_id, e.v, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(c.m, CAST(e.q AS DOUBLE[])) DESC, c.cid) AS rn
         |    FROM e CROSS JOIN c${graft.pipeline.Similarity.KmeansIters} c) WHERE rn = 1),
         |qx AS (SELECT vec_id AS qid, v AS qv, q AS qq FROM e ORDER BY vec_id LIMIT 20),
         |qp AS (SELECT qid, qv, cid FROM (
         |  SELECT q.qid, q.qv, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY q.qid
         |      ORDER BY list_cosine_similarity(c.m, CAST(q.qq AS DOUBLE[])) DESC, c.cid) AS rn
         |  FROM qx q CROSS JOIN c${graft.pipeline.Similarity.KmeansIters} c)
         |  WHERE rn <= ${graft.pipeline.Similarity.IvfProbes}),
         |cand AS (
         |  SELECT p.qid, a.vec_id AS nid, list_cosine_similarity(p.qv, a.v) AS cos
         |  FROM qp p JOIN af a ON a.cid = p.cid AND a.vec_id <> p.qid)
         |SELECT query_id, rank, neighbor_id FROM (
         |  SELECT qid AS query_id, nid AS neighbor_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS BIGINT) AS rank
         |  FROM cand)
         |WHERE rank <= 10""".stripMargin,
    // recall audit: each approximate path's top-10 intersected with the
    // exact top-10, per query — reuses the already-proven per-method CTE
    // shapes over ONE shared embeddings CTE (the kmeans chain's `e`)
    "ann_recall" -> {
      import graft.pipeline.Similarity
      val lists = Similarity.IvfLists
      val probes = Similarity.IvfProbes
      val cK = s"c${Similarity.KmeansIters}"
      s"""WITH $ivfKmeansCtes,
         |bfc AS (
         |  SELECT q.qid, e2.vec_id AS nid, list_cosine_similarity(q.qv, e2.v) AS cos
         |  FROM (SELECT vec_id AS qid, v AS qv FROM e ORDER BY vec_id LIMIT 20) q
         |  JOIN e e2 ON e2.vec_id <> q.qid),
         |bf AS (SELECT qid, nid FROM (
         |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
         |  FROM bfc) WHERE rn <= 10),
         |sg AS (SELECT vec_id, v, $lshSigExpr AS s FROM e),
         |lq AS (SELECT vec_id AS qid, v AS qv, s AS qs FROM sg ORDER BY vec_id LIMIT 20),
         |lc AS (
         |  SELECT lq.qid, e2.vec_id AS nid, list_cosine_similarity(lq.qv, e2.v) AS cos
         |  FROM lq JOIN sg e2 ON e2.vec_id <> lq.qid AND hamming(lq.qs, e2.s) <= 1),
         |lsh AS (SELECT qid, nid FROM (
         |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
         |  FROM lc) WHERE rn <= 10),
         |ic AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $lists),
         |iasg AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(c.cv, e.v) DESC, c.cid) AS rn
         |  FROM e CROSS JOIN ic c) WHERE rn = 1),
         |iq AS (SELECT vec_id AS qid, v AS qv FROM e ORDER BY vec_id LIMIT 20),
         |iqp AS (SELECT qid, qv, cid FROM (
         |  SELECT q.qid, q.qv, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY q.qid
         |      ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cid) AS rn
         |  FROM iq q CROSS JOIN ic c) WHERE rn <= $probes),
         |icand AS (
         |  SELECT p.qid, a.vec_id AS nid, list_cosine_similarity(p.qv, a.v) AS cos
         |  FROM iqp p JOIN iasg a ON a.cid = p.cid AND a.vec_id <> p.qid),
         |ivf AS (SELECT qid, nid FROM (
         |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
         |  FROM icand) WHERE rn <= 10),
         |af AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(c.m, CAST(e.q AS DOUBLE[])) DESC, c.cid) AS rn
         |  FROM e CROSS JOIN $cK c) WHERE rn = 1),
         |kqx AS (SELECT vec_id AS qid, v AS qv, q AS qq FROM e ORDER BY vec_id LIMIT 20),
         |kqp AS (SELECT qid, qv, cid FROM (
         |  SELECT q.qid, q.qv, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY q.qid
         |      ORDER BY list_cosine_similarity(c.m, CAST(q.qq AS DOUBLE[])) DESC, c.cid) AS rn
         |  FROM kqx q CROSS JOIN $cK c) WHERE rn <= $probes),
         |kcand AS (
         |  SELECT p.qid, a.vec_id AS nid, list_cosine_similarity(p.qv, a.v) AS cos
         |  FROM kqp p JOIN af a ON a.cid = p.cid AND a.vec_id <> p.qid),
         |km AS (SELECT qid, nid FROM (
         |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
         |  FROM kcand) WHERE rn <= 10),
         |$pqCtes,
         |pq AS (SELECT qid, nid FROM (
         |  SELECT qid, vec_id AS nid, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY dist ASC, vec_id ASC) AS rn
         |  FROM pqsc) WHERE rn <= 10)
         |SELECT b.qid AS query_id,
         |  CAST(COALESCE(lh.n, 0) AS BIGINT) AS lsh_hits,
         |  CAST(COALESCE(ih.n, 0) AS BIGINT) AS ivf_hits,
         |  CAST(COALESCE(kh.n, 0) AS BIGINT) AS ivf_kmeans_hits,
         |  CAST(COALESCE(ph.n, 0) AS BIGINT) AS pq_hits
         |FROM (SELECT DISTINCT qid FROM bf) b
         |LEFT JOIN (SELECT l.qid, COUNT(*) AS n FROM lsh l
         |  JOIN bf ON bf.qid = l.qid AND bf.nid = l.nid GROUP BY 1) lh ON lh.qid = b.qid
         |LEFT JOIN (SELECT i.qid, COUNT(*) AS n FROM ivf i
         |  JOIN bf ON bf.qid = i.qid AND bf.nid = i.nid GROUP BY 1) ih ON ih.qid = b.qid
         |LEFT JOIN (SELECT k.qid, COUNT(*) AS n FROM km k
         |  JOIN bf ON bf.qid = k.qid AND bf.nid = k.nid GROUP BY 1) kh ON kh.qid = b.qid
         |LEFT JOIN (SELECT p.qid, COUNT(*) AS n FROM pq p
         |  JOIN bf ON bf.qid = p.qid AND bf.nid = p.nid GROUP BY 1) ph ON ph.qid = b.qid""".stripMargin
    },
    // the planted-cluster counterpart of ann_recall's lsh_hits: identical
    // LSH kernel, vectors regenerated with planted centroid structure
    // (Similarity.plantedEmb) — centroid matrix interpolated as exact
    // double literals; centroid+jitter are dyadic rationals (denominator
    // 1024) so float32 storage on the Spark side is lossless and both
    // engines score identical doubles
    "ann_recall_planted" -> {
      import graft.pipeline.Similarity
      s"""WITH pl AS (
         |  SELECT vec_id,
         |    list_transform(generate_series(0, ${Similarity.EmbDims - 1}), d ->
         |      ${Similarity.plantedCentroidSqlList}[vec_id % ${Similarity.PlantedClusters} + 1][d + 1]
         |      + (CAST((vec_id * 37 + d * 11) % 13 AS DOUBLE) - 6) / 1024.0) AS v
         |  FROM embeddings),
         |sg AS (SELECT vec_id, v, $lshSigExpr AS s FROM pl),
         |q AS (SELECT vec_id AS qid, v AS qv, s AS qs FROM sg ORDER BY vec_id LIMIT 20),
         |bfc AS (
         |  SELECT q.qid, p.vec_id AS nid, list_cosine_similarity(q.qv, p.v) AS cos
         |  FROM q JOIN pl p ON p.vec_id <> q.qid),
         |bf AS (SELECT qid, nid FROM (
         |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
         |  FROM bfc) WHERE rn <= 10),
         |lc AS (
         |  SELECT q.qid, e2.vec_id AS nid, list_cosine_similarity(q.qv, e2.v) AS cos
         |  FROM q JOIN sg e2 ON e2.vec_id <> q.qid AND hamming(q.qs, e2.s) <= 1),
         |lsh AS (SELECT qid, nid FROM (
         |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
         |  FROM lc) WHERE rn <= 10)
         |SELECT b.qid AS query_id, CAST(COALESCE(lh.n, 0) AS BIGINT) AS lsh_hits
         |FROM (SELECT DISTINCT qid FROM bf) b
         |LEFT JOIN (SELECT l.qid, COUNT(*) AS n FROM lsh l
         |  JOIN bf ON bf.qid = l.qid AND bf.nid = l.nid GROUP BY 1) lh ON lh.qid = b.qid""".stripMargin
    },
    "ann_dup_pairs" ->
      s"""WITH $dupEmbCte,
         |sig AS (SELECT vec_id, v, $lshSigExpr AS s FROM dup_emb)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |FROM sig a JOIN sig b ON a.vec_id < b.vec_id AND hamming(a.s, b.s) <= 2
         |WHERE list_cosine_similarity(a.v, b.v) >= 0.95""".stripMargin,
    // SemDeDup: the dup-injected embeddings k-means-clustered by the
    // unrolled exact-integer Lloyd CTEs, final assignment vs c<iters>,
    // then the within-cluster lower-id dominance rule — pairs are only
    // ever compared inside a cluster, exactly like the engine
    "dd_semdedup" -> {
      import graft.pipeline.Similarity
      s"""WITH $semKmeansCtes,
         |af AS (
         |  SELECT vec_id, q, cid FROM (
         |    SELECT e.vec_id, e.q, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(c.m, CAST(e.q AS DOUBLE[])) DESC, c.cid) AS rn
         |    FROM e CROSS JOIN c${Similarity.KmeansIters} c) WHERE rn = 1)
         |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
         |  CAST(CASE WHEN EXISTS (
         |    SELECT 1 FROM af b WHERE b.cid = a.cid AND b.vec_id < a.vec_id
         |      AND list_cosine_similarity(CAST(b.q AS DOUBLE[]), CAST(a.q AS DOUBLE[])) >= 0.95)
         |  THEN 0 ELSE 1 END AS BIGINT) AS kept
         |FROM af a""".stripMargin
    },
    // mirror detection: source pairs sharing exact texts over the
    // mirror-injected view — (md5 → source) index join, no pairwise sources
    "dd_source_overlap" ->
      """WITH allsrc AS (
        |  SELECT md5(text) AS h, source FROM documents
        |  UNION ALL
        |  SELECT md5(text) AS h, 'mirror' || source AS source
        |  FROM documents WHERE doc_id % 3 = 0),
        |per AS (SELECT source, CAST(COUNT(DISTINCT h) AS BIGINT) AS n FROM allsrc GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(COUNT(DISTINCT a.h) AS BIGINT) AS n_shared
        |  FROM allsrc a JOIN allsrc b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT p.source_a, p.source_b, p.n_shared, pa.n AS n_a, pb.n AS n_b
        |FROM pairs p
        |JOIN per pa ON pa.source = p.source_a
        |JOIN per pb ON pb.source = p.source_b""".stripMargin,
    // CCNet line-level dedup over the line-structured view: first-wins is
    // the integer MIN over doc_id*8+line_no, replayed term-for-term
    "dd_line_dedup" ->
      s"""WITH ld AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN
         |      '${Dedup.LineBoiler}' || chr(10) ||
         |      array_to_string(ws[1:5], ' ') || chr(10) ||
         |      '${Dedup.LineBoiler3}' || chr(10) ||
         |      array_to_string(ws[6:10], ' ')
         |    ELSE
         |      '${Dedup.LineBoiler}' || chr(10) ||
         |      array_to_string(ws[1:5], ' ') || chr(10) ||
         |      array_to_string(ws[6:10], ' ')
         |    END AS text
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
         |l AS (
         |  SELECT doc_id, p[2] - 1 AS line_no, p[1] AS line
         |  FROM (SELECT doc_id, unnest(list_zip(ls, generate_series(1, len(ls)))) AS p
         |        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM ld))),
         |w AS (SELECT line, MIN(doc_id * 8 + line_no) AS ord FROM l GROUP BY line),
         |f AS (SELECT l.doc_id, l.line_no, l.line,
         |        CASE WHEN l.doc_id * 8 + l.line_no = w.ord THEN 1 ELSE 0 END AS kept
         |      FROM l JOIN w ON w.line = l.line)
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(SUM(kept) AS BIGINT) AS n_kept,
         |  COALESCE(string_agg(CASE WHEN kept = 1 THEN line END, chr(10) ORDER BY line_no), '')
         |    AS cleaned
         |FROM f GROUP BY doc_id""".stripMargin,
    // deterministic output sharding of the manifest: shard = md5-hex
    // prefix of the doc id mod NumShards (stateless, any worker computes
    // any doc's shard) — the per-shard balance report
    "dd_shard_manifest" ->
      (dupClusterCtes + ",\n" +
        s"""$gopherCtes,
           |mani AS (
           |  SELECT c.doc_id,
           |    CASE WHEN trim(d.text) = '' THEN CAST(0 AS BIGINT)
           |         ELSE CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT)
           |    END AS n_tokens
           |  FROM gcnt c JOIN documents d ON d.doc_id = c.doc_id
           |  WHERE ($gopherPassCond)
           |    AND c.doc_id NOT IN (
           |      SELECT doc_id FROM l${Dedup.ClusterIters} WHERE doc_id <> lbl)),
           |hx AS (SELECT i, format('{:02x}', i) AS h FROM range(256) t(i)),
           |shd AS (SELECT m.doc_id, m.n_tokens,
           |          hx.i % ${Dedup.NumShards} AS shard
           |        FROM mani m
           |        JOIN hx ON substr(md5(CAST(m.doc_id AS VARCHAR)), 1, 2) = hx.h)
           |SELECT CAST(shard AS BIGINT) AS shard,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
           |FROM shd GROUP BY 1""".stripMargin),
    // count-min sketch audit: d*w counter cells built in one pass over the
    // link stream; a deterministic ~3% key sample gets exact counts beside
    // the min-of-d estimates (the sketch guarantee est >= exact and the
    // collision overestimate both land in the output)
    "dd_cms_est" -> {
      import graft.pipeline.CountMin.{CmsRows, CmsW, SampleMod}
      s"""WITH occ AS (SELECT dst_url FROM ${gt("xlinks")}),
         |rr AS (SELECT unnest(generate_series(0, ${CmsRows - 1})) AS r),
         |cms AS (
         |  SELECT r,
         |    ('0x' || substr(md5('cms' || r || ':' || dst_url), 1, 14))::BIGINT
         |      % $CmsW AS b,
         |    COUNT(*) AS cnt
         |  FROM occ CROSS JOIN rr GROUP BY 1, 2),
         |samp AS (
         |  SELECT dst_url, CAST(COUNT(*) AS BIGINT) AS exact_cnt
         |  FROM occ
         |  WHERE ('0x' || substr(md5(dst_url), 1, 14))::BIGINT % $SampleMod = 0
         |  GROUP BY 1),
         |pr AS (
         |  SELECT s.dst_url, s.exact_cnt, rr.r,
         |    ('0x' || substr(md5('cms' || rr.r || ':' || s.dst_url), 1, 14))::BIGINT
         |      % $CmsW AS b
         |  FROM samp s CROSS JOIN rr)
         |SELECT pr.dst_url AS url, pr.exact_cnt,
         |  CAST(MIN(c.cnt) AS BIGINT) AS cms_est
         |FROM pr JOIN cms c ON c.r = pr.r AND c.b = pr.b
         |GROUP BY 1, 2""".stripMargin
    },
    // the end-to-end filter funnel: five proven gate chains composed in
    // curation order (gopher -> dup losers -> decontam -> NB classifier ->
    // perplexity tail), one count row per stage — the whole curation
    // pipeline's dataflow in a single query
    "dd_filter_funnel" ->
      (dupClusterCtes + ",\n" +
        s"""$gopherCtes,
           |$lmScoreCtes,
           |$lmBucketCtes,
           |$nbCtes,
           |fs1 AS (SELECT doc_id FROM gcnt WHERE $gopherPassCond),
           |flos AS (SELECT doc_id FROM l${Dedup.ClusterIters} WHERE doc_id <> lbl),
           |fs2 AS (SELECT doc_id FROM fs1
           |        WHERE doc_id NOT IN (SELECT doc_id FROM flos)),
           |ctoks AS (
           |  SELECT doc_id,
           |    list_filter(regexp_split_to_array(lower(text), '\\W+'), w -> w <> '') AS ws
           |  FROM documents),
           |cwin AS (
           |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
           |  FROM ctoks WHERE len(ws) >= 8),
           |cwing AS (
           |  SELECT doc_id, i AS pos, md5(array_to_string(ws[i:i+7], ' ')) AS g
           |  FROM cwin),
           |cbench AS (SELECT DISTINCT g FROM cwing WHERE doc_id % 25 = 7 AND pos = 6),
           |fcont AS (SELECT DISTINCT w.doc_id FROM cwing w
           |          JOIN cbench b ON b.g = w.g),
           |fs3 AS (SELECT doc_id FROM fs2
           |        WHERE doc_id NOT IN (SELECT doc_id FROM fcont)),
           |fnbp AS (SELECT d.doc_id FROM documents d
           |         LEFT JOIN nb_sc ON nb_sc.doc_id = d.doc_id
           |         WHERE COALESCE(nb_sc.s, 0) + (SELECT b FROM nb_bs) >= 0),
           |fs4 AS (SELECT doc_id FROM fs3
           |        WHERE doc_id IN (SELECT doc_id FROM fnbp)),
           |ftail AS (SELECT doc_id FROM rk WHERE lang_rank * 3 > n_lang * 2),
           |fs5 AS (SELECT doc_id FROM fs4
           |        WHERE doc_id NOT IN (SELECT doc_id FROM ftail)),
           |cnts(stage_no, stage, n_in, n_out) AS (
           |  SELECT 1, 'gopher', (SELECT COUNT(*) FROM documents),
           |    (SELECT COUNT(*) FROM fs1)
           |  UNION ALL SELECT 2, 'dedup', (SELECT COUNT(*) FROM fs1),
           |    (SELECT COUNT(*) FROM fs2)
           |  UNION ALL SELECT 3, 'decontam', (SELECT COUNT(*) FROM fs2),
           |    (SELECT COUNT(*) FROM fs3)
           |  UNION ALL SELECT 4, 'nb_quality', (SELECT COUNT(*) FROM fs3),
           |    (SELECT COUNT(*) FROM fs4)
           |  UNION ALL SELECT 5, 'ppl_tail', (SELECT COUNT(*) FROM fs4),
           |    (SELECT COUNT(*) FROM fs5))
           |SELECT CAST(stage_no AS BIGINT) AS stage_no, stage,
           |  CAST(n_in AS BIGINT) AS n_in,
           |  CAST(n_in - n_out AS BIGINT) AS n_dropped,
           |  CAST(n_out AS BIGINT) AS n_out
           |FROM cnts""".stripMargin),
    // source-scoped boilerplate detection over the injected view
    // (Dedup.bpDocs): footer 100%, rights ~50% (hash-split — per-source
    // counts straddle the threshold), subscribe ~33%; a line shared by >= 2 docs is
    // boilerplate when 2*n_docs >= the source's doc count
    "dd_source_boilerplate" ->
      s"""WITH $bpCtes
         |SELECT pl.source, pl.line, CAST(pl.n_docs AS BIGINT) AS n_docs,
         |  CAST(CASE WHEN 2 * pl.n_docs >= tt.n_total THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_boilerplate
         |FROM pl JOIN tt ON tt.source = pl.source
         |WHERE pl.n_docs >= 2""".stripMargin,
    // boilerplate removal: re-join every doc without its source's
    // boilerplate lines, counting the drops
    "dd_boilerplate_clean" ->
      s"""WITH $bpCtes,
         |bpl AS (SELECT pl.source, pl.line
         |        FROM pl JOIN tt ON tt.source = pl.source
         |        WHERE pl.n_docs >= 2 AND 2 * pl.n_docs >= tt.n_total),
         |sel AS (SELECT l2.doc_id, l2.line_no, l2.line,
         |          CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END AS isbp
         |        FROM l2 LEFT JOIN bpl b
         |          ON b.source = l2.source AND b.line = l2.line)
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(SUM(isbp) AS BIGINT) AS n_removed,
         |  COALESCE(string_agg(CASE WHEN isbp = 0 THEN line END, chr(10)
         |    ORDER BY line_no), '') AS cleaned
         |FROM sel GROUP BY doc_id""".stripMargin,
    // engine decodes the opaque payload bytes (from-scratch BMP/WAV
    // parsers); oracle reads the features the generator computed while
    // ENCODING them — a decode bug cannot self-confirm
    "mm_blob_features" ->
      s"""SELECT blob_id, kind, width, height, sum_r, sum_g, sum_b,
         |  sample_rate, n_samples, amp_sum, n_bytes
         |FROM ${gt("blob_meta")}""".stripMargin,
    // host-graph analytics over the multi-host link graph
    "graph_host_edges" ->
      s"""SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
         |  regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host,
         |  COUNT(*) AS n_links
         |FROM ${gt("xlinks")} GROUP BY 1, 2""".stripMargin,
    // anchor-text extraction parity: the engine re-derives (src, dst, pos,
    // first-anchor text) from raw HTML; the oracle reads the encode-side
    // ground truth (document-order first-wins is pinned by the corpus's
    // nav-"Home"-before-"Link 0" and "Link 0 again" duplicates)
    "graph_anchor_text" ->
      s"""SELECT src_url, dst_url, CAST(pos AS BIGINT) AS pos, anchor_text
         |FROM ${gt("xlinks")}""".stripMargin,
    // the classic in-link anchor index: what the web calls each dst page
    "graph_anchor_index" ->
      s"""SELECT dst_url, anchor_text, COUNT(DISTINCT src_url) AS n_srcs
         |FROM ${gt("xlinks")} GROUP BY 1, 2""".stripMargin,
    // trap-gated BFS: seen = min-depth reachability over the link graph
    // with edges into each host's most-minted template removed (the mined
    // blocklist the engine's kernel gate consumed)
    "crawl_trap_gated" ->
      s"""WITH RECURSIVE tmt AS (
         |  SELECT regexp_extract(dst_url, '^https?://([^/]+)', 1) AS h,
         |    regexp_replace(regexp_extract(dst_url, '^https?://[^/]+(.*)${"$"}', 1),
         |      '[0-9]+', 'N', 'g') AS t,
         |    COUNT(DISTINCT dst_url) AS n
         |  FROM ${gt("xlinks")} GROUP BY 1, 2),
         |blk AS MATERIALIZED (
         |  SELECT h, t FROM (
         |    SELECT h, t, ROW_NUMBER() OVER (PARTITION BY h
         |      ORDER BY n DESC, t) AS rn FROM tmt)
         |  WHERE rn = 1),
         |el AS MATERIALIZED (
         |  SELECT l.src_url, l.dst_url FROM ${gt("links")} l
         |  WHERE NOT EXISTS (SELECT 1 FROM blk
         |    WHERE blk.h = regexp_extract(l.dst_url, '^https?://([^/]+)', 1)
         |      AND blk.t = regexp_replace(
         |        regexp_extract(l.dst_url, '^https?://[^/]+(.*)${"$"}', 1),
         |        '[0-9]+', 'N', 'g'))),
         |reach(url, depth) AS (
         |  SELECT CAST('http://host0.test/' AS VARCHAR) AS url, 0 AS depth
         |  UNION
         |  SELECT e.dst_url, r.depth + 1
         |  FROM reach r JOIN el e ON e.src_url = r.url
         |  WHERE r.depth < 64
         |), seen AS (SELECT url, MIN(depth) AS depth FROM reach GROUP BY url)
         |SELECT url, CAST(depth AS BIGINT) AS depth FROM seen""".stripMargin,
    // crawler-trap template mining: digit runs in the path collapse to N,
    // distinct-url counts per (host, template), flag at the threshold
    "crawl_url_templates" ->
      s"""SELECT regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host,
         |  regexp_replace(regexp_extract(dst_url, '^https?://[^/]+(.*)${"$"}', 1),
         |    '[0-9]+', 'N', 'g') AS path_template,
         |  CAST(COUNT(DISTINCT dst_url) AS BIGINT) AS n_urls,
         |  COUNT(*) AS n_links,
         |  CAST(CASE WHEN COUNT(DISTINCT dst_url) >= ${graft.queries.CrawlQueries.TrapThreshold}
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_trap
         |FROM ${gt("xlinks")} GROUP BY 1, 2""".stripMargin,
    // HITS hubs/authorities, iterations unrolled with SUM-normalization as
    // exact integer floors (auth from previous hub, hub from the NEW auth —
    // Kleinberg's sequential update, mirroring HostGraph.hostHits);
    // MATERIALIZED stops DuckDB's CTE inlining from exponentiating the tree
    "graph_host_hits" -> {
      val scale = graft.pipeline.HostGraph.PrScale
      val iters = graft.pipeline.HostGraph.HitsIters
      val head =
        s"""WITH x AS (SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS s,
           |  regexp_extract(dst_url, '^https?://([^/]+)', 1) AS d FROM ${gt("xlinks")}),
           |e AS MATERIALIZED (SELECT s, d, COUNT(*) AS w FROM x GROUP BY 1, 2),
           |hosts AS MATERIALIZED (
           |  SELECT DISTINCT h FROM (SELECT s AS h FROM e UNION SELECT d FROM e)),
           |hb0 AS (SELECT h, CAST($scale AS BIGINT) AS hub FROM hosts)""".stripMargin
      val steps = (1 to iters).map { k =>
        s"""ar$k AS MATERIALIZED (
           |  SELECT e.d, SUM(p.hub * e.w) AS m
           |  FROM e JOIN hb${k - 1} p ON p.h = e.s GROUP BY e.d),
           |au$k AS MATERIALIZED (
           |  SELECT hosts.h,
           |    CAST((COALESCE(ar.m, 0) * $scale) // (SELECT SUM(m) FROM ar$k) AS BIGINT) AS auth
           |  FROM hosts LEFT JOIN ar$k ar ON ar.d = hosts.h),
           |hr$k AS MATERIALIZED (
           |  SELECT e.s, SUM(a.auth * e.w) AS m
           |  FROM e JOIN au$k a ON a.h = e.d GROUP BY e.s),
           |hb$k AS MATERIALIZED (
           |  SELECT hosts.h,
           |    CAST((COALESCE(hr.m, 0) * $scale) // (SELECT SUM(m) FROM hr$k) AS BIGINT) AS hub
           |  FROM hosts LEFT JOIN hr$k hr ON hr.s = hosts.h)""".stripMargin
      }.mkString(",\n")
      s"""$head,
         |$steps
         |SELECT hb.h AS host, hb.hub AS hub_q, au.auth AS auth_q
         |FROM hb$iters hb JOIN au$iters au ON au.h = hb.h""".stripMargin
    },
    // KMV distinct-url sketch per dst host: k smallest distinct 56-bit
    // md5-prefix hashes, estimate (k-1)*2^56 // h_(k) — order statistics of
    // a fixed hash set, so DuckDB replays the estimator bit-for-bit
    "graph_host_distinct_kmv" -> {
      import graft.pipeline.HostGraph.{KmvK, KmvM}
      s"""WITH u AS (
         |  SELECT DISTINCT regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host,
         |    dst_url
         |  FROM ${gt("xlinks")}),
         |hv AS (SELECT DISTINCT dst_host,
         |         ('0x' || substr(md5(dst_url), 1, 14))::BIGINT AS hv FROM u),
         |rk AS (SELECT dst_host, hv,
         |         ROW_NUMBER() OVER (PARTITION BY dst_host ORDER BY hv) AS rn FROM hv),
         |nh AS (SELECT dst_host, CAST(COUNT(*) AS BIGINT) AS nh FROM hv GROUP BY 1),
         |ex AS (SELECT dst_host, CAST(COUNT(*) AS BIGINT) AS exact_distinct
         |       FROM u GROUP BY 1),
         |kth AS (SELECT dst_host, hv AS hk FROM rk WHERE rn = $KmvK)
         |SELECT ex.dst_host, ex.exact_distinct,
         |  CAST(LEAST(nh.nh, $KmvK) AS BIGINT) AS n_mins,
         |  CAST(CASE WHEN nh.nh < $KmvK THEN nh.nh
         |       ELSE ${(KmvK - 1) * KmvM} // kth.hk END AS BIGINT) AS kmv_est
         |FROM ex JOIN nh ON nh.dst_host = ex.dst_host
         |LEFT JOIN kth ON kth.dst_host = ex.dst_host""".stripMargin
    },
    // fixed-point integer PageRank, iterations unrolled — integer sums and
    // floor divisions are exact in both engines (k-means-oracle pattern)
    "graph_host_pagerank" ->
      s"""WITH $pagerankCteBody
         |SELECT h AS host, pr FROM p${graft.pipeline.HostGraph.PageRankIters}""".stripMargin,
    // personalized PageRank: the whole teleport mass and the dangling mass
    // land on the seed host; iterations unrolled in exact integers
    "graph_host_ppr" -> {
      val iters = graft.pipeline.HostGraph.PageRankIters
      val scale = graft.pipeline.HostGraph.PrScale
      val seed = graft.pipeline.HostGraph.PprSeedHost
      val head =
        s"""x AS (SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS s,
           |  regexp_extract(dst_url, '^https?://([^/]+)', 1) AS d FROM ${gt("xlinks")}),
           |e AS (SELECT s, d, COUNT(*) AS w FROM x GROUP BY 1, 2),
           |hosts AS (SELECT DISTINCT h FROM (SELECT s AS h FROM e UNION SELECT d FROM e)),
           |outw AS (SELECT s, SUM(w) AS ow FROM e GROUP BY s),
           |nh AS (SELECT COUNT(*) AS n FROM hosts),
           |pp0 AS (SELECT h, CAST($scale AS BIGINT) AS pr FROM hosts)""".stripMargin
      val steps = (1 to iters).map { k =>
        s"""cp$k AS (
           |  SELECT e.d, SUM((p.pr * e.w) // o.ow) AS m
           |  FROM e JOIN pp${k - 1} p ON p.h = e.s JOIN outw o ON o.s = e.s GROUP BY e.d),
           |dmp$k AS (
           |  SELECT COALESCE(SUM(pr), 0) AS dm FROM pp${k - 1}
           |  WHERE h NOT IN (SELECT s FROM outw)),
           |pp$k AS (
           |  SELECT h.h, CAST(
           |      (CASE WHEN h.h = '$seed' THEN ${15L * scale / 100} * nh.n ELSE 0 END)
           |      + (85 * (COALESCE(c.m, 0)
           |          + CASE WHEN h.h = '$seed' THEN dm.dm ELSE 0 END)) // 100
           |    AS BIGINT) AS pr
           |  FROM hosts h LEFT JOIN cp$k c ON c.d = h.h
           |  CROSS JOIN dmp$k dm CROSS JOIN nh)""".stripMargin
      }
      s"""WITH ${(head +: steps).mkString(",\n")}
         |SELECT h AS host, pr FROM pp$iters""".stripMargin
    },
    // best-first frontier scheduling: priorities from the pagerank CTEs,
    // rounds unrolled — pop top-P by (pr desc, url), enqueue-time seen
    "crawl_priority_frontier" -> {
      import graft.crawl.PriorityCrawl.{Rounds, PopPerRound}
      val prIters = graft.pipeline.HostGraph.PageRankIters
      val hostRe = "'^https?://([^/]+)'"
      // every per-round CTE is referenced 2-3× by the next round; without
      // MATERIALIZED DuckDB inlines each reference and the tree grows
      // exponentially in Rounds (the dupClusterCtes lesson)
      val head =
        s"""prh AS MATERIALIZED (SELECT h AS host, pr FROM p$prIters),
           |seeds AS (SELECT url FROM ${gt("pages")}
           |          WHERE regexp_matches(url, '^https?://[^/]+/$$')),
           |f0 AS MATERIALIZED (SELECT s.url, COALESCE(p.pr, 0) AS pr FROM seeds s
           |       LEFT JOIN prh p ON p.host = regexp_extract(s.url, $hostRe, 1)),
           |seen0 AS MATERIALIZED (SELECT url FROM seeds)""".stripMargin
      val steps = (1 to Rounds).map { i =>
        s"""pop$i AS MATERIALIZED (
           |  SELECT url, pr, rn AS rank FROM (
           |    SELECT url, pr, ROW_NUMBER() OVER (ORDER BY pr DESC, url) AS rn
           |    FROM f${i - 1}) WHERE rn <= $PopPerRound),
           |new$i AS MATERIALIZED (
           |  SELECT DISTINCT x.dst_url AS url FROM ${gt("xlinks")} x
           |  JOIN pop$i p ON x.src_url = p.url
           |  WHERE x.dst_url NOT IN (SELECT url FROM seen${i - 1})),
           |f$i AS MATERIALIZED (
           |  SELECT f.url, f.pr FROM f${i - 1} f
           |  WHERE f.url NOT IN (SELECT url FROM pop$i)
           |  UNION ALL
           |  SELECT n.url, COALESCE(p.pr, 0) FROM new$i n
           |  LEFT JOIN prh p ON p.host = regexp_extract(n.url, $hostRe, 1)),
           |seen$i AS MATERIALIZED (SELECT url FROM seen${i - 1} UNION ALL SELECT url FROM new$i)""".stripMargin
      }
      val out = (1 to Rounds).map(i =>
        s"SELECT CAST($i AS BIGINT) AS round, CAST(rank AS BIGINT) AS rank, url FROM pop$i")
        .mkString("\nUNION ALL\n")
      s"WITH $pagerankCteBody,\n$head,\n${steps.mkString(",\n")}\n$out"
    },
    // resize / frame-sample: the engine's strided decode vs the transforms
    // the generator computed while encoding
    "mm_blob_transform" ->
      s"""SELECT blob_id, kind, rs_width, rs_height, rs_sum_r, rs_sum_g, rs_sum_b,
         |  fs_n_samples, fs_amp_sum
         |FROM ${gt("blob_meta")}""".stripMargin,
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
    "dd_bpe_merges" -> {
      val k = Bpe.NumMerges
      s"""WITH $bpeCtes
         |SELECT * FROM (
         |${(1 to k).map(j =>
             s"  SELECT CAST($j AS BIGINT) AS step, a AS sym_a, b AS sym_b FROM b$j")
             .mkString("\n  UNION ALL\n")}
         |)""".stripMargin
    },
    "dd_bpe_token_count" -> {
      val k = Bpe.NumMerges
      s"""WITH $bpeCtes,
         |tok AS (
         |  SELECT w, CAST(strlen(s) - strlen(replace(s, '(', '')) AS BIGINT) AS nt
         |  FROM s$k),
         |dw AS (
         |  SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')) AS w
         |  FROM documents),
         |ag AS (SELECT dw.doc_id, SUM(t.nt) AS n FROM dw JOIN tok t ON t.w = dw.w GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_bpe_tokens
         |FROM documents d LEFT JOIN ag a ON a.doc_id = d.doc_id""".stripMargin
    },
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
    // the documented Gopher rules (Rae et al. 2021 §A) — integer counters,
    // thresholds as integer cross-multiplications (mirrors
    // TextAnalysis.qualityGopher exactly; no float ratio compared)
    "dd_quality_gopher" ->
      s"""WITH $gopherCtes
         |SELECT doc_id, n_words, word_bytes, n_symbols, n_lines, n_bullet_lines,
         |  n_ellipsis_lines, n_dup_lines, n_alpha_words, n_stop_hits,
         |  CAST(CASE WHEN $gopherPassCond THEN 1 ELSE 0 END AS BIGINT) AS pass
         |FROM gcnt""".stripMargin,
    // the end-to-end manifest: Gopher-passing, non-dup-loser base docs with
    // their token counts (Dedup.trainManifest) — composes the proven CTEs
    "dd_train_manifest" ->
      (dupClusterCtes + ",\n" +
        s"""$gopherCtes,
           |$lmScoreCtes,
           |$lmBucketCtes
           |SELECT c.doc_id,
           |  CASE WHEN trim(d.text) = '' THEN CAST(0 AS BIGINT)
           |       ELSE CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT)
           |  END AS n_tokens,
           |  COALESCE(
           |    CASE WHEN r.lang_rank * 3 <= r.n_lang THEN 'head'
           |         WHEN r.lang_rank * 3 <= r.n_lang * 2 THEN 'middle'
           |         WHEN r.lang_rank IS NOT NULL THEN 'tail' END,
           |    'tail') AS bucket
           |FROM gcnt c JOIN documents d ON d.doc_id = c.doc_id
           |LEFT JOIN rk r ON r.doc_id = c.doc_id
           |WHERE ($gopherPassCond)
           |  AND c.doc_id NOT IN (
           |    SELECT doc_id FROM l${Dedup.ClusterIters} WHERE doc_id <> lbl)""".stripMargin),
    // the data-mix report: (lang, bucket) doc/token totals over the
    // manifest — the CCNet sampler's input table
    "dd_data_mix" ->
      (dupClusterCtes + ",\n" +
        s"""$gopherCtes,
           |$lmScoreCtes,
           |$lmBucketCtes,
           |mani AS (
           |  SELECT c.doc_id, d.lang,
           |    CASE WHEN trim(d.text) = '' THEN CAST(0 AS BIGINT)
           |         ELSE CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT)
           |    END AS n_tokens,
           |    COALESCE(
           |      CASE WHEN r.lang_rank * 3 <= r.n_lang THEN 'head'
           |           WHEN r.lang_rank * 3 <= r.n_lang * 2 THEN 'middle'
           |           WHEN r.lang_rank IS NOT NULL THEN 'tail' END,
           |      'tail') AS bucket
           |  FROM gcnt c JOIN documents d ON d.doc_id = c.doc_id
           |  LEFT JOIN rk r ON r.doc_id = c.doc_id
           |  WHERE ($gopherPassCond)
           |    AND c.doc_id NOT IN (
           |      SELECT doc_id FROM l${Dedup.ClusterIters} WHERE doc_id <> lbl))
           |SELECT lang, bucket, COUNT(*) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
           |FROM mani GROUP BY 1, 2""".stripMargin),
    // temperature-flattened mix budgeting: stratum weight floor(sqrt(
    // total_tokens)) (alpha=0.5), the token budget apportioned by largest
    // remainder — sum(alloc_tokens) == K exactly
    "dd_mix_budget" ->
      (mixBudgetCtes(Dedup.MixBudgetTokens) +
        s"""
           |SELECT lang, bucket, total_tokens, weight,
           |  CAST(base + CASE WHEN rk <= (SELECT leftover FROM mixl) THEN 1 ELSE 0 END
           |       AS BIGINT) AS alloc_tokens
           |FROM mixr""".stripMargin),
    // corpus assembly: each (lang, bucket) stratum filled to its
    // largest-remainder allocation in md5(doc_id) order — running total of
    // PRECEDING picks under the allocation, first overshooting doc kept
    "dd_corpus_assembly" ->
      (mixBudgetCtes(Dedup.AssemblyBudgetTokens) +
        s""",
           |alloc AS (
           |  SELECT lang, bucket,
           |    base + CASE WHEN rk <= (SELECT leftover FROM mixl) THEN 1 ELSE 0 END
           |      AS alloc_tokens
           |  FROM mixr),
           |pick AS (
           |  SELECT m.doc_id, m.lang, m.bucket, m.n_tokens,
           |    COALESCE(SUM(m.n_tokens) OVER (
           |      PARTITION BY m.lang, m.bucket
           |      ORDER BY md5(CAST(m.doc_id AS VARCHAR)), m.doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
           |  FROM mani m)
           |SELECT p.doc_id, p.lang, p.bucket, CAST(p.n_tokens AS BIGINT) AS n_tokens
           |FROM pick p JOIN alloc a ON a.lang = p.lang AND a.bucket = p.bucket
           |WHERE p.prior < a.alloc_tokens""".stripMargin),
    // C4 cleaning heuristics (Raffel et al. 2020 §2.2) over the
    // deterministic five-variant injected view (TextAnalysis.c4Docs) —
    // line filter, sentence-count gate, lorem-ipsum / brace page drops
    "dd_quality_c4" ->
      """WITH c4 AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5
        |      WHEN 0 THEN text || '. This is a good sentence. It ends well today.'
        |      WHEN 1 THEN text || '. This is a good sentence. It ends well. lorem ipsum dolor sit.'
        |      WHEN 2 THEN text || '. This line has a { brace. It still ends well today.'
        |      WHEN 3 THEN text || '.' || chr(10) || 'no terminal punctuation on this line' || chr(10) || 'Please enable javascript in your browser now.' || chr(10) || 'Another full sentence is right here.'
        |      ELSE text END AS text
        |  FROM documents),
        |ln AS (
        |  SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM c4),
        |k AS (
        |  SELECT doc_id, text, lines,
        |    list_filter(lines, l ->
        |      regexp_matches(l, '[.!?"]$')
        |      AND len(regexp_split_to_array(trim(l), '\s+')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM ln),
        |c AS (
        |  SELECT doc_id, text, lines, kept,
        |    -- array_to_string([]) is NULL in DuckDB; Spark array_join gives ''
        |    COALESCE(array_to_string(kept, chr(10)), '') AS cleaned FROM k)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
        |  CAST(strlen(cleaned) - strlen(regexp_replace(cleaned, '[.!?]', '', 'g')) AS BIGINT) AS n_sentences,
        |  CAST(CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END AS BIGINT) AS has_lorem,
        |  CAST(CASE WHEN contains(text, '{') THEN 1 ELSE 0 END AS BIGINT) AS has_brace,
        |  CAST(CASE WHEN strlen(cleaned) - strlen(regexp_replace(cleaned, '[.!?]', '', 'g')) >= 3
        |    AND NOT contains(lower(text), 'lorem ipsum')
        |    AND NOT contains(text, '{') THEN 1 ELSE 0 END AS BIGINT) AS pass,
        |  cleaned
        |FROM c""".stripMargin,
    // 5-way profile language ID over the marker-injected view: Han counter
    // gates zh; stop-word profile argmax (ties to profile order) otherwise
    "dd_lang_id_profile" -> {
      import graft.pipeline.TextAnalysis.{LangProfiles, ZhMarker, HanMin}
      val markerCase = LangProfiles.map { case (l, ws) =>
        val m = ws.mkString(" ")
        s"WHEN '$l' THEN '$m $m'"
      }.mkString(" ") + s" WHEN 'zh' THEN '$ZhMarker $ZhMarker'"
      val hitSel = LangProfiles.map { case (l, ws) =>
        val lst = ws.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(wl, w -> w IN ($lst))) AS h_$l"
      }.mkString(",\n    ")
      s"""WITH lm AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN doc_id % 3 <> 0 THEN
         |      (CASE lang $markerCase END) || ' ' || text
         |    ELSE text END AS text
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, lang, text,
         |    list_filter(regexp_split_to_array(lower(text), '\\W+'), w -> w <> '') AS wl
         |  FROM lm),
         |c AS (
         |  SELECT doc_id, lang,
         |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS han,
         |    $hitSel
         |  FROM tok)
         |SELECT doc_id, lang,
         |  CASE WHEN han >= $HanMin THEN 'zh'
         |       WHEN h_de + h_en + h_es + h_fr = 0 THEN 'und'
         |       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
         |       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
         |       WHEN h_es >= h_fr THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         |FROM c""".stripMargin
    },
    // deterministic stratified sampling: md5(doc_id) orders each language
    // stratum; take while the preceding running token total is under budget
    "dd_sample_stratified" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
         |         ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
         |    END AS n_tokens,
         |    md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents)
         |SELECT doc_id, lang, n_tokens FROM (
         |  SELECT doc_id, lang, n_tokens,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
         |  FROM d)
         |WHERE prior < ${graft.pipeline.TextAnalysis.SampleTokenBudget}""".stripMargin,
    // PII scrub over the deterministic injected view (TextAnalysis.piiDocs):
    // identical RE2∩Java patterns, emails redacted first in both engines
    "dd_pii_scrub" -> {
      import graft.pipeline.TextAnalysis._
      s"""WITH pii AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 4 = 1 THEN
         |      text || ' reach user' || doc_id || '@example.com at 10.' ||
         |      (doc_id % 256) || '.0.' || (doc_id % 100) || ' or +1555' ||
         |      lpad(CAST(doc_id % 10000000 AS VARCHAR), 7, '0')
         |    ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$Ipv4Re', '<IP>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g') AS scrubbed
         |FROM pii""".stripMargin
    },
    // NFC canonicalization over the injected mixed-composition view: the
    // oracle's nfc_normalize is DuckDB's own UAX#15 implementation — two
    // independent engines of the public standard must agree byte-for-byte
    "dd_text_nfc" ->
      s"""WITH v AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 4 = 2
         |           THEN text || ' cafe' || chr(769) || ' nai' || chr(776) || 've'
         |         WHEN doc_id % 4 = 3
         |           THEN text || ' caf' || chr(233) || ' plain'
         |         ELSE text END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END AS BIGINT) AS changed,
         |  CAST(length(t) AS BIGINT) AS n_chars_raw,
         |  CAST(length(nfc_normalize(t)) AS BIGINT) AS n_chars_nfc,
         |  nfc_normalize(t) AS text_nfc
         |FROM v""".stripMargin,
    // unigram token entropy in Q16: (dl·lg(dl) − Σ tf·lg(tf)) // dl, logs
    // replayed by the same unrolled Turner iteration as dd_lm_score
    "dd_unigram_entropy" ->
      s"""WITH $entropyCtes
         |SELECT d2.doc_id,
         |  CAST(COALESCE(esc.dl, 0) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(esc.n_types, 0) AS BIGINT) AS n_types,
         |  CAST(COALESCE(esc.e, 0) AS BIGINT) AS entropy_q16
         |FROM documents d2 LEFT JOIN esc ON esc.doc_id = d2.doc_id""".stripMargin,
    // stupid-backoff bigram LM quality score: exact integer counts, and
    // log2 in Q16 fixed point replayed by the SAME 16-step shift-and-square
    // integer iteration Lm.log2fix runs (Turner 2010) — a transcendental
    // made bit-replayable, the kmeans/pagerank unrolled-oracle pattern
    "dd_lm_score" ->
      s"""WITH $lmScoreCtes
         |SELECT d2.doc_id,
         |  CAST(COALESCE(a.s, 0) AS BIGINT) AS lm_score_q16,
         |  CAST(COALESCE(a.n, 0) AS BIGINT) AS n_transitions
         |FROM documents d2 LEFT JOIN agg a ON a.doc_id = d2.doc_id""".stripMargin,
    // DSIR importance weights (Xie 2023 §3.1): hashed-unigram bucket
    // log-ratio of the en-target vs raw distribution, add-1 smoothed, Q16
    // via the same unrolled Turner log2 iteration; bucket = first two hex
    // chars of sha256, identical bytes on both engines
    "dd_dsir_weights" ->
      s"""WITH $dsirScoreCtes
         |SELECT d2.doc_id, d2.lang,
         |  CAST(COALESCE(sc.s, 0) AS BIGINT) AS dsir_score_q16,
         |  CAST(COALESCE(sc.n, 0) AS BIGINT) AS n_feats
         |FROM documents d2 LEFT JOIN sc ON sc.doc_id = d2.doc_id""".stripMargin,
    // deterministic importance resampling over the DSIR scores: rank by
    // floor(score/n_feats) desc (offset trick keeps the division on
    // positives, where Spark div == DuckDB //), histogram-running-sum +
    // within-tie row_number rank, keep the top quarter
    "dd_dsir_sample" -> {
      import graft.pipeline.Dsir.{SampleKeepDen, SampleOffset}
      s"""WITH $dsirScoreCtes,
         |w AS (SELECT doc_id,
         |        ((s + n * $SampleOffset) // n) - $SampleOffset AS per_tok_q16
         |      FROM sc WHERE n > 0),
         |hist AS (SELECT per_tok_q16, COUNT(*) AS c FROM w GROUP BY 1),
         |cum AS (
         |  SELECT per_tok_q16,
         |    COALESCE(SUM(c) OVER (ORDER BY per_tok_q16 DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM hist),
         |rk AS (
         |  SELECT w.doc_id, w.per_tok_q16,
         |    cum.cb + ROW_NUMBER() OVER (PARTITION BY w.per_tok_q16
         |      ORDER BY w.doc_id) AS rnk
         |  FROM w JOIN cum ON cum.per_tok_q16 = w.per_tok_q16)
         |SELECT doc_id, CAST(per_tok_q16 AS BIGINT) AS per_tok_q16,
         |  CAST(rnk AS BIGINT) AS sel_rank,
         |  CAST(CASE WHEN rnk <= (SELECT COUNT(*) FROM w) // $SampleKeepDen
         |       THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM rk""".stripMargin
    },
    // naive-Bayes quality classifier (Brown 2020 appendix A / Wenzek 2020
    // §3.3 made deterministic): Gopher verdicts as weak labels on the
    // doc_id%3==0 split, top-64-df vocabulary, add-1 smoothed Q16 log-odds
    // via the unrolled Turner log2 iteration — every weight bit-replayed
    "dd_nb_quality" ->
      s"""WITH $gopherCtes,
         |$nbCtes
         |SELECT d.doc_id,
         |  CAST(COALESCE(nb_sc.n, 0) AS BIGINT) AS n_feats,
         |  CAST(COALESCE(nb_sc.s, 0) + (SELECT b FROM nb_bs) AS BIGINT) AS score_q16,
         |  CAST(CASE WHEN COALESCE(nb_sc.s, 0) + (SELECT b FROM nb_bs) >= 0
         |       THEN 1 ELSE 0 END AS BIGINT) AS pred
         |FROM documents d LEFT JOIN nb_sc ON nb_sc.doc_id = d.doc_id""".stripMargin,
    // exact per-source length deciles WITHOUT a global sort: (source,
    // value) histogram + per-source cumsum over distinct values; decile k
    // = smallest value with 10·cum ≥ k·n (percentile_disc in integers) —
    // and the oracle cross-checks that rank math against DuckDB's own
    // percentile_disc
    "dd_len_deciles" -> {
      val ducks = (1 to 9).map(k =>
        s"""SELECT source, CAST($k AS BIGINT) AS decile,
           |    CAST(percentile_disc(${k / 10.0}) WITHIN GROUP (ORDER BY n_chars)
           |      AS BIGINT) AS dvalue
           |  FROM documents GROUP BY 1""".stripMargin).mkString("\n  UNION ALL\n  ")
      s"""WITH hist AS (
         |  SELECT source, n_chars, COUNT(*) AS c FROM documents GROUP BY 1, 2),
         |cum AS (
         |  SELECT source, n_chars,
         |    SUM(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum
         |  FROM hist),
         |tot AS (SELECT source, SUM(c) AS n FROM hist GROUP BY 1),
         |ks AS (SELECT CAST(k AS BIGINT) AS decile FROM range(1, 10) t(k)),
         |mine AS (
         |  SELECT c.source, ks.decile, CAST(MIN(c.n_chars) AS BIGINT) AS value
         |  FROM cum c JOIN tot t ON t.source = c.source CROSS JOIN ks
         |  WHERE c.cum * 10 >= ks.decile * t.n
         |  GROUP BY 1, 2),
         |ducks AS (
         |  $ducks)
         |SELECT m.source, m.decile, m.value
         |FROM mine m JOIN ducks d
         |  ON d.source = m.source AND d.decile = m.decile AND d.dvalue = m.value""".stripMargin
    },
    // CCNet perplexity bucketing (Wenzek 2020 §3.2): per-language terciles
    // of the per-token LM score, ranked by the same two-level shape the
    // engine uses — (lang, score) histogram running sum + within-tie
    // row_number — all thresholds exact integer rank math
    "dd_lm_buckets" ->
      s"""WITH $lmScoreCtes,
         |$lmBucketCtes
         |SELECT doc_id, lang, CAST(tok AS BIGINT) AS tok_score_q16,
         |  CAST(lang_rank AS BIGINT) AS lang_rank,
         |  CAST(n_lang AS BIGINT) AS n_lang,
         |  CASE WHEN lang_rank * 3 <= n_lang THEN 'head'
         |       WHEN lang_rank * 3 <= n_lang * 2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM rk""".stripMargin,
    // inverted index: one (term, doc_id) aggregation over the \W+ token
    // stream — the index-build shuffle, materialized
    "search_postings" ->
      """SELECT w AS term, doc_id, COUNT(*) AS tf FROM (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\W+'), x -> x <> '')) AS w
        |  FROM documents)
        |GROUP BY 1, 2""".stripMargin,
    // integer-weighted multi-term search: score = Σ tf(t,d) · (SCALE // df(t)),
    // top 10 per query by (score desc, doc_id) — mirrors Search.searchTopK
    "search_topk" -> searchTopkSql,
    // postings compression sizing: delta gaps per term (first gap = the
    // doc_id itself), LEB128 byte cost as a threshold ladder — an
    // independent restatement of the Varint encoder the spec pins
    "search_postings_varbyte" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')) AS w
         |  FROM documents),
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |g AS (SELECT w, doc_id,
         |        doc_id - COALESCE(LAG(doc_id) OVER (PARTITION BY w ORDER BY doc_id), 0) AS gap
         |      FROM tf),
         |b AS (SELECT w,
         |        1 + ${(1 to 8).map(k => s"(CASE WHEN gap >= ${1L << (7 * k)} THEN 1 ELSE 0 END)").mkString(" + ")} AS vb
         |      FROM g)
         |SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS df,
         |  CAST(SUM(vb) AS BIGINT) AS bytes_varint,
         |  CAST(COUNT(*) * 8 AS BIGINT) AS bytes_fixed8
         |FROM b GROUP BY 1""".stripMargin,
    // more-like-this: each probe doc's 8 rarest terms (df asc, term asc)
    // score the corpus by tf_probe·tf_doc·(scale div df); self excluded
    "search_more_like_this" -> {
      val vals = Search.MltDocs.map(id => s"($id)").mkString(", ")
      s"""WITH q(qid) AS (VALUES $vals),
         |tok AS (
         |  SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')) AS w
         |  FROM documents),
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
         |qtf AS (SELECT CAST(q.qid AS BIGINT) AS qid, tf.w, tf.tf AS tf_q
         |        FROM q JOIN tf ON tf.doc_id = q.qid),
         |qsel AS (
         |  SELECT qid, w, tf_q,
         |    CAST(${Search.WeightScale} // df AS BIGINT) AS weight
         |  FROM (SELECT qtf.qid, qtf.w, qtf.tf_q, dfq.df,
         |          ROW_NUMBER() OVER (PARTITION BY qtf.qid
         |            ORDER BY dfq.df, qtf.w) AS rn
         |        FROM qtf JOIN dfq ON dfq.w = qtf.w)
         |  WHERE rn <= ${Search.MltTerms}),
         |sc AS (SELECT qsel.qid, tf.doc_id,
         |         CAST(SUM(tf.tf * qsel.tf_q * qsel.weight) AS BIGINT) AS score
         |       FROM tf JOIN qsel ON qsel.w = tf.w
         |       WHERE tf.doc_id <> qsel.qid GROUP BY 1, 2)
         |SELECT qid AS query_doc, rank, doc_id, score FROM (
         |  SELECT qid, doc_id, score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |  FROM sc)
         |WHERE rank <= ${Search.TopK}""".stripMargin
    },
    // reciprocal-rank fusion of the three rankers' top-10s: rank-only
    // combination, 2^16 // (60 + rank) per list, ties by doc_id
    "search_rrf" ->
      s"""WITH u AS (
         |  SELECT query_id, rank, doc_id FROM ($searchTopkSql)
         |  UNION ALL
         |  SELECT query_id, rank, doc_id FROM ($bm25Sql)
         |  UNION ALL
         |  SELECT query_id, rank, doc_id FROM ($qlDirichletSql)),
         |f AS (SELECT query_id, doc_id,
         |        CAST(SUM(65536 // (${Search.RrfK} + rank)) AS BIGINT) AS rrf_q16,
         |        CAST(COUNT(*) AS BIGINT) AS n_lists
         |      FROM u GROUP BY 1, 2)
         |SELECT query_id, rank, doc_id, rrf_q16, n_lists FROM (
         |  SELECT query_id, doc_id, rrf_q16, n_lists,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rrf_q16 DESC, doc_id) AS BIGINT) AS rank
         |  FROM f)
         |WHERE rank <= ${Search.TopK}""".stripMargin,
    // KWIC snippets for the topk result pages: pos = first query-term hit
    // (1-based), snippet = the ±3-token window, clamped at both ends;
    // the topk subquery is the ranker's own oracle SELECT verbatim
    "search_snippets" -> {
      val qvals = Search.Queries.map { case (id, q) => s"($id, '$q')" }.mkString(", ")
      val r = Search.SnippetRadius
      s"""WITH qq(query_id, query) AS (VALUES $qvals),
         |qt2 AS (SELECT CAST(query_id AS BIGINT) AS query_id,
         |          unnest(string_split(query, ' ')) AS w FROM qq),
         |d2 AS (SELECT doc_id,
         |         list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS wl
         |       FROM documents),
         |tp AS (SELECT doc_id, CAST(p[2] AS BIGINT) AS pos, p[1] AS w
         |       FROM (SELECT doc_id,
         |               unnest(list_zip(wl, generate_series(1, len(wl)))) AS p
         |             FROM d2)),
         |hit AS (SELECT qt2.query_id, tp.doc_id, MIN(tp.pos) AS pos
         |        FROM tp JOIN qt2 ON qt2.w = tp.w GROUP BY 1, 2)
         |SELECT tk.query_id, tk.rank, tk.doc_id,
         |  CAST(h.pos AS BIGINT) AS pos,
         |  array_to_string(d2.wl[greatest(1, h.pos - $r):(h.pos + $r)], ' ') AS snippet
         |FROM ($searchTopkSql) tk
         |JOIN hit h ON h.query_id = tk.query_id AND h.doc_id = tk.doc_id
         |JOIN d2 ON d2.doc_id = tk.doc_id""".stripMargin
    },
    // cross-ranker retrieval audit: conjunctive-match relevance scored
    // against each ranker's top-10 — the three ranker subqueries are the
    // SAME oracle SELECTs their own driver rows use, verbatim
    "search_ranker_eval" -> {
      val qvals = Search.Queries.map { case (id, q) => s"($id, '$q')" }.mkString(", ")
      val qids = Search.Queries.map { case (id, _) => s"($id)" }.mkString(", ")
      s"""WITH qv(query_id) AS (VALUES $qids),
         |qq(query_id, query) AS (VALUES $qvals),
         |qt2 AS (SELECT CAST(query_id AS BIGINT) AS query_id,
         |          unnest(string_split(query, ' ')) AS w FROM qq),
         |nq AS (SELECT query_id, COUNT(DISTINCT w) AS n_terms FROM qt2 GROUP BY 1),
         |tok2 AS (
         |  SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')) AS w
         |  FROM documents),
         |mt AS (SELECT qt2.query_id, tok2.doc_id, COUNT(DISTINCT qt2.w) AS m
         |       FROM tok2 JOIN qt2 ON qt2.w = tok2.w GROUP BY 1, 2),
         |rel AS (SELECT mt.query_id, mt.doc_id FROM mt
         |        JOIN nq ON nq.query_id = mt.query_id WHERE mt.m = nq.n_terms),
         |relc AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
         |         FROM rel GROUP BY 1),
         |u AS (
         |  SELECT 'tf' AS ranker, query_id, rank, doc_id FROM ($searchTopkSql)
         |  UNION ALL
         |  SELECT 'bm25' AS ranker, query_id, rank, doc_id FROM ($bm25Sql)
         |  UNION ALL
         |  SELECT 'ql' AS ranker, query_id, rank, doc_id FROM ($qlDirichletSql)),
         |nret AS (SELECT ranker, query_id, CAST(COUNT(*) AS BIGINT) AS n_ret
         |         FROM u GROUP BY 1, 2),
         |h AS (SELECT u.ranker, u.query_id, CAST(COUNT(*) AS BIGINT) AS hits,
         |        CAST(MIN(u.rank) AS BIGINT) AS fr
         |      FROM u JOIN rel ON rel.query_id = u.query_id AND rel.doc_id = u.doc_id
         |      GROUP BY 1, 2),
         |grid AS (SELECT r.ranker, CAST(qv.query_id AS BIGINT) AS query_id
         |         FROM (VALUES ('tf'), ('bm25'), ('ql')) r(ranker) CROSS JOIN qv)
         |SELECT g.ranker, g.query_id,
         |  CAST(COALESCE(relc.n_rel, 0) AS BIGINT) AS n_rel,
         |  CAST(COALESCE(nret.n_ret, 0) AS BIGINT) AS n_ret,
         |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_at_10,
         |  CAST(COALESCE(h.fr, 0) AS BIGINT) AS first_rel_rank,
         |  CAST(CASE WHEN h.fr IS NULL THEN 0 ELSE 65536 // h.fr END AS BIGINT) AS rr_q16
         |FROM grid g
         |LEFT JOIN relc ON relc.query_id = g.query_id
         |LEFT JOIN nret ON nret.ranker = g.ranker AND nret.query_id = g.query_id
         |LEFT JOIN h ON h.ranker = g.ranker AND h.query_id = g.query_id""".stripMargin
    },
    // Dirichlet query likelihood: log2 p̂(t|d) summed over in-corpus query
    // terms, every log from the same unrolled Turner iteration; candidates
    // = docs containing ≥1 query term; OOV-only queries return nothing
    "search_ql_dirichlet" -> qlDirichletSql,
    // Okapi BM25 in exact Q16 integers: idf = log2fix(2N+2) − log2fix(2df+1)
    // via the same unrolled Turner iteration as dd_lm_score; the tf
    // normalization is pure integer floor division — mirrors Search.bm25TopK
    "search_bm25" -> bm25Sql,
    // BM25F over the crawl corpus: body field = ground-truth markdown (the
    // engine scores its OWN extraction — byte-parity pinned by
    // crawl_extract_markdown), anchor field = in-link anchor text from
    // gt xlinks (parity pinned by graph_anchor_text); per-field length
    // norm, field-weighted combine, ONE shared saturation — mirrors
    // Search.bm25fTopK in exact Q16 integers
    "search_bm25f" -> {
      import graft.pipeline.Lm.{LogScaleBits, LogFracBits}
      import Search.{Q16, Q16K1, Q16B, WBody, WAnchor}
      val two = 1L << (LogScaleBits + 1)
      val steps = (1 to LogFracBits).map { i =>
        s"""lg$i AS (
           |  SELECT v, CASE WHEN y >= $two THEN y >> 1 ELSE y END AS x,
           |    r * 2 + CASE WHEN y >= $two THEN 1 ELSE 0 END AS r
           |  FROM (SELECT v, r, (x * x) >> $LogScaleBits AS y FROM lg${i - 1}))""".stripMargin
      }.mkString(",\n")
      val qvals = Search.QueriesF.map { case (id, q) => s"($id, '$q')" }.mkString(", ")
      s"""WITH body AS (
         |  SELECT url,
         |    list_filter(regexp_split_to_array(lower(markdown), '\\W+'), x -> x <> '') AS wl
         |  FROM ${gt("meta")}),
         |bdl AS (SELECT url, CAST(len(wl) AS BIGINT) AS dlb FROM body),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dlb) AS BIGINT) AS t FROM bdl),
         |atok AS (
         |  SELECT x.dst_url AS url,
         |    unnest(list_filter(regexp_split_to_array(lower(x.anchor_text), '\\W+'),
         |      c -> c <> '')) AS w
         |  FROM ${gt("xlinks")} x JOIN bdl b ON b.url = x.dst_url),
         |ta AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM atok),
         |adl AS (SELECT url, CAST(COUNT(*) AS BIGINT) AS dla FROM atok GROUP BY 1),
         |q(query_id, query) AS (VALUES $qvals),
         |qt AS (SELECT CAST(query_id AS BIGINT) AS query_id,
         |         unnest(string_split(query, ' ')) AS w FROM q),
         |btok AS (SELECT url, unnest(wl) AS w FROM body),
         |btf AS (SELECT url, w, CAST(COUNT(*) AS BIGINT) AS tfb FROM btok
         |        WHERE w IN (SELECT DISTINCT w FROM qt) GROUP BY 1, 2),
         |atf AS (SELECT url, w, CAST(COUNT(*) AS BIGINT) AS tfa FROM atok
         |        WHERE w IN (SELECT DISTINCT w FROM qt) GROUP BY 1, 2),
         |hit AS (
         |  SELECT COALESCE(btf.url, atf.url) AS url, COALESCE(btf.w, atf.w) AS w,
         |    CAST(COALESCE(tfb, 0) AS BIGINT) AS tfb,
         |    CAST(COALESCE(tfa, 0) AS BIGINT) AS tfa
         |  FROM btf FULL OUTER JOIN atf ON btf.url = atf.url AND btf.w = atf.w),
         |dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM hit GROUP BY 1),
         |vals AS (SELECT DISTINCT 2 * df + 1 AS v FROM dfq
         |         UNION SELECT DISTINCT 2 * n + 2 FROM st),
         |lg0 AS (
         |  SELECT v,
         |    (v << $LogScaleBits) >> (length(format('{:b}', v)) - 1) AS x,
         |    CAST(length(format('{:b}', v)) - 1 AS BIGINT) AS r
         |  FROM vals),
         |$steps,
         |lgt AS (SELECT v, r AS lg FROM lg$LogFracBits),
         |idf AS (SELECT dfq.w,
         |    (SELECT lg FROM lgt WHERE v = (SELECT 2 * n + 2 FROM st)) - lgt.lg AS idf_q16
         |  FROM dfq JOIN lgt ON lgt.v = 2 * dfq.df + 1),
         |sat AS (
         |  SELECT h.url, h.w,
         |    ((($WBody * ((h.tfb * $Q16 * $Q16) //
         |        (($Q16 - $Q16B) + ($Q16B * bdl.dlb * st.n) // st.t))
         |      + $WAnchor * ((h.tfa * $Q16 * $Q16) //
         |        (($Q16 - $Q16B) + ($Q16B * COALESCE(adl.dla, 0) * st.n) // ta.t)))
         |      * $Q16) //
         |     ($Q16K1 + ($WBody * ((h.tfb * $Q16 * $Q16) //
         |        (($Q16 - $Q16B) + ($Q16B * bdl.dlb * st.n) // st.t))
         |      + $WAnchor * ((h.tfa * $Q16 * $Q16) //
         |        (($Q16 - $Q16B) + ($Q16B * COALESCE(adl.dla, 0) * st.n) // ta.t)))))
         |      AS sat_q16
         |  FROM hit h JOIN bdl ON bdl.url = h.url LEFT JOIN adl ON adl.url = h.url
         |  CROSS JOIN st CROSS JOIN ta),
         |sc AS (
         |  SELECT qt.query_id, s.url,
         |    CAST(SUM((idf.idf_q16 * s.sat_q16) // $Q16) AS BIGINT) AS score_q16
         |  FROM sat s JOIN qt ON qt.w = s.w JOIN idf ON idf.w = s.w
         |  GROUP BY 1, 2)
         |SELECT query_id, rank, url, score_q16 FROM (
         |  SELECT query_id, url, score_q16,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score_q16 DESC, url) AS BIGINT) AS rank
         |  FROM sc)
         |WHERE rank <= ${Search.TopK}""".stripMargin
    },
    // positional phrase match: every phrase-term hit at token pos votes
    // for start = pos - idx; a start holding ALL indices is an occurrence
    // — mirrors Search.phraseTopK (the rarest-term seeding there is a pure
    // optimization with identical results, so the oracle replays the
    // unseeded vote count)
    "search_phrase" -> {
      val vals = Search.Phrases.flatMap { case (id, p) =>
        p.split(" ").zipWithIndex.map { case (w, i) => s"($id, $i, '$w')" }
      }.mkString(", ")
      s"""WITH pt(phrase_id, idx, w) AS (VALUES $vals),
         |plen AS (SELECT phrase_id, COUNT(*) AS L FROM pt GROUP BY 1),
         |dw AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS wl
         |  FROM documents),
         |tz AS (SELECT doc_id,
         |         unnest(list_zip(wl, generate_series(1, len(wl)))) AS p FROM dw),
         |tp AS (SELECT doc_id, p[1] AS w, CAST(p[2] AS BIGINT) - 1 AS pos
         |       FROM tz WHERE p[2] IS NOT NULL),
         |hits AS (
         |  SELECT CAST(pt.phrase_id AS BIGINT) AS phrase_id,
         |    CAST(pt.idx AS BIGINT) AS idx, tp.doc_id, tp.pos - pt.idx AS start
         |  FROM tp JOIN pt ON pt.w = tp.w WHERE tp.pos - pt.idx >= 0),
         |st AS (
         |  SELECT h.phrase_id, h.doc_id, h.start, COUNT(DISTINCT h.idx) AS k,
         |    ANY_VALUE(l.L) AS L
         |  FROM hits h JOIN plen l ON l.phrase_id = h.phrase_id
         |  GROUP BY 1, 2, 3),
         |occ AS (
         |  SELECT phrase_id, doc_id, COUNT(*) AS n_occurrences
         |  FROM st WHERE k = L GROUP BY 1, 2)
         |SELECT phrase_id, rank, doc_id, n_occurrences FROM (
         |  SELECT phrase_id, doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY phrase_id
         |      ORDER BY n_occurrences DESC, doc_id) AS BIGINT) AS rank
         |  FROM occ)
         |WHERE rank <= ${Search.TopK}""".stripMargin
    },
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
    // product-quantization ANN (Jégou 2011): per-subspace integer Lloyd
    // replayed round by round (assignment = exact integer squared-L2, tie
    // to lower cid; update = floored integer means — the +2^22 offset
    // keeps the numerator non-negative because DuckDB's // truncates
    // where the engine's floorDiv floors, the dd_dsir_sample trick),
    // then encode + ADC table lookups — every distance a Long, ranked
    // (dist asc, id)
    "ann_pq_topk" -> {
      val scale = graft.pipeline.Similarity.KmeansScale.toLong
      s"""WITH e AS (
         |  SELECT vec_id,
         |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * $scale) AS BIGINT)
         |     for i in generate_series(1, len(embedding))] AS q
         |  FROM embeddings),
         |$pqCtes
         |SELECT query_id, rank, neighbor_id, dist_q FROM (
         |  SELECT qid AS query_id, vec_id AS neighbor_id, dist AS dist_q,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY dist ASC, vec_id ASC) AS BIGINT) AS rank
         |  FROM pqsc)
         |WHERE rank <= 10""".stripMargin
    },
    // Common-Crawl-index-style per-host rollup over the corpus pages
    "graph_host_stats" ->
      s"""SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         |  COUNT(*) AS n_pages,
         |  CAST(SUM(octet_length(html)) AS BIGINT) AS total_bytes,
         |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(epoch_ms(MAX(warc_ts)) - epoch_ms(MIN(warc_ts)) AS BIGINT) AS capture_span_ms
         |FROM ${gt("pages")} GROUP BY 1""".stripMargin,
    // WARC/1.0 response records (ISO 28500), byte-exact: UUID-shaped md5
    // record id, labeled sha-256 block digest, CRLF framing
    "crawl_sink_warc" ->
      s"""SELECT url,
         |  'WARC/1.0' || chr(13) || chr(10) ||
         |  'WARC-Type: response' || chr(13) || chr(10) ||
         |  'WARC-Record-ID: <urn:uuid:' ||
         |    substr(md5(url), 1, 8) || '-' || substr(md5(url), 9, 4) || '-' ||
         |    substr(md5(url), 13, 4) || '-' || substr(md5(url), 17, 4) || '-' ||
         |    substr(md5(url), 21, 12) || '>' || chr(13) || chr(10) ||
         |  'WARC-Date: ' || strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') || chr(13) || chr(10) ||
         |  'WARC-Target-URI: ' || url || chr(13) || chr(10) ||
         |  'Content-Type: text/html' || chr(13) || chr(10) ||
         |  -- DuckDB sha256 is VARCHAR-only and CAST(BLOB AS VARCHAR) escapes
         |  -- bytes; decode() is the UTF-8 decode, identity for valid-UTF-8 html
         |  'WARC-Block-Digest: sha256:' || sha256(decode(html)) || chr(13) || chr(10) ||
         |  'Content-Length: ' || CAST(octet_length(html) AS VARCHAR) || chr(13) || chr(10) ||
         |  chr(13) || chr(10) ||
         |  decode(html) ||
         |  chr(13) || chr(10) || chr(13) || chr(10) AS warc_record
         |FROM ${gt("pages")}""".stripMargin,
    // read(write(pages)) ≡ pages: the engine wrote its own warc files and
    // parsed them back; url, the WARC-Date header, and the payload digest +
    // octet count must equal the ground-truth pages the sink consumed
    "crawl_warc_roundtrip" ->
      s"""SELECT url,
         |  strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
         |  sha256(decode(html)) AS html_sha,
         |  CAST(octet_length(html) AS BIGINT) AS n_bytes
         |FROM ${gt("pages")}""".stripMargin,
    // a crawl whose input was warc files instead of the parquet corpus
    // reaches exactly the link-graph BFS seen set
    "crawl_warc_bfs" ->
      s"""$reachCte
         |SELECT url, CAST(depth AS BIGINT) AS depth FROM seen""".stripMargin,
    // RFC 9309 longest-match robots verdicts: same rule constants, same
    // pattern→regex translation, same (plen desc, allow-wins, rule_id)
    // total order in both engines
    "crawl_robots_rfc9309" -> {
      import graft.crawl.Robots9309
      val vals = Robots9309.Rules.zipWithIndex.map { case ((v, p), i) =>
        s"($i, '$v', '$p', '${Robots9309.ruleRegex(p)}', ${p.length})"
      }.mkString(", ")
      s"""WITH r(rule_id, verdict, pattern, regex, plen) AS (VALUES $vals),
         |pg AS (SELECT url, regexp_replace(url, '^https?://[^/]+', '') AS path
         |       FROM ${gt("pages")}),
         |m AS (SELECT pg.url, r.* FROM pg JOIN r ON regexp_matches(pg.path, r.regex)),
         |w AS (SELECT url, verdict, pattern,
         |        ROW_NUMBER() OVER (PARTITION BY url
         |          ORDER BY plen DESC, verdict ASC, rule_id ASC) AS rn
         |      FROM m)
         |SELECT pg.url,
         |  CAST(CASE WHEN w.verdict IS NULL OR w.verdict = 'allow' THEN 1 ELSE 0 END AS BIGINT) AS allowed,
         |  COALESCE(w.pattern, '') AS rule
         |FROM pg LEFT JOIN (SELECT * FROM w WHERE rn = 1) w ON w.url = pg.url""".stripMargin
    },
    // WET conversion records: the payload is the ENGINE's extracted
    // markdown; the oracle rebuilds the record from encode-side ground
    // truth — extraction AND formatting must both be byte-exact
    "crawl_sink_wet" -> {
      val gtMeta = gt("meta")
      val gtPages = gt("pages")
      s"""SELECT m.url,
         |  'WARC/1.0' || chr(13) || chr(10) ||
         |  'WARC-Type: conversion' || chr(13) || chr(10) ||
         |  'WARC-Record-ID: <urn:uuid:' ||
         |    substr(md5('conv:' || m.url), 1, 8) || '-' || substr(md5('conv:' || m.url), 9, 4) || '-' ||
         |    substr(md5('conv:' || m.url), 13, 4) || '-' || substr(md5('conv:' || m.url), 17, 4) || '-' ||
         |    substr(md5('conv:' || m.url), 21, 12) || '>' || chr(13) || chr(10) ||
         |  'WARC-Date: ' || strftime(p.warc_ts, '%Y-%m-%dT%H:%M:%SZ') || chr(13) || chr(10) ||
         |  'WARC-Target-URI: ' || m.url || chr(13) || chr(10) ||
         |  'Content-Type: text/plain' || chr(13) || chr(10) ||
         |  'WARC-Block-Digest: sha256:' || sha256(m.markdown) || chr(13) || chr(10) ||
         |  'Content-Length: ' || CAST(strlen(m.markdown) AS VARCHAR) || chr(13) || chr(10) ||
         |  chr(13) || chr(10) ||
         |  m.markdown ||
         |  chr(13) || chr(10) || chr(13) || chr(10) AS wet_record
         |FROM $gtMeta m JOIN $gtPages p ON p.url = m.url""".stripMargin
    },
    // WARC revisit records of the recrawl cycle: the same deterministic
    // donor-edit change set as crawl_recrawl_delta, every capture refetched
    // one day later; digest-unchanged pages collapse to payload-less
    // revisit records (identical-payload-digest profile), changed pages get
    // full response records — both rebuilt byte-for-byte here
    "crawl_warc_revisit" -> {
      val rid = "substr(md5('rev:' || url), %s, %s)"
      def r(a: Int, b: Int) = rid.format(a, b)
      s"""WITH mx AS (
         |  SELECT m.url, m.host_idx, m.page_idx, p.warc_ts, p.html
         |  FROM ${gt("meta")} m JOIN ${gt("pages")} p ON p.url = m.url),
         |don AS (
         |  SELECT c.url, d.html AS dhtml
         |  FROM mx c JOIN mx d
         |    ON d.host_idx = c.host_idx AND d.page_idx = c.page_idx - 1
         |  WHERE c.page_idx % 7 = 3),
         |v2 AS (
         |  SELECT mx.url, mx.warc_ts,
         |    COALESCE(don.dhtml, mx.html) AS html2, mx.html AS html1
         |  FROM mx LEFT JOIN don ON don.url = mx.url),
         |t AS (
         |  SELECT url, warc_ts, html2,
         |    sha256(decode(html2)) AS dig,
         |    CASE WHEN sha256(decode(html2)) = sha256(decode(html1))
         |         THEN 'revisit' ELSE 'response' END AS record_type
         |  FROM v2)
         |SELECT url, record_type,
         |  'WARC/1.0' || chr(13) || chr(10) ||
         |  'WARC-Type: ' || record_type || chr(13) || chr(10) ||
         |  'WARC-Record-ID: <urn:uuid:' ||
         |    ${r(1, 8)} || '-' || ${r(9, 4)} || '-' || ${r(13, 4)} || '-' ||
         |    ${r(17, 4)} || '-' || ${r(21, 12)} || '>' || chr(13) || chr(10) ||
         |  'WARC-Date: ' || strftime(warc_ts + INTERVAL 1 DAY, '%Y-%m-%dT%H:%M:%SZ')
         |    || chr(13) || chr(10) ||
         |  'WARC-Target-URI: ' || url || chr(13) || chr(10) ||
         |  CASE WHEN record_type = 'revisit' THEN
         |    'WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest'
         |      || chr(13) || chr(10) ||
         |    'WARC-Refers-To-Target-URI: ' || url || chr(13) || chr(10) ||
         |    'WARC-Refers-To-Date: ' || strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ')
         |      || chr(13) || chr(10) ||
         |    'WARC-Payload-Digest: sha256:' || dig || chr(13) || chr(10) ||
         |    'Content-Length: 0' || chr(13) || chr(10) ||
         |    chr(13) || chr(10) || chr(13) || chr(10)
         |  ELSE
         |    'Content-Type: text/html' || chr(13) || chr(10) ||
         |    'WARC-Block-Digest: sha256:' || dig || chr(13) || chr(10) ||
         |    'Content-Length: ' || CAST(octet_length(html2) AS VARCHAR)
         |      || chr(13) || chr(10) ||
         |    chr(13) || chr(10) ||
         |    decode(html2) ||
         |    chr(13) || chr(10) || chr(13) || chr(10)
         |  END AS warc_record
         |FROM t""".stripMargin
    },
    // the revisit loop closed: revisit records re-ingested and resolved
    // against the prior cycle's captures must reconstruct the true v2
    // snapshot byte-for-byte (write(revisit) . read . resolve == recrawl)
    "crawl_revisit_resolve" ->
      s"""WITH mx AS (
         |  SELECT m.url, m.host_idx, m.page_idx, p.html
         |  FROM ${gt("meta")} m JOIN ${gt("pages")} p ON p.url = m.url),
         |don AS (
         |  SELECT c.url, d.html AS dhtml
         |  FROM mx c JOIN mx d
         |    ON d.host_idx = c.host_idx AND d.page_idx = c.page_idx - 1
         |  WHERE c.page_idx % 7 = 3),
         |v2 AS (
         |  SELECT mx.url,
         |    COALESCE(don.dhtml, mx.html) AS html2, mx.html AS html1
         |  FROM mx LEFT JOIN don ON don.url = mx.url)
         |SELECT url,
         |  CASE WHEN sha256(decode(html2)) = sha256(decode(html1))
         |       THEN 'revisit' ELSE 'response' END AS via,
         |  sha256(decode(html2)) AS html_sha,
         |  CAST(octet_length(html2) AS BIGINT) AS n_bytes
         |FROM v2""".stripMargin,
    // incremental index maintenance == rebuild: the oracle builds postings
    // from scratch over the v2 ground-truth extraction (donor markdown for
    // changed urls); the engine must reach the identical index by
    // retract-and-append on the delta only
    "search_index_delta" ->
      s"""WITH mx AS (
         |  SELECT url, host_idx, page_idx, markdown FROM ${gt("meta")}),
         |don AS (
         |  SELECT c.url, d.markdown AS dmd
         |  FROM mx c JOIN mx d
         |    ON d.host_idx = c.host_idx AND d.page_idx = c.page_idx - 1
         |  WHERE c.page_idx % 7 = 3),
         |v2 AS (
         |  SELECT mx.url, COALESCE(don.dmd, mx.markdown) AS markdown
         |  FROM mx LEFT JOIN don ON don.url = mx.url)
         |SELECT w AS term, url, COUNT(*) AS tf FROM (
         |  SELECT url,
         |    unnest(list_filter(regexp_split_to_array(lower(markdown), '\\W+'),
         |      x -> x <> '')) AS w
         |  FROM v2)
         |GROUP BY 1, 2""".stripMargin,
    // per-host recrawl churn: captures, changed, stable, and the payload
    // bytes the revisit mechanism avoided rewriting
    "crawl_churn_stats" ->
      s"""WITH mx AS (
         |  SELECT m.url, m.host_idx, m.page_idx, p.html
         |  FROM ${gt("meta")} m JOIN ${gt("pages")} p ON p.url = m.url),
         |don AS (
         |  SELECT c.url, d.html AS dhtml
         |  FROM mx c JOIN mx d
         |    ON d.host_idx = c.host_idx AND d.page_idx = c.page_idx - 1
         |  WHERE c.page_idx % 7 = 3),
         |v2 AS (
         |  SELECT mx.url,
         |    CASE WHEN sha256(decode(COALESCE(don.dhtml, mx.html)))
         |              = sha256(decode(mx.html))
         |         THEN 1 ELSE 0 END AS stable,
         |    octet_length(mx.html) AS v1_bytes
         |  FROM mx LEFT JOIN don ON don.url = mx.url)
         |SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         |  CAST(COUNT(*) AS BIGINT) AS n_captures,
         |  CAST(SUM(1 - stable) AS BIGINT) AS n_changed,
         |  CAST(SUM(stable) AS BIGINT) AS n_stable,
         |  CAST(SUM(CASE WHEN stable = 1 THEN v1_bytes ELSE 0 END) AS BIGINT)
         |    AS bytes_saved
         |FROM v2 GROUP BY 1""".stripMargin,
    // WET write→read roundtrip: conversion records parsed back by the
    // Content-Length-framed reader must return every page's extracted
    // markdown byte-intact (digest + octet count vs encode-side ground
    // truth, date vs the capture timestamp)
    "crawl_wet_roundtrip" ->
      s"""SELECT m.url,
         |  strftime(p.warc_ts, '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
         |  sha256(m.markdown) AS text_sha,
         |  CAST(strlen(m.markdown) AS BIGINT) AS n_bytes
         |FROM ${gt("meta")} m JOIN ${gt("pages")} p ON p.url = m.url""".stripMargin,
    // CDX/SURT capture index: reversed host labels + ')' + path key,
    // 14-digit timestamp, sha-256 digest
    "crawl_cdx_index" ->
      s"""SELECT
         |  array_to_string(list_reverse(
         |    string_split(regexp_extract(url, '^https?://([^/]+)', 1), '.')), ',')
         |    || ')' || regexp_replace(url, '^https?://[^/]+', '') AS surt_key,
         |  strftime(warc_ts, '%Y%m%d%H%M%S') AS ts14,
         |  url,
         |  sha256(decode(html)) AS digest,
         |  CAST(octet_length(html) AS BIGINT) AS n_bytes
         |FROM ${gt("pages")}""".stripMargin,
    "mm_blob_meta" ->
      s"""SELECT url, CAST(octet_length(html) AS BIGINT) AS n_bytes,
         |  CAST(CASE WHEN substr(CAST(html AS VARCHAR), 1, 5) = '<html' THEN 1 ELSE 0 END AS BIGINT) AS is_html
         |FROM ${gt("pages")}""".stripMargin,
  )
}
