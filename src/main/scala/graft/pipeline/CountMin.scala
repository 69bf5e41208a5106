package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005, "An improved
  * data stream summary: the count-min sketch and its applications" —
  * public) over the cross-host link stream: d independent hash rows of w
  * counters each; every occurrence increments one counter per row, and a
  * key's frequency estimate is the MIN of its d counters — never an
  * underestimate, over by more than ε·N with probability ≤ δ
  * (w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  *
  * This is the frequency-side sibling of the KMV distinct sketch
  * ([[graft.functions.KMinValues]]): where a per-url exact in-link count
  * keys a shuffle by url (10^10 distinct keys at crawl scale), the sketch
  * is ONE aggregation onto d·w cells — the reduce output is ≤ d·w rows
  * per partition after map-side combine regardless of key cardinality,
  * and the finished sketch (a few KB) broadcasts anywhere frequencies are
  * needed: hot-link detection in the wave scheduler, crawl-priority hints,
  * repeated-boilerplate flags. Every piece is a codegen'd column
  * expression (md5-prefix bucket hashes, the same replayable-hash pattern
  * as KMV), so the sketch build runs at scan rate inside whole-stage
  * codegen with no UDF.
  *
  * Determinism: counter values are sums over a fixed partition of the
  * multiset (bucket = hash of key), independent of row order and
  * parallelism — bit-stable like every oracle-checked op here.
  */
object CountMin {

  /** d — independent hash rows (δ = e^-4 ≈ 1.8%). */
  val CmsRows = 4

  /** w — counters per row (ε = e/1024 ≈ 0.27% of the stream per cell). */
  val CmsW = 1024

  /** Audited-key sample: urls with md5-prefix % [[SampleMod]] == 0 (~3% of
    * keys) get exact counts computed beside their sketch estimates —
    * deterministic, content-independent selection.
    */
  val SampleMod = 37

  /** Row-r bucket of `key`: 56-bit md5 prefix of "cms&lt;r&gt;:&lt;key&gt;" mod w —
    * codegen'd, and replayable in the oracle as
    * `('0x' || substr(md5('cms<r>:' || key), 1, 14))::BIGINT % w`.
    */
  def bucket(key: Column, r: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms$r:"), key).cast("binary")), 1, 14),
      16, 10).cast("long"), lit(CmsW.toLong))

  /** The sketch table (r, b, cnt): one pass over the link stream, d
    * counter increments per occurrence, aggregated onto d·w cells.
    */
  def sketch(links: DataFrame): DataFrame = {
    val cells = (0 until CmsRows).map(r =>
      struct(lit(r).as("r"), bucket(col("dst_url"), r).as("b")))
    links.select(explode(array(cells: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The estimate-vs-exact audit over the deterministic key sample:
    * (url, exact_cnt, cms_est) — the sketch guarantee `est ≥ exact` and
    * the collision-driven overestimate are both visible to the oracle and
    * pinned by spec. Exact counts exist ONLY for the ~3% audited sample;
    * the sketch itself never needed them.
    */
  def inlinkCmsAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val links = spark.read.parquet(s"$dir/xlinks.parquet").select(col("dst_url"))
    val cms = sketch(links)

    val sampled = links
      .filter(pmod(conv(substring(md5(col("dst_url").cast("binary")), 1, 14),
        16, 10).cast("long"), lit(SampleMod.toLong)) === 0L)
      .groupBy(col("dst_url")).agg(count(lit(1)).as("exact_cnt"))

    val probes = sampled.select(col("dst_url"), col("exact_cnt"),
      explode(array((0 until CmsRows).map(r =>
        struct(lit(r).as("r"), bucket(col("dst_url"), r).as("b"))): _*)).as("rb"))
      .select(col("dst_url"), col("exact_cnt"),
        col("rb.r").as("r"), col("rb.b").as("b"))

    probes.join(cms, Seq("r", "b"))
      .groupBy(col("dst_url"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
      .select(col("dst_url").as("url"), col("exact_cnt"), col("cms_est"))
  }
}
