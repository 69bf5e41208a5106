package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * batched feature extraction.
  *
  * The corpus `pages.html` binary column stands in for image/audio/video
  * payloads — the Spark-side mechanics (schema, partitioning, batched
  * per-partition processing, fixed-width feature vectors) are identical.
  * Real codec decode is STUBBED with a deterministic fake (this container
  * has no image/audio libraries); the stub is clearly marked and isolated in
  * [[fakeDecode]] so a real decoder drops in without touching the dataflow.
  */
object Multimodal {

  /** Typed metadata over opaque binary payloads: size, magic prefix, a
    * cheap content sniff. Pure column expressions — no UDF, fully codegen'd,
    * pushdown-friendly (only `url` + `html` are read from parquet).
    */
  def blobMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir).select(
      col("url"),
      octet_length(col("html")).cast("long").as("n_bytes"),
      when(substring(col("html"), 1, 5).cast("string") === "<html", 1L)
        .otherwise(0L).as("is_html"))
  }

  /** STUB decoder: a real implementation would decode the image/audio frame
    * here (e.g. via javax.imageio / ffmpeg bindings). The fake is a
    * deterministic 8-bin byte histogram-sum from the payload bytes so the
    * plumbing — batch iteration, fixed-width output schema, partition
    * independence — is real and testable. Integer accumulators keep the
    * result exactly reproducible by the SQL oracle (no float summation
    * order dependence).
    */
  def fakeDecode(payload: Array[Byte]): Array[Long] = {
    val out = new Array[Long](8)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        out(i % 8) += payload(i) & 0xff
        i += 1
      }
    }
    out
  }

  /** Batched feature extraction over the binary column: mapPartitions so a
    * real decoder can amortize per-batch setup (model load, codec init) —
    * the Spark-side shape a Pandas-UDF/mapInPandas pipeline would have.
    * One scalar column per feature dim (fixed-width vectors belong in
    * columns at the query surface; arrays crash generic comparators).
    */
  def blobFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    CorpusGen.pages(spark, dir)
      .select(col("url"), col("html")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec init" happens once here
        it.map { case (url, payload) =>
          val f = fakeDecode(payload)
          val n = if (payload == null) 0L else payload.length.toLong
          (url, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7), n)
        }
      }
      .toDF("url", "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7", "n_bytes")
  }
}
