package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen

/** Multimodal-column operators: opaque `binary` payloads + typed metadata,
  * batched REAL decode (no stubs).
  *
  * Feature extraction runs the from-scratch [[Decoders]] (24-bit BMP,
  * 16-bit PCM WAV) inside a mapPartitions batch — the Spark shape a heavier
  * codec/model pipeline (mapInPandas etc.) would use, with per-partition
  * init amortized once. The engine sees ONLY (blob_id, payload); the
  * ground-truth features the oracle compares against were computed by the
  * corpus generator while ENCODING the payloads (blob_meta.parquet), so a
  * decode bug cannot self-confirm.
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

  final case class BlobFeatures(blob_id: Long, kind: String, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, sample_rate: Long, n_samples: Long,
      amp_sum: Long, n_bytes: Long)

  /** The ONE magic-byte sniff + strided decode + failure classification —
    * shared by the feature and transform operators so their `kind`
    * classification can never diverge. Decode failures (Left OR an
    * unanticipated decoder throw — defense in depth: the corrupt-blob
    * invariant is the pipeline's, not one parser's; the decoders already
    * bounds-check in Long arithmetic) classify as `unknown`.
    */
  private def sniffDecode(payload: Array[Byte], bmpStride: Int, wavStride: Int):
      (String, Option[Decoders.BmpInfo], Option[Decoders.WavInfo]) = {
    try {
      if (payload != null && payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') {
        Decoders.decodeBmpStrided(payload, bmpStride) match {
          case Right(b) => return ("bmp", Some(b), None)
          case Left(_)  =>
        }
      } else if (payload != null && payload.length >= 4 && payload(0) == 'R' &&
        payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F') {
        Decoders.decodeWavStrided(payload, wavStride) match {
          case Right(w) => return ("wav", None, Some(w))
          case Left(_)  =>
        }
      }
    } catch { case _: RuntimeException => /* classify below */ }
    ("unknown", None, None)
  }

  /** Sniff + full decode of one payload (stride 1). */
  def decodeOne(id: Long, payload: Array[Byte]): BlobFeatures = {
    val nBytes = if (payload == null) 0L else payload.length.toLong
    sniffDecode(payload, 1, 1) match {
      case ("bmp", Some(b), _) =>
        BlobFeatures(id, "bmp", b.width, b.height, b.sumR, b.sumG, b.sumB, 0, 0, 0, nBytes)
      case ("wav", _, Some(w)) =>
        BlobFeatures(id, "wav", 0, 0, 0, 0, 0, w.sampleRate, w.nSamples, w.ampSum, nBytes)
      case _ =>
        BlobFeatures(id, "unknown", 0, 0, 0, 0, 0, 0, 0, 0, nBytes)
    }
  }

  final case class BlobTransform(blob_id: Long, kind: String,
      rs_width: Long, rs_height: Long, rs_sum_r: Long, rs_sum_g: Long, rs_sum_b: Long,
      fs_n_samples: Long, fs_amp_sum: Long)

  /** RESIZE (images) / FRAME-SAMPLE (audio) over the opaque payloads:
    * nearest-neighbor half-size for BMP, every-[[Decoders.FrameStride]]-th
    * sample for WAV — the strided decode IS the transform (no intermediate
    * full-resolution materialization), which is the shape that matters at
    * scale: a 100 TB media column is downsampled in one narrow pass.
    * Oracle: the generator computed the same transforms while ENCODING.
    */
  def transformOne(id: Long, payload: Array[Byte]): BlobTransform =
    sniffDecode(payload, Decoders.ResizeStride, Decoders.FrameStride) match {
      case ("bmp", Some(b), _) =>
        BlobTransform(id, "bmp", b.width, b.height, b.sumR, b.sumG, b.sumB, 0, 0)
      case ("wav", _, Some(w)) =>
        BlobTransform(id, "wav", 0, 0, 0, 0, 0, w.nSamples, w.ampSum)
      case _ =>
        BlobTransform(id, "unknown", 0, 0, 0, 0, 0, 0, 0)
    }

  /** Batched resize/frame-sample over the blobs table. */
  def blobTransforms(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    spark.read.parquet(s"$dir/blobs.parquet")
      .select(col("blob_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => transformOne(id, payload) })
      .toDF()
  }

  /** Batched real decode over the opaque blobs table. */
  def blobFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    spark.read.parquet(s"$dir/blobs.parquet")
      .select(col("blob_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder/model init would happen once here
        it.map { case (id, payload) => decodeOne(id, payload) }
      }
      .toDF()
  }
}
