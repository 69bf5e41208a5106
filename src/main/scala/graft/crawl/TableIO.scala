package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Iceberg-shaped snapshot layout over plain parquet (SURVEY.md §7.2):
  * per-wave data dirs `{dir}/wave=K/{table}` plus a `manifest-K.json`
  * written LAST as the atomic commit marker, carrying snapshot lineage
  * (wave id, parent implicit, counters). No Iceberg runtime exists in this
  * offline image; this trait isolates the layout so a real catalog can be
  * swapped in (BASELINE.json north_rule: checkpoint with per-partition
  * lineage + metrics; resume mid-crawl).
  */
object TableIO {

  final case class Manifest(
      wave: Int,
      nextDepth: Int,
      maxSeq: Long,
      savedTotal: Long,
      stopped: Boolean,
      stopReason: String)

  def manifestJson(m: Manifest): String =
    s"""{"wave":${m.wave},"nextDepth":${m.nextDepth},"maxSeq":${m.maxSeq},""" +
      s""""savedTotal":${m.savedTotal},"stopped":${m.stopped},"stopReason":"${m.stopReason}"}"""

  def parseManifest(json: String): Manifest = {
    def long(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L)
    def bool(k: String): Boolean =
      s""""$k":(true|false)""".r.findFirstMatchIn(json).exists(_.group(1) == "true")
    def str(k: String): String =
      s""""$k":"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    Manifest(long("wave").toInt, long("nextDepth").toInt, long("maxSeq"),
      long("savedTotal"), bool("stopped"), str("stopReason"))
  }

  /** Write the wave's tables, then the manifest marker (written LAST as the
    * atomic commit). `metricsJson` lands as metrics.json next to the data —
    * the per-wave lineage record (fetch/skip/duplicate counters + per-table
    * row counts) the north rule asks for.
    */
  def writeWave(
      dir: String,
      wave: Int,
      tables: Map[String, DataFrame],
      manifest: Manifest,
      metricsJson: Option[String] = None): Map[String, String] = {
    val waveDir = s"$dir/wave=$wave"
    val paths = tables.map { case (name, df) =>
      val p = s"$waveDir/$name"
      df.write.mode("overwrite").parquet(p)
      name -> p
    }
    Files.createDirectories(Paths.get(waveDir))
    metricsJson.foreach(j => Files.writeString(Paths.get(s"$waveDir/metrics.json"), j))
    Files.writeString(Paths.get(s"$waveDir/manifest.json"), manifestJson(manifest))
    paths
  }

  /** Per-partition row counts of a (cached/checkpointed) table — the
    * per-partition lineage record the north rule asks for. One cheap pass
    * over cached partitions; only runs at checkpoint time.
    */
  def partitionCounts(df: DataFrame): Seq[Long] =
    df.rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2).toSeq

  def waveMetricsJson(
      m: WaveMetrics,
      rowCounts: Map[String, Long],
      partitionRows: Map[String, Seq[Long]] = Map.empty): String = {
    val rc = rowCounts.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val pr = partitionRows
      .map { case (k, v) => s""""$k":${v.mkString("[", ",", "]")}""" }
      .mkString("{", ",", "}")
    s"""{"wave":${m.wave},"depth":${m.depth},"popped":${m.popped},""" +
      s""""fetched":${m.fetched},"fetch_errors":${m.fetch_errors},""" +
      s""""saved":${m.saved},"skipped_match":${m.skipped_match},""" +
      s""""skipped_budget":${m.skipped_budget},"skipped_limit":${m.skipped_limit},""" +
      s""""links_extracted":${m.links_extracted},""" +
      s""""duplicates":${m.duplicates},"new_urls":${m.new_urls},""" +
      s""""row_counts":$rc,"partition_rows":$pr}"""
  }

  /** Latest complete (manifest-bearing) wave in a checkpoint dir, if any. */
  def latestWave(dir: String): Option[Int] = {
    val d = new java.io.File(dir)
    if (!d.exists()) return None
    val waves = d.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("wave="))
      .map(_.getName.stripPrefix("wave=").toInt)
      .filter(w => Files.exists(Paths.get(s"$dir/wave=$w/manifest.json")))
    if (waves.isEmpty) None else Some(waves.max)
  }

  def readManifest(dir: String, wave: Int): Manifest =
    parseManifest(Files.readString(Paths.get(s"$dir/wave=$wave/manifest.json")))

  def readTable(spark: SparkSession, dir: String, wave: Int, name: String): DataFrame =
    spark.read.parquet(s"$dir/wave=$wave/$name")
}
