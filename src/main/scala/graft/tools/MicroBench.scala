package graft.tools

import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.extract.{LinkExtractor, Processor}

/** Microbenchmark of the per-page extraction hot path outside Spark:
  * single-thread and N-thread throughput of processHTML + link extraction
  * over real corpus pages. Distinguishes "the function is slow" from "the
  * dataflow doesn't parallelize".
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val threadsToTry = sys.env.get("SPARK_GRAFT_MICRO_THREADS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 8, 32))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = CorpusGen.ensureFor(spark, sfDir)
    val pages = CorpusGen.pages(spark, dir)
      .select($"url", $"html").as[(String, Array[Byte])]
      .limit(4000).collect()
    spark.stop()
    println(s"pages: ${pages.length}")

    def work(batch: Array[(String, Array[Byte])]): Long = {
      var acc = 0L
      batch.foreach { case (url, bytes) =>
        val html = new String(bytes, StandardCharsets.UTF_8)
        val pd = Processor.processHTML(url, html, "")
        acc += pd.fold(_ => 0, _.markdown.length).toLong
        acc += LinkExtractor.extract(url, "host0.test", html, Nil).length
      }
      acc
    }

    // warmup (JIT)
    work(pages.take(1000)): Unit

    // repeats: lengthen the measured window (JFR profiling needs seconds of
    // kernel time; the default single pass is ~0.1 s at 32 threads)
    val repeats = sys.env.get("SPARK_GRAFT_MICRO_REPEAT").map(_.toInt).getOrElse(1)

    threadsToTry.foreach { n =>
      val chunks = pages.grouped(math.max(1, pages.length / n)).toArray
      val pool = Executors.newFixedThreadPool(n)
      val t0 = System.nanoTime()
      val futs = chunks.map(c => pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { var a = 0L; var r = 0; while (r < repeats) { a += work(c); r += 1 }; a }
      }))
      futs.foreach(_.get())
      val dt = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      val total = pages.length.toLong * repeats
      println(f"threads=$n%2d  ${total / dt}%.0f pages/s  (${dt}%.2f s, ${dt * 1000 / total * n}%.2f ms/page/thread)")
    }
  }
}
